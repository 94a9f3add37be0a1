"""Incremental mode (B15): availableNow micro-batches over appended
files, exactly-once across restarts via the stream checkpoint; plus the
custom stateful operator (applyInPandasWithState)."""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq

from opencv_table_extraction_spark.fixtures.gen import gen_tables
from opencv_table_extraction_spark.streaming import (
    assemble_conversations,
    run_incremental,
)


def test_incremental_two_appends(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    t1, _, _ = gen_tables(120, seed=42, skew=False)
    t2, _, _ = gen_tables(80, seed=7, skew=False)
    pq.write_table(t1, str(src / "part-001.parquet"))

    n1 = run_incremental(spark, str(src), str(out), salt_buckets=4)
    assert n1 >= 1
    got1 = spark.read.parquet(str(out / "data"))
    assert got1.count() == t1.num_rows

    # append new "snapshot"; re-run processes ONLY the new file
    pq.write_table(t2, str(src / "part-002.parquet"))
    run_incremental(spark, str(src), str(out), salt_buckets=4)
    got2 = spark.read.parquet(str(out / "data"))
    assert got2.count() == t1.num_rows + t2.num_rows

    # idempotent: nothing new -> nothing appended
    run_incremental(spark, str(src), str(out), salt_buckets=4)
    assert spark.read.parquet(str(out / "data")).count() == t1.num_rows + t2.num_rows


def _turns_table(rows):
    ts = datetime.datetime(2026, 1, 1)
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows], pa.string()),
            "text": pa.array([r[3] for r in rows], pa.string()),
            "tool": pa.array(["" for _ in rows], pa.string()),
            "ts": pa.array([ts] * len(rows), pa.timestamp("us")),
        }
    )


def test_stateful_assembly_continues_across_restarts(spark, tmp_path):
    """The applyInPandasWithState operator must CONTINUE per-conversation
    state across availableNow restarts (state lives in the checkpoint's
    state store): the second run's snapshot extends the first run's
    assembled text instead of starting over."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    os.makedirs(src)
    pq.write_table(
        _turns_table([("a", 0, "user", "hi"), ("a", 1, "assistant", "hello"),
                      ("b", 0, "user", "yo")]),
        str(src / "f1.parquet"),
    )
    assemble_conversations(spark, str(src), str(out))
    snap1 = {r["conv_id"]: r for r in spark.read.parquet(str(out / "data")).collect()}
    assert snap1["a"]["n_turns"] == 2
    assert snap1["a"]["assembled_text"] == "user: hi\nassistant: hello"
    assert snap1["b"]["n_turns"] == 1

    pq.write_table(
        _turns_table([("a", 2, "user", "more")]), str(src / "f2.parquet")
    )
    assemble_conversations(spark, str(src), str(out))
    rows = spark.read.parquet(str(out / "data")).collect()
    latest_a = max((r for r in rows if r["conv_id"] == "a"),
                   key=lambda r: r["n_turns"])
    assert latest_a["n_turns"] == 3
    assert latest_a["max_turn_idx"] == 2
    assert latest_a["assembled_text"] == "user: hi\nassistant: hello\nuser: more"
