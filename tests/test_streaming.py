"""Incremental mode (B15): availableNow micro-batches over appended
files, exactly-once across restarts via the stream checkpoint."""

import os

import pyarrow.parquet as pq

from opencv_table_extraction_spark.fixtures.gen import gen_tables
from opencv_table_extraction_spark.streaming import run_incremental


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
