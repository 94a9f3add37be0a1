"""Custom stateful streaming operator (the applyInPandasWithState seam).

``assemble_conversations`` incrementally builds per-conversation
transcripts from a stream of turns: each micro-batch folds its turns
into per-conv_id GroupState (turn count + assembled text), and emits the
conversation's updated snapshot. State lives in the stream checkpoint's
state store, so a restarted job (availableNow re-run after new files
land) CONTINUES each conversation instead of starting over — the
property the test pins.

This is the engine's template for custom stateful ops the built-in
operators can't express (the spec itself needs none — `ts` is carried,
not aggregated — so this ships as a first-class optional capability,
exercised by tests rather than the driver oracle, like B13-B15).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .incremental import TRANSCRIPT_SCHEMA

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("assembled_text", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("max_turn_idx", IntegerType()),
        StructField("assembled_text", StringType()),
    ]
)


def _fold_conversation(key, pdfs, state: GroupState):
    """Fold this batch's turns for one conv_id into the running state and
    emit the updated snapshot. Turns are folded in (turn_idx) order
    within the batch; cross-batch order is arrival order (the source
    appends whole files, so turn_idx order is preserved end to end)."""
    (conv_id,) = key
    n_turns, max_idx, text = (
        state.get if state.exists else (0, -1, "")
    )
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        for _, row in pdf.iterrows():
            piece = f"{row['role']}: {row['text']}"
            text = f"{text}\n{piece}" if text else piece
            n_turns += 1
            max_idx = max(max_idx, int(row["turn_idx"]))
    state.update((n_turns, max_idx, text))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n_turns],
            "max_turn_idx": [max_idx],
            "assembled_text": [text],
        }
    )


def assemble_conversations(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str | None = None,
) -> None:
    """availableNow pass over newly-appended turn files: per-conv_id
    stateful fold (applyInPandasWithState), appending one snapshot row
    per touched conversation per micro-batch to ``out_dir``."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )
    snapshots = stream.groupBy("conv_id").applyInPandasWithState(
        _fold_conversation,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        snapshots.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "data"))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
