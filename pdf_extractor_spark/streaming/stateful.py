"""Custom stateful streaming operator: per-conversation running state via
``applyInPandasWithState`` (the arbitrary-stateful tier Structured Streaming
offers beyond windowed aggs).

Tracks, per conversation, across micro-batches: cumulative turn count,
cumulative text chars, and the highest turn_idx seen with a contiguity
watermark (next_expected) — the streaming analog of the batch lineage
"did every turn arrive, in order?" check. State is a single small tuple per
conversation; a processing-time timeout (configurable) would expire idle
conversations at 10^12-turn scale — left NoTimeout here so availableNow
drains deterministically for tests.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, chars_seen long, max_turn_idx int, "
    "contiguous boolean"
)
STATE_SCHEMA = "turns long, chars long, max_idx int, missing boolean"


def _update_conv(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    turns, chars, max_idx, missing = (
        state.get if state.exists else (0, 0, -1, False)
    )
    seen: set[int] = set()
    for pdf in batches:
        turns += len(pdf)
        chars += int(pdf["text"].str.len().fillna(0).sum())
        seen.update(int(i) for i in pdf["turn_idx"])
    if seen:
        max_idx = max(max_idx, max(seen))
    # contiguity: after this batch, have we seen 0..max_idx? (approximate
    # cross-batch check: a gap ever observed stays flagged)
    expected = turns  # contiguous iff count == max_idx + 1 (no dups assumed)
    missing = missing or (expected != max_idx + 1)
    state.update((turns, chars, max_idx, missing))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns],
            "chars_seen": [chars],
            "max_turn_idx": [max_idx],
            "contiguous": [not missing],
        }
    )


def running_conversation_state(stream, output_mode: str = "update"):
    """Attach the stateful operator to a transcript stream DataFrame."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update_conv,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_running_state(spark, input_dir: str, checkpoint_dir: str, output_dir: str):
    """Drain the stateful stream, appending each micro-batch's state updates
    to parquet via foreachBatch (the memory sink cannot recover from a
    checkpoint; foreachBatch can, so restarts resume state). The CURRENT
    state per conversation is its row with the highest turns_seen."""
    from .extract_stream import read_transcript_stream

    out = running_conversation_state(read_transcript_stream(spark, input_dir))

    def write_batch(df, epoch_id: int) -> None:
        df.write.mode("append").parquet(output_dir)

    q = (
        out.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def latest_state(spark, output_dir: str):
    """Current per-conversation state from the update log (max turns_seen,
    tiebreak on max_turn_idx)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.read.parquet(output_dir)
    w = Window.partitionBy("conv_id").orderBy(
        F.col("turns_seen").desc(), F.col("max_turn_idx").desc()
    )
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


__all__: Iterable[str] = (
    "OUTPUT_SCHEMA",
    "STATE_SCHEMA",
    "running_conversation_state",
    "run_running_state",
)
