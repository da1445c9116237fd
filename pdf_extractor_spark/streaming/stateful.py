"""Custom stateful streaming operator: per-conversation running state via
``applyInPandasWithState`` (the arbitrary-stateful tier Structured Streaming
offers beyond windowed aggs).

Tracks, per conversation, across micro-batches: cumulative turn count,
cumulative text chars, and the highest turn_idx seen; each update also emits
a DERIVED contiguity flag (count == max_idx + 1) — the streaming analog of
the batch lineage "did every turn arrive?" check, computed from state so the
final answer is independent of how the source split micro-batches. State is
a single small tuple per conversation; a processing-time timeout
(configurable) would expire idle conversations at 10^12-turn scale — left
NoTimeout here so availableNow drains deterministically for tests.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turns_seen long, chars_seen long, max_turn_idx int, "
    "contiguous boolean"
)
STATE_SCHEMA = "turns long, chars long, max_idx int"


def _update_conv(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    turns, chars, max_idx = state.get if state.exists else (0, 0, -1)
    seen: set[int] = set()
    for pdf in batches:
        turns += len(pdf)
        chars += int(pdf["text"].str.len().fillna(0).sum())
        seen.update(int(i) for i in pdf["turn_idx"])
    if seen:
        max_idx = max(max_idx, max(seen))
    state.update((turns, chars, max_idx))
    # contiguity is DERIVED from cumulative state (count == max_idx + 1, no
    # dups assumed), never latched: a latched flag would depend on how the
    # source happened to split micro-batches (out-of-order arrival within the
    # stream), making the final answer batching-dependent. Derived form is
    # invariant: same input drained in any batch split yields the same final
    # state and the same last update row.
    contiguous = turns == max_idx + 1
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "turns_seen": [turns],
            "chars_seen": [chars],
            "max_turn_idx": [max_idx],
            "contiguous": [contiguous],
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
