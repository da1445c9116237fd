"""Stable ordering + skew-salting utilities (SURVEY.md §2.7 W1/W5, §4).

The reference relies on pandas preserving input order (determinism req #1);
Spark does not after an exchange, so every order-sensitive consumer sorts
explicitly on (conv_id, turn_idx) — W1, the required stable turn ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_ORDER = ["conv_id", "turn_idx"]


def stable_turn_order(df: DataFrame) -> DataFrame:
    """W1: global stable (conv_id, turn_idx) sort — apply ONCE at the sink.

    This is a range-partitioned sort (Spark samples ranges), so it scales:
    no single reducer sees more than its range, and AQE coalesces the tail.
    """
    return df.orderBy(*TURN_ORDER)


def with_sequential_id(df: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """R21/W5: sequential id after consolidation (transaction_normalizer.py:309).

    The reference uses concat order; we define an EXPLICIT total order.
    NOTE: a single unpartitioned window is a scale bottleneck — it exists as
    the oracle-parity formulation for SMALL consolidated outputs. The 100TB
    path is ``with_sequential_id_distributed`` below (identical ids, no
    single reducer); tests pin their equality.
    """
    order_cols = order_cols or TURN_ORDER
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("seq_id", F.row_number().over(w))


def with_sequential_id_distributed(
    df: DataFrame, order_cols: list[str] | None = None, num_partitions: int | None = None
) -> DataFrame:
    """Dense deterministic 1-based seq_id WITHOUT a single-reducer window
    (the zipWithIndex idea expressed in DataFrame ops):

      1. range-partition + sort by ``order_cols`` — partitions hold disjoint,
         ordered key ranges;
      2. count rows per partition (tiny agg) and turn counts into per-
         partition offsets with a cumulative window over that TINY relation;
      3. row_number() within each partition (parallel — partitionBy the
         partition id) + broadcast-joined offset.

    Ids equal the unpartitioned-window formulation whenever ``order_cols``
    is a total order (the same precondition the window variant needs for
    determinism: ties straddling a range boundary would otherwise be
    numbered arbitrarily).
    """
    order_cols = order_cols or TURN_ORDER
    cols = [F.col(c) for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    # CHECKPOINT PINS one range partitioning: the counts branch and the
    # final row_number branch must read the same materialized partitions, or
    # the offsets could describe a different boundary sampling than the
    # row_numbers run on (range-boundary sampling is documented as not
    # necessarily consistent; exchange reuse is an optimization, not a
    # guarantee). With a configured checkpoint dir this uses a RELIABLE
    # checkpoint (replayable after executor loss — the right choice on a
    # real cluster with dynamic allocation); otherwise it falls back to
    # localCheckpoint (executor-local blocks, fine for local mode).
    part = ranged.sortWithinPartitions(*cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    if df.sparkSession.sparkContext.getCheckpointDir() is not None:
        part = part.checkpoint(eager=False)
    else:
        part = part.localCheckpoint(eager=False)
    counts = part.groupBy("_pid").count()
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "_pid", (F.sum("count").over(woff) - F.col("count")).alias("_offset")
    )
    wlocal = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.join(F.broadcast(offsets), "_pid")
        # long, not int: the distributed variant exists for row counts the
        # single-reducer window can't reach — int32 would overflow there
        .withColumn(
            "seq_id", (F.row_number().over(wlocal) + F.col("_offset")).cast("long")
        )
        .drop("_pid", "_offset")
    )


def salted(df: DataFrame, n_partitions: int, salt_buckets: int | None = None) -> DataFrame:
    """Salted repartition: (conv_id, pmod(hash(conv_id, turn_idx), S)) spreads
    a power-law conversation across partitions (SURVEY §4 skew row).

    S defaults to 8x the partition count: the salt keys themselves are
    hash-partitioned, so with S == n_partitions the balls-into-bins collision
    puts ~2 keys in some partitions and 0 in others; S >> n_partitions
    smooths that to a bounded (<2x mean) imbalance. For FULLY stateless
    per-turn work, plain round-robin ``repartition(n)`` is even flatter —
    use salting when a downstream stage regroups by conv_id and benefits
    from partial conv locality."""
    if salt_buckets is None:
        salt_buckets = 8 * n_partitions
    return df.repartition(
        n_partitions,
        F.col("conv_id"),
        F.pmod(F.hash(F.col("conv_id"), F.col("turn_idx")), F.lit(salt_buckets)),
    )
