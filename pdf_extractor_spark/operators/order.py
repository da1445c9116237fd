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
    NOTE: a single unpartitioned window is a scale bottleneck — it exists for
    byte-parity with the reference's sequential ids. At 100TB use
    ``zipWithIndex``-style two-pass (per-partition count + offset) instead;
    kept here because ids must be dense and deterministic, and the consumer
    of this operator is small consolidated outputs, not raw turns.
    """
    order_cols = order_cols or TURN_ORDER
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("seq_id", F.row_number().over(w))


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
