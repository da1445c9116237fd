"""Bucketized range join — interval containment without a cross product.

Spark's optimizer turns ``l JOIN r ON l.key = r.key AND l.ts BETWEEN r.lo
AND r.hi`` into an equi-join on key plus a post-filter, which is fine UNTIL
one key holds many intervals (then it degenerates per-key quadratic) or
there is no equi-key at all (broadcast nested loop). The scalable shape:

  1. choose a bucket width ~ median interval length;
  2. explode each interval into the buckets it overlaps (sequence+explode —
     bounded fanout = interval_len/width + 1);
  3. bucketize each probe point (one row);
  4. equi-join on (key, bucket) — a plain shuffled hash join;
  5. re-check the exact range predicate.

Fanout is the knob: wider buckets = fewer interval replicas but more
false-positive pairs for the filter. The DuckDB oracle uses the plain
inequality join, so the gate proves the bucketed rewrite is EXACTLY
equivalent, not approximately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join: point rows x interval rows with same ``key`` and
    ``lo <= ts <= hi`` (inclusive both ends). Returns all point columns +
    all interval columns (key deduped)."""
    b = F.lit(bucket_seconds)
    p = points.withColumn("_bkt", (F.col(ts).cast("timestamp").cast("long") / b).cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col(lo).cast("timestamp").cast("long") / b).cast("long"),
                (F.col(hi).cast("timestamp").cast("long") / b).cast("long"),
            )
        ),
    )
    joined = p.join(iv, on=[key, "_bkt"]).where(
        (F.col(ts) >= F.col(lo)) & (F.col(ts) <= F.col(hi))
    )
    return joined.drop("_bkt")
