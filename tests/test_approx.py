"""Approximate-aggregate quality bounds (HLL sketches are engine-specific, so
the gate runs them rows-only; these tests bound the error vs exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # HLL with rsd=0.02: allow 4 sigma
        assert abs(r.approx - r.exact) <= max(4, 0.08 * r.exact), r


def test_percentile_approx_brackets_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").where(F.col("value").isNotNull())
    r = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    ).first()
    spread = r.hi - r.lo
    assert abs(r.approx_p50 - r.exact_p50) <= 0.01 * spread
