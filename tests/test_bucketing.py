"""Bucketed co-located join (SURVEY §4 'Partitioning / shuffle' row):
pre-bucketing both sides on the join key removes the shuffle entirely —
the 100TB pattern for repeated joins on the same key."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf that cannot move after session start. The default in-memory
    # catalog forgets tables between sessions while their directories persist,
    # so clear both before writing.
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable("b_orders")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable("b_cust")
    return orders.count(), cust.count()


def _joined(spark):
    return spark.table("b_orders").join(
        spark.table("b_cust"),
        F.col("o_custkey") == F.col("c_custkey"),
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            _joined(spark).explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_correct(spark, bucketed):
    n_orders, _ = bucketed
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert _joined(spark).count() == plain
