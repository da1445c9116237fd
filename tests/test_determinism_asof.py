"""Determinism + independent-oracle hardening.

1. The distributed transcript generator must be bit-identical across
   parallelism (the scaling bench depends on 'same input' at both levels).
2. asof_join must agree with pandas merge_asof — an independent
   implementation, not the DuckDB mirror of our own formulation.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.asof import asof_join
from pdf_extractor_spark.sources.synth import generate_transcripts_distributed


def test_distributed_generator_invariant_across_parallelism(spark):
    def digest(partitions: int) -> str:
        df = generate_transcripts_distributed(spark, 300, seed=42, partitions=partitions)
        h = (
            df.select(
                F.sha2(
                    F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"), "role", "text"),
                    256,
                ).alias("h")
            )
            .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("long")).alias("s"),
                 F.count("*").alias("n"))
            .first()
        )
        return f"{h.s}:{h.n}"

    assert digest(2) == digest(16)


@pytest.fixture(scope="module")
def asof_case(spark):
    import random

    rng = random.Random(7)
    left_rows, right_rows = [], []
    for uid in range(20):
        for i in range(rng.randint(1, 12)):
            left_rows.append((uid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=rng.randint(0, 100000)), uid * 1000 + i))
        for j in range(rng.randint(0, 6)):
            right_rows.append((uid, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=rng.randint(0, 100000)), uid * 100 + j))
    left = pd.DataFrame(left_rows, columns=["user_id", "ts", "left_id"])
    # dedupe right per (user, ts) like the operator contract requires
    right = (
        pd.DataFrame(right_rows, columns=["user_id", "ts", "right_id"])
        .sort_values(["user_id", "ts", "right_id"])
        .groupby(["user_id", "ts"], as_index=False)
        .last()
    )
    return left, right


def test_asof_join_matches_pandas_merge_asof(spark, asof_case):
    left, right = asof_case
    got = {
        (r.user_id, r.left_id): r.asof_right_id
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key="user_id",
            ts="ts",
            right_value_cols=["right_id"],
        ).collect()
    }
    expect_df = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="user_id",
        direction="backward",  # right.ts <= left.ts, inclusive — same contract
    )
    for r in expect_df.itertuples():
        e = None if pd.isna(r.right_id) else int(r.right_id)
        assert got[(r.user_id, r.left_id)] == e, (r.user_id, r.left_id)
    assert len(got) == len(left)
