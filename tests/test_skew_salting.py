"""Skew-salting evidence (operators/order.py salted, SURVEY §4 partitioning).

The 10^12-turn corpus has power-law conversation lengths; a single pathological
conversation landing in one input file would serialize extraction on one task.
These tests pin the mechanism deterministically (no flaky wall-clock asserts):
salting spreads a one-file mega-conversation across partitions with bounded
imbalance, and extraction output is unchanged by the repartition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.extract import extract_turns
from pdf_extractor_spark.operators.order import salted
from pdf_extractor_spark.schema import TRANSCRIPTS


def _mega_conv(spark, n_turns: int, tmp_path):
    pdf = pd.DataFrame(
        {
            "conv_id": ["conv_whale"] * n_turns,
            "turn_idx": pd.array(range(n_turns), dtype="int32"),
            "role": ["user"] * n_turns,
            "text": [f"MEMO REF {i} payment {i}.00" for i in range(n_turns)],
            "tool": [None] * n_turns,
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    path = str(tmp_path / "whale")
    spark.createDataFrame(pdf, schema=TRANSCRIPTS).coalesce(1).write.parquet(path)
    return spark.read.schema(TRANSCRIPTS).parquet(path)


def test_single_file_whale_is_one_partition(spark, tmp_path):
    df = _mega_conv(spark, 4000, tmp_path)
    assert df.rdd.getNumPartitions() == 1  # the pathology is real


def test_salting_spreads_with_bounded_imbalance(spark, tmp_path):
    df = _mega_conv(spark, 4000, tmp_path)
    spread = salted(df, n_partitions=16)
    sizes = [
        r.n
        for r in spread.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 16  # every partition gets work
    # near-uniform spread: max partition bounded under 2x the mean
    assert max(sizes) < 2 * (4000 / 16)
    assert sum(sizes) == 4000


def test_extraction_invariant_under_salting(spark, tmp_path):
    df = _mega_conv(spark, 1000, tmp_path)
    plain = extract_turns(df)
    spread = extract_turns(df, salt_partitions=8)
    key = lambda rows: sorted((r.conv_id, r.turn_idx, r.extracted_text) for r in rows)  # noqa: E731
    assert key(plain.collect()) == key(spread.collect())
