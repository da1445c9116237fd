"""Fuzzy matching, UDF tier: exact rapidfuzz token_sort_ratio semantics.

The native tier (catalog j2_fuzzy_topk) uses Levenshtein because BOTH Spark
and DuckDB ship it as a builtin — but rapidfuzz's token_sort_ratio is
normalized INDEL similarity (insertions/deletions only, no substitutions):
    indel(a, b) = len(a) + len(b) - 2*LCS(a, b)
    ratio       = 1 - indel/(len(a)+len(b)) = 2*LCS/(len(a)+len(b))
This module reimplements that exactly (organizer_extractor.py:603-658 J2
parity) as a vectorized pandas scorer: token-sort both sides, score with an
O(n*m) LCS DP per pair — fine for title-length strings; candidate pairs are
produced by the same crossJoin-small-dimension plan as the native tier.

Scale: the dimension side is broadcast; scoring cost is #left x #dim pairs x
O(len^2) C-speed-ish Python — bound the dimension (the reference's TOC/topic
index is dozens of rows). For large-x-large fuzzy joins, block first (LSH on
token sets) and score only candidates.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_sort(s: str) -> str:
    """rapidfuzz token_sort preprocessing: lowercase, split, sort, rejoin."""
    return " ".join(sorted(s.lower().split()))


def _lcs_len(a: str, b: str) -> int:
    """Classic O(n*m) LCS length, two-row DP."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if ca == cb else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def indel_ratio(a: str, b: str) -> float:
    """Normalized InDel similarity in [0,1], 4-dp fixed point (floor+0.5),
    == rapidfuzz.fuzz.ratio(a, b)/100 semantics."""
    denom = len(a) + len(b)
    if denom == 0:
        return 1.0
    r = 2.0 * _lcs_len(a, b) / denom
    return int(r * 10000 + 0.5) / 10000.0


def token_sort_indel_ratio(a: str, b: str) -> float:
    """rapidfuzz token_sort_ratio/100 semantics."""
    return indel_ratio(token_sort(a), token_sort(b))


def fuzzy_topk_indel(
    left: DataFrame,
    dim: DataFrame,
    left_key: str,
    left_text: str,
    dim_text: str,
    threshold: float = 0.0,
) -> DataFrame:
    """J2 fuzzy best-match join with exact token_sort_ratio scoring:
    crossJoin the broadcast dimension, score pairs in an Arrow-batched
    pandas stage, keep the per-left argmax (score desc, dim text asc).
    Returns (left_key, left_text, matched_text, match_ratio)."""
    pairs = left.select(left_key, F.col(left_text).alias("ltext")).crossJoin(
        F.broadcast(dim.select(F.col(dim_text).alias("matched_text")).distinct())
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # token-sort once per DISTINCT string (the crossJoin repeats the
            # broadcast dimension per left row; don't re-sort it per pair)
            lmap = {s: token_sort(s) for s in pdf["ltext"].unique()}
            rmap = {s: token_sort(s) for s in pdf["matched_text"].unique()}
            pdf = pdf.assign(
                match_ratio=[
                    indel_ratio(lmap[a], rmap[b])
                    for a, b in zip(pdf["ltext"], pdf["matched_text"])
                ]
            )
            yield pdf

    key_type = left.schema[left_key].dataType.simpleString()
    scored = pairs.mapInPandas(
        score,
        schema=(
            f"{left_key} {key_type}, ltext string, matched_text string, "
            "match_ratio double"
        ),
    )
    w = Window.partitionBy(left_key).orderBy(
        F.col("match_ratio").desc(), F.col("matched_text")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("match_ratio") >= threshold))
        .select(
            left_key,
            F.col("ltext").alias(left_text),
            "matched_text",
            "match_ratio",
        )
    )
