"""The extraction operator: transcripts -> extracted_turns via mapInPandas.

Design (SURVEY.md §3.1 'Spark shape'):
  - per-turn stateless rules => NO shuffle is required for extraction itself;
    mapInPandas runs on the scan partitions (narrow), Arrow-batched.
  - skew: optional salted repartition BEFORE the UDF spreads pathological
    input layouts (e.g. one file = one giant conversation) across executors
    (SURVEY §4 'Partitioning / shuffle' row).
  - ordering: stable (conv_id, turn_idx) order is applied ONCE at the sink
    (operators/order.py), not inside extraction — cheaper and skew-immune.

The UDF calls rules.oracle.extract_turn — the exact function the golden
oracle uses — so Spark output is byte-identical to the oracle by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..rules.oracle import extract_turn
from ..schema import EXTRACTED_TURNS


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body. Compiled regexes live at module import (once per
    executor); the per-row work is C-regex dispatch, no driver-side Python."""
    for pdf in batches:
        results = [extract_turn(t) for t in pdf["text"]]
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].values,
                "turn_idx": pdf["turn_idx"].astype("int32").values,
                "family": [r.family for r in results],
                "extracted_text": [r.extracted_text for r in results],
                "spans": [
                    [{"start": s, "end": e, "kind": k} for (s, e, k) in r.spans]
                    for r in results
                ],
                "rule_hits": [r.rule_hits for r in results],
                "n_records": pd.array([r.n_records for r in results], dtype="int32"),
                "valid": [r.valid for r in results],
                "problem_reason": [r.problem_reason for r in results],
            }
        )


def extract_turns(transcripts: DataFrame, salt_partitions: int | None = None) -> DataFrame:
    """Run the extraction rules over a transcript DataFrame.

    ``salt_partitions``: when set, repartition on (conv_id, salt) first —
    the salt is pmod(hash(turn_idx), 16), breaking long-conversation skew
    while keeping *some* conv locality (SURVEY §4). Leave None for inputs
    already well-partitioned (Parquet/Iceberg splits are row-group sized).
    """
    cols = transcripts.select("conv_id", "turn_idx", "text")
    if salt_partitions:
        from .order import salted

        cols = salted(cols, salt_partitions)
    return cols.mapInPandas(_extract_batches, schema=EXTRACTED_TURNS)
