"""Local mirror of the driver's correctness gate: run every queries() entry in
Spark AND its oracle_sql() in DuckDB at sf=0.01; compare row count, column
set, and order-insensitive values (stringified, columns sorted by name).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(val) -> str:
    if val is None:
        return "<null>"
    if isinstance(val, (bool, np.bool_)):
        return "true" if val else "false"
    if isinstance(val, np.integer):
        return str(int(val))
    if isinstance(val, np.floating):
        val = float(val)
    if isinstance(val, float):
        if math.isnan(val):
            return "<nan>"
        # Integral floats keep their ".0" so an int-vs-float dtype drift
        # between Spark and DuckDB fails here the way it fails under the
        # driver's exact-value hasher (r01 tpch_q1 sum_qty lesson).
        if val == int(val) and abs(val) < 1e15:
            return f"{val:.1f}"
        # canonical float text: 12 sig digits kills last-bit noise post-round
        return f"{val:.12g}"
    return str(val)


def _rowset(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


QUERY_NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()

    def assert_scalar_only(rows):
        # The driver canonicalizes EVERY entry (oracled or rows-only) by
        # sorting a pandas frame: list/dict-valued columns crash it (r01
        # mm_media_features, r02 pipeline_extract lessons). Gate outputs
        # must be scalar-only — asserted for BOTH branches.
        for r in rows:
            for v in r:
                assert not isinstance(v, (list, dict, set)), (
                    f"{name}: unsortable {type(v).__name__} value in gate output"
                )

    if name not in oracles:
        df = q(spark, SF_DIR)
        sample = df.limit(50).collect()
        assert_scalar_only(sample)
        # a rows-only gate that returns an empty relation is
        # indistinguishable from a broken one (r02 pipeline_quarantine)
        assert len(sample) > 0, f"{name}: vacuous rows-only gate (0 rows)"
        return
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    assert_scalar_only(s_rows[:50])
    # fetchdf (not fetchall): the driver compares through pandas, where
    # DuckDB HUGEINT/DECIMAL aggregates coerce to float64 — fetchall would
    # hand us Python ints and hide exactly that dtype drift.
    ddf = ddb.execute(oracles[name]).fetchdf()
    d_cols = list(ddf.columns)
    d_rows = [
        tuple(
            None
            if (v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)))
            else v
            for v in row
        )
        for row in ddf.itertuples(index=False, name=None)
    ]
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    sset, dset = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
