"""Local mirror of the driver's correctness gate: run every queries() entry in
Spark AND its oracle_sql() in DuckDB at sf=0.01; compare row count, column
set, and order-insensitive values (stringified, columns sorted by name).
"""

from __future__ import annotations

import math

import duckdb
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
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        if math.isnan(val):
            return "<nan>"
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
    if name not in oracles:
        df = q(spark, SF_DIR)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d = ddb.execute(oracles[name])
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: rowcount {len(s_rows)} vs {len(d_rows)}"
    sset, dset = _rowset(s_cols, s_rows), _rowset(d_cols, d_rows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
