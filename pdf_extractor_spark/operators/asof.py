"""As-of join — the time-series operator Spark lacks natively.

For each left row, attach the most recent right row with the same key and
right.ts <= left.ts. The naive formulation (range join) degenerates to a
per-key cross product; ``pd.merge_asof`` per group works but shuffles whole
groups into Python. The Spark-first formulation used here:

  1. union both sides with a side tag (right rows carry their payload,
     left rows carry null payload);
  2. one window pass per key ordered by (ts, side): ``last(payload,
     ignorenulls=True)`` forward-fills the latest right payload onto every
     left row;
  3. filter back to left rows.

One shuffle (the window partitionBy), O(n log n) sort per key, no
cross-product, no Python. Ties (right.ts == left.ts) are included — the
right side sorts BEFORE the left at equal ts via the side tag, matching
the inclusive semantics of pandas merge_asof and DuckDB ASOF JOIN
(right.ts <= left.ts), which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Returns left columns + asof_<col> for each right value column.

    The right payload forward-fills as ONE struct (not per-column): per-column
    ``last(ignorenulls)`` would stitch fields from DIFFERENT right rows
    whenever a later row carries a null field, synthesizing a row that never
    existed. The struct is also the tertiary sort key, so at duplicate
    (key, ts) on the right the greatest payload tuple wins — a total order,
    deterministic across runs/partitionings (pandas merge_asof's "last in
    input order" has no distributed equivalent; this is the documented
    contract instead)."""
    left_extra = [c for c in left.columns if c not in (key, ts)]
    l_types = dict(left.dtypes)
    r_struct = F.struct(*[F.col(c) for c in right_value_cols])
    r_tag = right.select(
        key,
        ts,
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_extra],
        r_struct.alias("_rv"),
    )
    l_tag = left.select(
        key,
        ts,
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_extra],
        F.lit(None).cast(r_tag.schema["_rv"].dataType).alias("_rv"),
    )
    u = l_tag.unionByName(r_tag)
    w = Window.partitionBy(key).orderBy(ts, "_side", "_rv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = u.select("*", F.last("_rv", ignorenulls=True).over(w).alias("_asof"))
    return (
        filled.where(F.col("_side") == 1)
        .select(
            "*",
            *[F.col("_asof")[c].alias(f"asof_{c}") for c in right_value_cols],
        )
        .drop("_side", "_rv", "_asof")
    )
