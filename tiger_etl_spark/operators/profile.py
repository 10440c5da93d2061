"""Table profiling — per-column data-quality statistics.

Reference analog: the validation layer (`system/system/schemas/*` Pydantic
validators, e.g. ``user_management/schema.py``) enforces per-field
null/shape constraints row-at-a-time at the API boundary; an ingest
engine needs the set-level counterpart — per-column null counts,
cardinalities, and ranges — to decide whether a batch is sane before it
merges. Spark-first re-expression as exactly two jobs, both scale-safe:

1. **Narrow pass** (no shuffle beyond the final single-row reduce): one
   global aggregate computing, for every profiled column, ``count``,
   ``sum(isnull)``, ``min`` and ``max`` — all associative, all
   map-side-partial, producing ONE row that is then unpivoted to
   per-column rows with ``stack`` (driver never sees the data).
2. **Distinct pass**: the table is unpivoted to (col_name, value)
   pairs and counted with ``count_distinct``. Catalyst rewrites this as
   a two-phase aggregate keyed by (col_name, value) first — high
   cardinality, evenly hashed — then a map-side-combined count per
   col_name, so the low-cardinality final key never concentrates the
   raw rows on one task. ``approx=True`` swaps in HLL
   (``approx_count_distinct``), collapsing the pass into pass 1 —
   that is the 100 TB default; exact is kept for oracle parity.

Values are compared/rendered on their string casts (cast AFTER min/max,
so numeric order is preserved); distinct-ness on the string cast equals
native distinct-ness for ints/strings/dates (documented deviation: not
for floats that render equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).

    `approx=True` uses HLL for n_distinct (one single-row narrow agg,
    zero wide shuffles — the at-scale default); exact mode adds one
    evenly-keyed shuffle (see module docstring).
    """
    cols = list(df.columns) if columns is None else list(columns)
    if not cols:
        raise ValueError("no columns to profile")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nul{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max{i}"))
        if approx:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"_dc{i}"))
    one = df.agg(*aggs)

    def q(s: str) -> str:
        return "'" + s.replace("'", "\\'") + "'"

    n_per = 4 if approx else 3
    parts = []
    for i, c in enumerate(cols):
        parts.append(q(c))
        parts.append(f"_nul{i}")
        parts.append(f"_min{i}")
        parts.append(f"_max{i}")
        if approx:
            parts.append(f"cast(_dc{i} as long)")
    out_cols = "col_name, n_nulls, min_val, max_val" + (
        ", n_distinct" if approx else ""
    )
    stacked = one.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) as ({out_cols})"
        ),
    )
    if approx:
        return stacked.select(
            "col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"
        )

    pairs = df.select(
        F.expr(
            "stack({n}, {args}) as (col_name, _val)".format(
                n=len(cols),
                args=", ".join(
                    f"{q(c)}, cast({c} as string)" for c in cols
                ),
            )
        )
    )
    dc = pairs.groupBy("col_name").agg(
        F.count_distinct("_val").alias("n_distinct")
    )
    return (
        stacked.join(dc, "col_name", "left")
        .select(
            "col_name",
            "n_rows",
            F.col("n_nulls").cast("long").alias("n_nulls"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias(
                "n_distinct"
            ),
            "min_val",
            "max_val",
        )
    )
