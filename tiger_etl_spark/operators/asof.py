"""As-of join — a temporal operator Spark lacks natively.

For every left row, attach the single right row with the greatest
right-timestamp ≤ the left timestamp within the same key (the
"most recent earlier observation": trades→quotes, event→latest config,
purchase→last click).

Spark-first shape: NOT a range join (which explodes to an inequality
join) — instead the classic union trick: tag both sides, sort each key
by (ts, side) with a per-key window, and carry the right side's payload
forward with `last(ignorenulls)`. One keyed shuffle + per-key sort —
the same distribution a SortMergeJoin would need anyway, linear in
|left| + |right|, no broadcast, no inequality-join blowup. Right rows
order BEFORE left rows at equal timestamps, giving `≤` (inclusive)
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: left rows keep all their columns plus
    `prefix`-named copies of the right side's `value_cols` from the
    most recent right row with right.ts ≤ left.ts (same `on` keys; ties
    among right rows broken by `tiebreak_cols`, last wins). Left rows
    with no earlier right row get nulls."""
    tb = tiebreak_cols or []
    r = right.select(
        *on,
        F.col(ts_col),
        # tiebreak columns keep their bare names for the window ORDER BY
        # (even when also exported as values) — a right row must never
        # order by a null
        *[F.col(c) for c in tb if c not in on and c != ts_col],
        # ONE struct per right row, not per-column values: the struct is
        # non-null even when its fields are null, so last(ignorenulls)
        # picks the most recent right ROW atomically — a newest row with
        # v=NULL yields NULL (not a stale older v), and multiple value
        # columns can never stitch together from different right rows
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_rpay"),
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col), F.col("_side"), *[F.col(c) for c in tb])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_rpay", ignorenulls=True).over(w).alias("_c")
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_c.{c}").alias(f"{prefix}{c}") for c in value_cols
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)
