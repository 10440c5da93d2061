"""Banded range join — interval/time-window joins without the
inequality-join trap.

A naive `l.ts + lower <= r.ts AND r.ts <= l.ts + upper` join has no
equality key, so Spark plans BroadcastNestedLoopJoin / cartesian — a
scale killer. The standard fix: quantize time into bands of width
(upper - lower); every right row lands in one band, every left row's
window spans at most two adjacent bands, so the join becomes an
EQUI-join on (keys…, band) with the exact range predicate applied as a
post-filter. Shuffle is keyed, fan-out ≤ 2× the left side, and Catalyst
plans a plain SortMergeJoin/ShuffledHashJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_left: str,
    ts_right: str,
    lower: int,
    upper: int,
    how: str = "inner",
) -> DataFrame:
    """Join right rows whose `ts_right` lies in
    [left.ts_left + lower, left.ts_left + upper] (inclusive; timestamps
    are numeric — e.g. epoch seconds/micros — and lower < upper, same
    unit). `ts_left` and `ts_right` must be DISTINCT column names (both
    survive into the joined output). `how` is 'inner' or 'left' (left
    keeps rows with no match, right columns null)."""
    if upper <= lower:
        raise ValueError("require lower < upper")
    width = upper - lower
    band_lo = F.floor((F.col(ts_left) + F.lit(lower)) / F.lit(width))
    band_hi = F.floor((F.col(ts_left) + F.lit(upper)) / F.lit(width))
    l = left.withColumn(
        "_band", F.explode(F.sequence(band_lo, band_hi))
    )
    r = right.withColumn("_band", F.floor(F.col(ts_right) / F.lit(width)))
    in_range = F.col(ts_right).between(
        F.col(ts_left) + F.lit(lower), F.col(ts_left) + F.lit(upper)
    )
    if how == "inner":
        return (
            l.join(r, [*on, "_band"]).where(in_range).drop("_band")
        )
    if how == "left":
        matched = (
            l.join(r, [*on, "_band"])
            .where(in_range)
            .drop("_band")
        )
        right_cols = [c for c in r.columns if c not in (*on, "_band")]
        # null-safe anti probe: plain column-name equality is NULL for
        # rows containing any NULL, which would keep a MATCHED row in
        # `missing` too (emitted twice — once joined, once null-padded)
        probe = matched.select(*left.columns).distinct().alias("_m")
        lft = left.alias("_l")
        cond = None
        for c in left.columns:
            e = F.col(f"_l.{c}").eqNullSafe(F.col(f"_m.{c}"))
            cond = e if cond is None else cond & e
        missing = lft.join(probe, cond, "left_anti").select(
            *[F.col(f"_l.{c}").alias(c) for c in left.columns]
        )
        for c in right_cols:
            missing = missing.withColumn(
                c, F.lit(None).cast(dict(r.dtypes)[c])
            )
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")
