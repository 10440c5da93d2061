"""Slowly-changing-dimension (SCD2) history materialization.

CDC-native: turn an ordered change stream (key, ts, tracked attrs) into
per-key *version intervals* — one row per consecutive run of identical
attribute values, carrying ``valid_from`` / ``valid_to`` / ``is_current``.
The reference's analog is the interval-with-current-flag shape of
``user_sessions`` (``system/system/models/sessions_management/model.py:
62-88`` — login_datetime / logout_datetime / is_active maintained by the
app on every state change); here the whole history is derived set-wise
from the event log in one pass.

Scale shape: a single hash exchange on ``key_cols``. The change-detect
window, the per-(key, version) fold and the ``lead(valid_from)`` window
all require clustering only by ``key_cols`` (or a superset), so Catalyst
reuses the one exchange — no global sort, no driver state. Versions per
key are bounded by events per key, so skew follows the event skew the
caller already manages (salting upstream if a key is pathological).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    extra_aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Materialize SCD2 version intervals from a change-event log.

    A new version starts at the first event of a key and whenever ANY
    tracked attribute differs (null-safely) from the previous event of
    the same key, ordered by ``(ts_col, *tiebreak_cols)``. Output: one
    row per (key, version) with

    - ``version_idx``   0-based per key (long),
    - the tracked attribute values (constant within a version),
    - ``valid_from``    first ts of the run,
    - ``valid_to``      next version's valid_from, null for the last,
    - ``is_current``    valid_to is null,
    - ``n_rows``        events folded into the version (long),
    - plus one column per ``extra_aggs`` entry (aggregate expressions
      evaluated in the per-version fold — e.g. bookkeeping like
      ``max(ts)`` for the incremental stitcher in cdc/history.py).

    Rows with a null ``ts_col`` are dropped (unorderable).
    """
    if not attr_cols:
        raise ValueError("scd2_history requires at least one tracked attr_col")
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)

    # Null-safe change detection: a version break when any attr is
    # DISTINCT FROM its lag. row_number()==1 covers the first event
    # (lag-based tests mis-fire when the first value is itself null).
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    is_new = F.when((F.row_number().over(w) == 1) | changed, 1).otherwise(0)

    marked = df.where(F.col(ts_col).isNotNull()).withColumn(
        "version_idx",
        (F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("long"),
    )

    # Attrs are constant within a version by construction → first() is
    # deterministic here. Clustering by (key, version) is satisfied by
    # the existing hash partitioning on key — no second exchange.
    versions = marked.groupBy(*key_cols, "version_idx").agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").alias("n_rows"),
        *[F.first(c).alias(c) for c in attr_cols],
        *[expr.alias(name) for name, expr in (extra_aggs or {}).items()],
    )
    wv = Window.partitionBy(*key_cols).orderBy("version_idx")
    return (
        versions.withColumn("valid_to", F.lead("valid_from").over(wv))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            *key_cols,
            "version_idx",
            *attr_cols,
            "valid_from",
            "valid_to",
            "is_current",
            "n_rows",
            *(extra_aggs or {}),
        )
    )


def scd2_snapshot_at(history: DataFrame, ts) -> DataFrame:
    """The dimension as of ``ts``: the version whose
    ``[valid_from, valid_to)`` interval contains it. Pure filter over
    the materialized history — no shuffle, partition-prunable when the
    history is stored partitioned/sorted by valid_from."""
    t = F.lit(ts).cast("timestamp")
    return history.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
