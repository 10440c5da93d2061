"""SCD2 history materialization (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tiger_etl_spark.operators.scd import scd2_history, scd2_snapshot_at

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def _t(m):
    return T0 + dt.timedelta(minutes=m)


def _history(spark, rows, attrs=("status",)):
    cols = ["key", "ts", "seq"] + list(attrs)
    df = spark.createDataFrame(rows, cols)
    return scd2_history(df, ["key"], list(attrs), "ts", tiebreak_cols=["seq"])


def test_versions_and_intervals(spark):
    rows = [
        (1, _t(0), 0, "new"),
        (1, _t(5), 1, "new"),      # no change → folds into v0
        (1, _t(10), 2, "active"),  # v1
        (1, _t(20), 3, "active"),
        (1, _t(30), 4, "closed"),  # v2 (current)
        (2, _t(0), 5, "active"),   # single-version key
    ]
    out = _history(spark, rows).orderBy("key", "version_idx").collect()
    assert [(r.key, r.version_idx, r.status, r.n_rows) for r in out] == [
        (1, 0, "new", 2), (1, 1, "active", 2), (1, 2, "closed", 1),
        (2, 0, "active", 1),
    ]
    v0, v1, v2, u2 = out
    assert (v0.valid_from, v0.valid_to, v0.is_current) == (_t(0), _t(10), False)
    assert (v1.valid_from, v1.valid_to) == (_t(10), _t(30))
    assert v2.valid_to is None and v2.is_current
    assert u2.is_current


def test_null_attr_is_a_value(spark):
    """Null attr values start/end versions null-safely — including a
    null FIRST value (the row_number guard, where lag-only misfires)."""
    rows = [
        (1, _t(0), 0, None),
        (1, _t(5), 1, None),     # null == null → same version
        (1, _t(10), 2, "a"),
        (1, _t(15), 3, None),    # back to null → new version
    ]
    out = _history(spark, rows).orderBy("version_idx").collect()
    assert [(r.version_idx, r.status, r.n_rows) for r in out] == [
        (0, None, 2), (1, "a", 1), (2, None, 1),
    ]


def test_multi_attr_any_change_splits(spark):
    rows = [
        (1, _t(0), 0, "a", 10),
        (1, _t(5), 1, "a", 10),
        (1, _t(10), 2, "a", 20),  # second attr changes → new version
        (1, _t(15), 3, "b", 20),  # first attr changes → new version
    ]
    out = _history(spark, rows, attrs=("status", "score")).orderBy(
        "version_idx"
    ).collect()
    assert [(r.status, r.score, r.n_rows) for r in out] == [
        ("a", 10, 2), ("a", 20, 1), ("b", 20, 1),
    ]


def test_null_ts_dropped_and_snapshot(spark):
    rows = [
        (1, _t(0), 0, "new"),
        (1, None, 1, "noise"),  # unorderable → dropped
        (1, _t(10), 2, "active"),
    ]
    hist = _history(spark, rows)
    assert hist.count() == 2
    # snapshot semantics: [valid_from, valid_to) half-open
    at = lambda m: scd2_snapshot_at(hist, _t(m)).collect()
    assert [r.status for r in at(0)] == ["new"]      # boundary: from incl
    assert [r.status for r in at(9)] == ["new"]
    assert [r.status for r in at(10)] == ["active"]  # boundary: to excl
    assert [r.status for r in at(99)] == ["active"]  # open current version
    assert at(-1) == []                              # before first version


def test_single_exchange_plan(spark):
    """Change-detect window, version fold and lead-window all reuse ONE
    key exchange — no per-stage reshuffle, no global sort."""
    df = spark.range(100).select(
        (F.col("id") % 7).alias("key"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("seq"),
        (F.col("id") % 3).cast("string").alias("status"),
    )
    out = scd2_history(df, ["key"], ["status"], "ts", tiebreak_cols=["seq"])
    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
