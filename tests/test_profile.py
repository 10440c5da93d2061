"""Table profiling (operators/profile.py): exact stats vs hand-computed
expectations, approx (HLL) mode shape, and the two-job scale contract
(exact = one evenly-keyed shuffle; approx = zero wide shuffles)."""

from __future__ import annotations

import pytest

from tiger_etl_spark.operators.profile import profile


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 10.5),
        (2, "b", None),
        (3, None, 2.0),
        (4, "b", 2.0),
        (None, "c", 7.25),
    ]
    return spark.createDataFrame(rows, "k int, s string, v double")


def test_exact_profile(spark, df):
    got = {r["col_name"]: r for r in profile(df).collect()}
    assert set(got) == {"k", "s", "v"}
    k, s, v = got["k"], got["s"], got["v"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (5, 1, 4)
    assert (k["min_val"], k["max_val"]) == ("1", "4")
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)
    assert (s["min_val"], s["max_val"]) == ("a", "c")
    # numeric min/max use value order, not string order ("10.5" > "2.0"
    # lexically would give min "10.5")
    assert (v["min_val"], v["max_val"]) == ("2.0", "10.5")
    assert v["n_distinct"] == 3


def test_column_subset_and_empty(spark, df):
    got = profile(df, ["k"]).collect()
    assert [r["col_name"] for r in got] == ["k"]
    empty = df.where("k > 100")
    r = {x["col_name"]: x for x in profile(empty, ["k", "s"]).collect()}
    assert r["k"]["n_rows"] == 0 and r["k"]["n_distinct"] == 0
    assert r["k"]["min_val"] is None
    with pytest.raises(ValueError):
        profile(df, [])


def test_approx_profile_single_job(spark, df):
    ap = profile(df, approx=True)
    got = {r["col_name"]: r for r in ap.collect()}
    # HLL is exact at tiny cardinalities
    assert got["k"]["n_distinct"] == 4
    assert got["s"]["n_nulls"] == 1
    # scale contract: approx mode has NO wide shuffle (single-row
    # global agg + local stack only)
    plan = ap._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == plan.count("Exchange SinglePartition"), plan
