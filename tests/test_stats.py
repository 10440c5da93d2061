"""Distribution statistics: grouped quantiles, z-score outliers,
per-key rolling windows, bigram PMI."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tiger_etl_spark.operators import search, stats, windows


def test_group_quantiles_exact_matches_linear_interpolation(spark):
    # group "a": values 0..100 → q50 = 50, q25 = 25, q90 = 90 exactly
    rows = [("a", float(i)) for i in range(101)] + [("b", 7.0), ("b", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {
        r["g"]: r
        for r in stats.group_quantiles(
            df, ["g"], "v", [0.25, 0.5, 0.9]
        ).collect()
    }
    assert out["a"]["n_rows"] == 101
    assert out["a"]["q25"] == 25.0
    assert out["a"]["q50"] == 50.0
    assert out["a"]["q90"] == 90.0
    # 2-point group interpolates linearly: q50 of {7, 9} = 8
    assert out["b"]["q50"] == 8.0
    assert out["b"]["q25"] == 7.5


def test_group_quantiles_approx_same_shape(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(1000)], "g string, v double"
    )
    exact = stats.group_quantiles(df, ["g"], "v", [0.5, 0.99])
    approx = stats.group_quantiles(df, ["g"], "v", [0.5, 0.99], approx=True)
    assert exact.columns == approx.columns
    e, a = exact.collect()[0], approx.collect()[0]
    # sketch error is bounded; on 1000 uniform points it lands close
    assert abs(e["q50"] - a["q50"]) <= 50
    assert abs(e["q99"] - a["q99"]) <= 50


def test_zscore_outliers_finds_planted_spike(spark):
    rows = [("m1", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 1000]]
    rows += [("m2", 5.0), ("m2", 5.0)]  # zero variance → no outliers
    rows += [("m3", 42.0)]  # singleton → no outliers
    df = spark.createDataFrame(rows, "g string, v double")
    out = stats.zscore_outliers(df, ["g"], "v", threshold=2.0).collect()
    assert len(out) == 1
    assert out[0]["g"] == "m1" and out[0]["v"] == 1000.0
    assert out[0]["z"] > 2.0
    assert math.isfinite(out[0]["z"])


def test_rolling_stats_order_and_frames(spark):
    rows = [
        ("u1", 1, 10.0),
        ("u1", 2, 20.0),
        ("u1", 3, 30.0),
        ("u1", 4, 40.0),
        ("u2", 1, 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {
        (r["k"], r["t"]): r
        for r in windows.rolling_stats(df, ["k"], ["t"], "v", preceding=2).collect()
    }
    assert out[("u1", 1)]["cum_sum"] == 10.0
    assert out[("u1", 4)]["cum_sum"] == 100.0
    # moving avg over rows 2..4 at t=4
    assert out[("u1", 4)]["moving_avg"] == 30.0
    # frame shorter than `preceding` at the start
    assert out[("u1", 2)]["moving_avg"] == 15.0
    assert out[("u2", 1)]["cum_sum"] == 5.0


def test_bigram_pmi_prefers_exclusive_collocation(spark):
    # "zig zag" always co-occur exclusively; "the the" pairs are diluted
    docs = [(i, "zig zag filler" + str(i)) for i in range(6)]
    docs += [(100 + i, "the cat the dog the fish") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = search.bigram_pmi(df, "doc_id", "text", k=5, min_count=5).collect()
    assert out, "expected at least one bigram above min_count"
    top = out[0]
    assert top["ngram"] == "zig zag"
    # exclusive pair: pmi = ln(N_tok^2 / (N_big * c_x * c_y)) > 0
    assert top["pmi"] > 0
    grams = {r["ngram"] for r in out}
    assert "zig zag" in grams
