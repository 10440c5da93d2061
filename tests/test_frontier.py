"""Crawl-frontier operators: alias-chain resolution (pointer doubling),
revisit priority, politeness waves."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.operators import frontier


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_chain_resolution_exact_depths(spark):
    # a→b→c→T, d→T, e terminal-less src pointing at T directly
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "T"), ("d", "T"), ("e", "T")],
    )
    got = {
        r["src"]: (r["final"], r["depth"], r["unresolved"])
        for r in frontier.resolve_alias_chains(e, max_hops=8).collect()
    }
    assert got == {
        "a": ("T", 3, False),
        "b": ("T", 2, False),
        "c": ("T", 1, False),
        "d": ("T", 1, False),
        "e": ("T", 1, False),
    }


def test_chain_cycle_and_tail_into_cycle(spark):
    # x→y→x cycle; t→x enters the cycle; ok→T resolves
    e = _edges(spark, [("x", "y"), ("y", "x"), ("t", "x"), ("ok", "T")])
    got = {
        r["src"]: (r["final"], r["depth"], r["unresolved"])
        for r in frontier.resolve_alias_chains(e, max_hops=8).collect()
    }
    assert got["ok"] == ("T", 1, False)
    for s in ("x", "y", "t"):
        assert got[s] == (None, None, True)


def test_chain_longer_than_max_hops_unresolved(spark):
    # chain of length 6 with max_hops=4 → unresolved
    e = _edges(
        spark,
        [(f"n{i}", f"n{i+1}") for i in range(6)],
    )
    got = {
        r["src"]: (r["final"], r["unresolved"])
        for r in frontier.resolve_alias_chains(e, max_hops=4).collect()
    }
    assert got["n0"] == (None, True)  # 6 hops > 4
    assert got["n2"] == ("n6", False)  # 4 hops, exactly at budget
    assert got["n5"] == ("n6", False)


def test_chain_conflicting_edges_deterministic(spark):
    # two declared targets for 'a' → min dst wins
    e = _edges(spark, [("a", "z"), ("a", "b"), ("b", "T")])
    got = {
        r["src"]: (r["final"], r["depth"])
        for r in frontier.resolve_alias_chains(e, max_hops=8).collect()
    }
    assert got["a"] == ("T", 2)


def test_revisit_priority_rates(spark):
    t0 = datetime.datetime(2026, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # k1: 4 obs, content changes twice → 2*1e6 div 3 = 666666
        ("k1", ts(0), "h0"),
        ("k1", ts(1), "h0"),
        ("k1", ts(2), "h1"),
        ("k1", ts(3), "h2"),
        # k2: 2 obs, no change → 0
        ("k2", ts(0), "same"),
        ("k2", ts(9), "same"),
        # k3: singleton → rate 0
        ("k3", ts(5), "x"),
    ]
    obs = spark.createDataFrame(rows, "key string, ts timestamp, h string")
    got = {
        r["key"]: (r["n_obs"], r["n_changes"], r["span_us"], r["change_rate_ppm"])
        for r in frontier.revisit_priority(obs, "key", "ts", "h").collect()
    }
    assert got["k1"] == (4, 2, 3 * 60_000_000, 666_666)
    assert got["k2"] == (2, 0, 9 * 60_000_000, 0)
    assert got["k3"] == (1, 0, 0, 0)


def test_politeness_waves_rank_and_cap(spark):
    rows = [
        ("h1", "u1", 10),
        ("h1", "u2", 30),
        ("h1", "u3", 20),
        ("h2", "u4", 5),
    ]
    urls = spark.createDataFrame(rows, "host string, url string, p int")
    got = {
        r["url"]: (r["host"], r["wave"])
        for r in frontier.politeness_waves(urls, "host", "url", "p").collect()
    }
    assert got == {
        "u2": ("h1", 0),
        "u3": ("h1", 1),
        "u1": ("h1", 2),
        "u4": ("h2", 0),
    }
    capped = frontier.politeness_waves(urls, "host", "url", "p", max_wave=0)
    assert {r["url"] for r in capped.collect()} == {"u2", "u4"}


def test_chain_resolution_plan_is_bounded_joins(spark):
    """Pointer doubling must be O(log max_hops) joins, not O(hops):
    the physical plan for max_hops=32 contains ≤ 8 SortMergeJoin/
    BroadcastHashJoin nodes from the doubling loop (6 rounds + dedup +
    the has_out probe), and no CartesianProduct."""
    e = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(20)])
    plan = frontier.resolve_alias_chains(e, max_hops=32)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_chain_resolution_matches_reference_walk(spark):
    """Parity on a seeded random graph (cycles, self-loops, conflicting
    edges, long chains) against a single-threaded reference walk."""
    import random

    rng = random.Random(20260821)
    nodes = [f"n{i}" for i in range(120)]
    edges = []
    for s in nodes:
        r = rng.random()
        if r < 0.15:
            continue  # terminal (no outgoing edge)
        if r < 0.20:
            edges.append((s, s))  # self-loop
            continue
        edges.append((s, rng.choice(nodes)))
        if r > 0.9:  # conflicting second declaration
            edges.append((s, rng.choice(nodes)))
    max_hops = 6

    # reference: dedupe by min dst, walk step-by-step
    dst = {}
    for s, d in edges:
        dst[s] = min(dst.get(s, d), d)
    expected = {}
    for s in dst:
        cur, depth = dst[s], 1
        while depth <= max_hops and cur in dst:
            cur, depth = dst[cur], depth + 1
        if depth > max_hops and cur in dst:
            expected[s] = (None, None, True)
        elif depth > max_hops:
            expected[s] = (None, None, True)
        else:
            expected[s] = (cur, depth, False)

    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["src"]: (r["final"], r["depth"], r["unresolved"])
        for r in frontier.resolve_alias_chains(df, max_hops=max_hops).collect()
    }
    assert got == expected
