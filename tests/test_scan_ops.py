"""Distributed prefix sum + packing (operators/scan_ops.py): values vs
a serial reference, exclusive mode, bin assignment, and the scale
contract — no unpartitioned window over the data (the only global-order
window runs over the P partition totals)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tiger_etl_spark.operators.scan_ops import pack_by_budget, running_total


@pytest.fixture(scope="module")
def df(spark):
    rows = [(i, ((i * 37) % 11) + 1) for i in range(1, 501)]
    return spark.createDataFrame(rows, "k int, v int").repartition(13)


def test_running_total_matches_serial(spark, df):
    got = {
        r["k"]: r["running_total"]
        for r in running_total(df, ["k"], "v", num_partitions=7).collect()
    }
    acc = 0
    for i in range(1, 501):
        acc += ((i * 37) % 11) + 1
        assert got[i] == acc, i


def test_exclusive_and_single_partition(spark, df):
    got = {
        r["k"]: r["rt"]
        for r in running_total(
            df, ["k"], "v", out_col="rt", exclusive=True, num_partitions=1
        ).collect()
    }
    assert got[1] == 0
    acc = 0
    for i in range(1, 501):
        assert got[i] == acc, i
        acc += ((i * 37) % 11) + 1


def test_pack_by_budget(spark, df):
    packed = pack_by_budget(df, ["k"], "v", budget=50)
    rows = sorted(packed.collect(), key=lambda r: r["k"])
    acc = 0
    for r in rows:
        assert r["bin_id"] == acc // 50, r["k"]
        acc += r["v"]
    # bins are contiguous from 0
    bins = sorted({r["bin_id"] for r in rows})
    assert bins == list(range(len(bins)))
    with pytest.raises(ValueError):
        pack_by_budget(df, ["k"], "v", budget=50, oversize="nope")


def test_no_global_window_over_data(spark, df):
    """Scale contract: the data path has no single-partition Exchange
    feeding a Window over N rows — only the P-row offsets side may.
    Assert by checking the ranged side keeps >1 partition while the
    plan still resolves (structural), and that rangepartitioning is
    present (even shuffle, not SinglePartition)."""
    out = running_total(df, ["k"], "v", num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan
    # the only SinglePartition exchange allowed is the tiny offsets side
    # (input to a P-row window); the data side must stay range-partitioned
    assert plan.lower().count("singlepartition") <= 1, plan
