"""ZSET mutation analog: zadd/zrem/zrange round-trip on the
LakeTable-backed sorted set, plus the pure resolve_updates operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiger_etl_spark.operators import zset


def test_zadd_zrem_zrange_roundtrip(spark, tmp_path):
    zs = zset.ZSet.create(str(tmp_path / "zs"))
    zs.zadd(spark, {"a": 3.0, "b": 1.0, "c": 2.0}, op_seq=100)
    got = {(r.rank, r.member, r.score) for r in zs.zrange(spark, 0, 2).collect()}
    assert got == {(1, "b", 1.0), (2, "c", 2.0), (3, "a", 3.0)}

    # zadd on an existing member updates its score (upsert)
    zs.zadd(spark, {"b": 9.0, "d": 0.5}, op_seq=200)
    assert zs.zscore(spark, "b") == 9.0
    assert zs.zcard(spark) == 4

    zs.zrem(spark, ["a"], op_seq=300)
    assert zs.zscore(spark, "a") is None
    got = [
        (r.rank, r.member) for r in zs.zrange(spark, 0, 9, desc=True).collect()
    ]
    assert got == [(1, "b"), (2, "c"), (3, "d")]

    # rank sub-range [1, 2] (0-based inclusive)
    got = [(r.rank, r.member) for r in zs.zrange(spark, 1, 2).collect()]
    assert got == [(2, "c"), (3, "b")]

    # durable: a fresh handle sees the committed state
    zs2 = zset.ZSet.load(str(tmp_path / "zs"))
    assert zs2.zscore(spark, "d") == 0.5


def test_zadd_after_zrem_recreates_member(spark, tmp_path):
    zs = zset.ZSet.create(str(tmp_path / "zs"))
    zs.zadd(spark, {"a": 1.0}, op_seq=10)
    zs.zrem(spark, ["a"], op_seq=20)
    zs.zadd(spark, {"a": 5.0}, op_seq=30)
    assert zs.zscore(spark, "a") == 5.0


def test_resolve_updates_latest_wins_and_rem_removes(spark):
    df = spark.createDataFrame(
        [
            ("m1", 1, zset.ZADD, 1.0),
            ("m1", 2, zset.ZADD, 7.0),
            ("m2", 3, zset.ZADD, 2.0),
            ("m2", 4, zset.ZREM, None),
            ("m3", 5, zset.ZREM, None),
            ("m3", 6, zset.ZADD, 4.0),
        ],
        "member string, seq long, zop string, score double",
    )
    got = {
        r.member: r.score
        for r in zset.resolve_updates(df, "member", ["seq"], "zop", "score").collect()
    }
    assert got == {"m1": 7.0, "m3": 4.0}
