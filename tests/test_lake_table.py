"""LakeTable format: snapshot isolation, merge (mor/cow), compaction,
tombstones, snapshot expiry."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable

DDL = "url string, warc_ts timestamp, text string"
UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def batch_df(spark, rows):
    """rows: (op, op_seq, url, ts_sec, text)"""
    return spark.createDataFrame(
        [(op, sq, u, ts(t), x) for op, sq, u, t, x in rows],
        "op string, op_seq long, url string, warc_ts timestamp, text string",
    )


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "t"), DDL, key_col="url", order_cols=("warc_ts",), num_buckets=4
    )


def state(spark, table):
    return {
        r["url"]: (r["warc_ts"], r["text"])
        for r in table.scan(spark).collect()
    }


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_merge_upsert_delete(spark, table, mode):
    b1 = batch_df(
        spark,
        [("I", 1, "a", 1, "a1"), ("I", 2, "b", 2, "b1"), ("I", 3, "c", 3, "c1")],
    )
    table.merge(spark, b1, mode=mode)
    assert set(state(spark, table)) == {"a", "b", "c"}

    b2 = batch_df(spark, [("U", 4, "a", 10, "a2"), ("D", 5, "b", 11, None)])
    table.merge(spark, b2, mode=mode)
    st = state(spark, table)
    assert set(st) == {"a", "c"}
    assert st["a"][1] == "a2"


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_within_batch_lww_and_tombstone_wins(spark, table, mode):
    # same key three times in one batch: latest (warc_ts, op_seq) wins;
    # a delete must survive dedup to beat earlier I/U
    b = batch_df(
        spark,
        [
            ("I", 1, "k", 1, "v1"),
            ("U", 2, "k", 5, "v2"),
            ("D", 3, "k", 9, None),
            ("I", 4, "x", 2, "x1"),
        ],
    )
    table.merge(spark, b, mode=mode)
    assert set(state(spark, table)) == {"x"}


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_late_event_cannot_resurrect_delete(spark, table, mode):
    table.merge(spark, batch_df(spark, [("I", 1, "k", 1, "v1")]), mode=mode)
    table.merge(spark, batch_df(spark, [("D", 2, "k", 100, None)]), mode=mode)
    # late update with older event time than the delete → no-op
    table.merge(spark, batch_df(spark, [("U", 3, "k", 50, "late")]), mode=mode)
    assert state(spark, table) == {}
    # but a genuinely newer event re-inserts
    table.merge(spark, batch_df(spark, [("U", 4, "k", 200, "new")]), mode=mode)
    assert state(spark, table)["k"][1] == "new"


def test_tie_on_ts_broken_by_op_seq(spark, table):
    b = batch_df(spark, [("I", 1, "k", 7, "low"), ("U", 9, "k", 7, "high")])
    table.merge(spark, b)
    assert state(spark, table)["k"][1] == "high"


def test_replay_same_batch_is_noop(spark, table):
    b = batch_df(spark, [("I", 1, "a", 1, "a1"), ("I", 2, "b", 2, "b1")])
    table.merge(spark, b)
    before = state(spark, table)
    table.merge(spark, b)  # replayed batch: LWW guard makes it a no-op
    assert state(spark, table) == before


def test_compact_collapses_deltas_and_gcs_tombstones(spark, table):
    for i in range(4):
        table.merge(
            spark,
            batch_df(spark, [("I", i * 2 + 1, f"k{i}", i, f"v{i}"), ("U", i * 2 + 2, "hot", 50 + i, f"h{i}")]),
        )
    table.merge(spark, batch_df(spark, [("D", 100, "k0", 99, None)]))
    n_delta = sum(1 for f in table.manifest["files"] if f["kind"] == "delta")
    assert n_delta > 0
    before = state(spark, table)
    stats = table.compact(spark, tombstone_horizon=ts(1000))
    assert stats.files_removed == n_delta
    assert all(f["kind"] == "base" for f in table.manifest["files"])
    assert state(spark, table) == before
    # tombstone for k0 still present (horizon in future → kept? no: kept
    # only if warc_ts >= horizon; ts(99) < ts(1000) → dropped)
    internal = table.scan(spark, include_internal=True, include_tombstones=True)
    assert internal.where(F.col("_deleted")).count() == 0


def test_snapshot_isolation_reader_sees_old_version(spark, table):
    table.merge(spark, batch_df(spark, [("I", 1, "a", 1, "a1")]))
    old = LakeTable.load(table.path)
    table.merge(spark, batch_df(spark, [("I", 2, "b", 2, "b1")]))
    assert set(state(spark, old)) == {"a"}
    assert set(state(spark, table)) == {"a", "b"}


def test_expire_snapshots(spark, table):
    for i in range(6):
        table.merge(spark, batch_df(spark, [("U", i + 1, "k", i, f"v{i}")]))
    table.compact(spark)
    removed = table.expire_snapshots(keep_last=1)
    assert removed > 0
    assert state(spark, table)["k"][1] == "v5"


def test_concurrent_commit_detected(spark, table, tmp_path):
    stale = LakeTable.load(table.path)
    table.merge(spark, batch_df(spark, [("I", 1, "a", 1, "a1")]))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        stale.merge(spark, batch_df(spark, [("I", 2, "b", 2, "b1")]))
