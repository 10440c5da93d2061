"""Time travel (scan at version), change data feed (changes_between),
and event-time windowed aggregation (batch twin + watermarked stream)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.windowed import (
    windowed_counts_batch,
    windowed_counts_stream,
)
from tiger_etl_spark.lake import LakeTable

DDL = "url string, warc_ts timestamp, text string"
UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def batch_df(spark, rows):
    return spark.createDataFrame(
        [(op, sq, u, ts(t), x) for op, sq, u, t, x in rows],
        "op string, op_seq long, url string, warc_ts timestamp, text string",
    )


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "t"), DDL, key_col="url", order_cols=("warc_ts",), num_buckets=4
    )


def state(spark, table, version=None):
    return {
        r["url"]: r["text"] for r in table.scan(spark, version=version).collect()
    }


def test_scan_at_old_version(spark, table):
    table.merge(spark, batch_df(spark, [("I", 1, "a", 1, "a1"), ("I", 2, "b", 2, "b1")]))
    v1 = table.manifest["version"]
    table.merge(spark, batch_df(spark, [("U", 3, "a", 10, "a2"), ("D", 4, "b", 11, None)]))
    v2 = table.manifest["version"]
    assert state(spark, table) == {"a": "a2"}
    assert state(spark, table, version=v1) == {"a": "a1", "b": "b1"}
    assert state(spark, table, version=v2) == {"a": "a2"}
    # a reloaded handle time-travels identically
    fresh = LakeTable.load(table.path)
    assert state(spark, fresh, version=v1) == {"a": "a1", "b": "b1"}


def test_changes_between_net_effect(spark, table):
    table.merge(
        spark,
        batch_df(
            spark,
            [("I", 1, "keep", 1, "k1"), ("I", 2, "upd", 2, "u1"), ("I", 3, "del", 3, "d1")],
        ),
    )
    v1 = table.manifest["version"]
    # one commit per change so v1→v3 spans several snapshots
    table.merge(spark, batch_df(spark, [("U", 4, "upd", 10, "u2"), ("I", 5, "new", 11, "n1")]))
    table.merge(
        spark,
        batch_df(
            spark,
            [
                ("D", 6, "del", 12, None),
                ("I", 7, "ghost", 13, "g1"),
                ("D", 8, "ghost", 14, None),
            ],
        ),
    )
    v3 = table.manifest["version"]
    changes = {
        r["url"]: (r["_change_op"], r["text"])
        for r in table.changes_between(spark, v1, v3).collect()
    }
    # net-effect: unchanged key absent; insert+delete ("ghost") collapses
    assert changes == {
        "upd": ("U", "u2"),
        "new": ("I", "n1"),
        "del": ("D", None),
    }
    # applying the feed to the v1 snapshot reproduces the v3 snapshot
    v1_state = state(spark, table, version=v1)
    for url, (op, text) in changes.items():
        if op == "D":
            v1_state.pop(url, None)
        else:
            v1_state[url] = text
    assert v1_state == state(spark, table, version=v3)


def test_changes_between_same_version_empty(spark, table):
    table.merge(spark, batch_df(spark, [("I", 1, "a", 1, "a1")]))
    v = table.manifest["version"]
    assert table.changes_between(spark, v, v).count() == 0


# ---------------------------------------------------------------- windows
def _events_df(spark, rows):
    """rows: (ts_sec, key)"""
    return spark.createDataFrame(
        [(ts(t), k) for t, k in rows], "ts timestamp, key string"
    )


def test_windowed_counts_batch(spark):
    df = _events_df(
        spark, [(0, "a"), (30, "a"), (61, "a"), (30, "b"), (150, "b")]
    )
    out = {
        (r["window_start"].second + r["window_start"].minute * 60, r["key"]): r[
            "n_events"
        ]
        for r in windowed_counts_batch(df, "ts", "key", "1 minute").collect()
    }
    assert out == {(0, "a"): 2, (60, "a"): 1, (0, "b"): 1, (120, "b"): 1}


def _write_event_file(path: str, rows) -> None:
    """One flat parquet file (the stream source lists files, not
    subdirectories — same layout as cdc.datagen.write_change_files)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "ts": pa.array([ts(t) for t, _ in rows], pa.timestamp("us", tz="UTC")),
            "key": pa.array([k for _, k in rows]),
        }
    )
    pq.write_table(tbl, path)


def test_dedup_stream_suppresses_redelivery(spark, tmp_path):
    """A key re-delivered in a later micro-batch within the watermark
    horizon must be emitted exactly once."""
    from tiger_etl_spark.cdc.windowed import dedup_stream

    src = str(tmp_path / "dsrc")
    os.makedirs(src)
    _write_event_file(os.path.join(src, "f0.parquet"), [(0, "a"), (10, "b")])
    # re-delivery of 'a' (same key) + a fresh key
    _write_event_file(os.path.join(src, "f1.parquet"), [(20, "a"), (30, "c")])
    stream = (
        spark.readStream.schema("ts timestamp, key string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = dedup_stream(stream, ["key"], "ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT key, count(*) AS n FROM dedup_out GROUP BY key").collect()
    assert {r["key"]: r["n"] for r in rows} == {"a": 1, "b": 1, "c": 1}


def test_windowed_stream_drops_late_rows(spark, tmp_path):
    """File-ordered micro-batches: a row arriving after the watermark
    passed its window must be dropped from the aggregation; an on-time
    row must count."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1 advances event time to t=600
    _write_event_file(
        os.path.join(src, "f0.parquet"), [(0, "a"), (60, "a"), (600, "a")]
    )
    # batch 2: t=30 is older than watermark (600-120=480) AND its window
    # [0,60) is closed → dropped; t=590 lands in a still-open window → kept
    _write_event_file(os.path.join(src, "f1.parquet"), [(30, "a"), (590, "b")])
    stream = (
        spark.readStream.schema("ts timestamp, key string")
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = windowed_counts_stream(stream, "ts", "key", "1 minute", watermark="2 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM win_counts").collect()
    # latest update per (window, key)
    final = {}
    for r in rows:
        final[(r["window_start"].minute, r["key"])] = r["n_events"]
    assert final[(0, "a")] == 2  # late t=30 NOT counted
    assert final[(9, "b")] == 1  # on-time within watermark counted
    assert final[(10, "a")] == 1


def test_changes_between_emits_delete_for_vanished_keys(spark, table):
    """truncate() (and tombstone GC) remove keys from the newer snapshot
    entirely — the feed must still emit a D for them, carrying the
    deleted row's own event time so downstream tombstones win LWW."""
    table.merge(
        spark,
        batch_df(spark, [("I", i, f"k{i}", i, f"v{i}") for i in range(4)]),
    )
    v1 = table.manifest["version"]
    table.truncate()
    v2 = table.manifest["version"]
    ch = {
        r["url"]: (r["_change_op"], r["warc_ts"])
        for r in table.changes_between(spark, v1, v2).collect()
    }
    assert set(ch) == {f"k{i}" for i in range(4)}
    for i in range(4):
        op, wts = ch[f"k{i}"]
        assert op == "D"
        assert wts.replace(tzinfo=UTC) == ts(i)  # the deleted row's ts


def test_replica_follows_truncate(spark, table, tmp_path):
    from tiger_etl_spark.cdc.replicate import create_replica, sync_to

    table.merge(
        spark, batch_df(spark, [("I", i, f"k{i}", i, f"v{i}") for i in range(3)])
    )
    rep = create_replica(table, str(tmp_path / "rep"))
    sync_to(spark, table, rep)
    assert rep.scan(spark).count() == 3
    table.truncate()
    sync_to(spark, table, rep)
    assert rep.scan(spark).count() == 0
