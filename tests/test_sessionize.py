"""Stateful streaming sessionization (applyInPandasWithState) vs the
batch sessionize operator."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from tiger_etl_spark.cdc.sessionize import streaming_sessionize
from tiger_etl_spark.operators.windows import sessionize

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)


def _events():
    """Two users; u1 has two sessions separated by a 2-hour gap, u2 one
    session; a late final event far in the future advances the watermark
    so earlier sessions time out and emit."""
    rows = []
    for i in range(3):  # u1 session A: 12:00, 12:10, 12:20
        rows.append((1, T0 + dt.timedelta(minutes=10 * i)))
    for i in range(2):  # u1 session B: 15:00, 15:05
        rows.append((1, T0 + dt.timedelta(hours=3, minutes=5 * i)))
    for i in range(2):  # u2 session: 12:00, 12:30
        rows.append((2, T0 + dt.timedelta(minutes=30 * i)))
    # watermark pusher (its own open session never completes)
    rows.append((3, T0 + dt.timedelta(days=2)))
    return rows


def test_streaming_sessions_match_batch(spark, tmp_path):
    rows = _events()
    src = str(tmp_path / "events")
    os.makedirs(src)
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    # one file per user so multiple triggers advance the watermark
    df.where("user_id = 1").coalesce(1).write.parquet(os.path.join(src, "p=1"))
    df.where("user_id = 2").coalesce(1).write.parquet(os.path.join(src, "p=2"))
    df.where("user_id = 3").coalesce(1).write.parquet(os.path.join(src, "p=3"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = streaming_sessionize(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }

    batch = sessionize(df, ["user_id"], "ts", gap_seconds=1800)
    expected_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.collect()
    }
    # every emitted session must be exactly a batch session
    assert got <= expected_all, got - expected_all
    # the sessions that closed before the final watermark must have emitted
    closed = {
        s for s in expected_all if s[0] in (1, 2)
    }
    assert closed <= got, closed - got


def test_batch_sessionize_gap_boundaries(spark):
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(seconds=1800)),  # exactly the gap -> same session
        (1, T0 + dt.timedelta(seconds=3601)),  # 1801s later -> new session
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.session_idx, r.n_events)
        for r in sessionize(df, ["user_id"], "ts", 1800).collect()
    )
    assert got == [(0, 2), (1, 1)]


def test_batch_sessionize_subsecond_gap(spark):
    """Gaps are compared in integer microseconds, not truncated seconds:
    1800.5s splits, 1799.5s does not — second-truncated unix_timestamp()
    would get both wrong relative to a fractional-epoch oracle."""
    rows = [
        (1, T0),
        (1, T0 + dt.timedelta(seconds=1800, microseconds=500_000)),  # split
        (2, T0),
        (2, T0 + dt.timedelta(seconds=1799, microseconds=500_000)),  # same
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r.user_id, r.session_idx, r.n_events)
        for r in sessionize(df, ["user_id"], "ts", 1800).collect()
    )
    assert got == [(1, 0, 1), (1, 1, 1), (2, 0, 2)]
