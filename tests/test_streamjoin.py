"""Stream-stream interval join (cdc/streamjoin.py): streaming result
equals the batch twin; watermark bounds state; late rows beyond the
watermark are dropped from the join."""

from __future__ import annotations

import datetime as dt
import os

from tiger_etl_spark.cdc.streamjoin import interval_join, interval_join_stream

UTC = dt.timezone.utc
BASE = dt.datetime(2025, 6, 1, tzinfo=UTC)


def ts(m: float) -> dt.datetime:
    return BASE + dt.timedelta(minutes=m)


CLICKS = [  # (user_id, click_id, click_ts-minute)
    (1, 100, 0.0),
    (1, 101, 30.0),
    (2, 200, 5.0),
    (3, 300, 10.0),
]
PURCHASES = [  # (user_id, purchase_id, p_ts-minute)
    (1, 9000, 4.0),     # joins click 100 (within 15m)
    (1, 9001, 41.0),    # joins click 101
    (2, 9100, 25.0),    # 20m after click 200 — outside upper bound
    (3, 9200, 9.0),     # BEFORE click 300 — outside lower bound 0s
    (4, 9300, 7.0),     # no click for user 4
]


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def _inputs(spark, tmp_path):
    cdir = str(tmp_path / "clicks")
    pdir = str(tmp_path / "purchases")
    _write(
        spark,
        [(u, c, ts(m)) for u, c, m in CLICKS],
        "user_id long, click_id long, click_ts timestamp",
        cdir,
    )
    _write(
        spark,
        [(u, p, ts(m)) for u, p, m in PURCHASES],
        "user_id long, purchase_id long, p_ts timestamp",
        pdir,
    )
    return cdir, pdir


def _pairs(rows):
    return sorted((r["click_id"], r["purchase_id"]) for r in rows)


def test_stream_join_matches_batch_twin(spark, tmp_path):
    cdir, pdir = _inputs(spark, tmp_path)
    batch = interval_join(
        spark.read.parquet(cdir),
        spark.read.parquet(pdir),
        on=["user_id"],
        left_ts="click_ts",
        right_ts="p_ts",
        lower="0 seconds",
        upper="15 minutes",
    )
    want = _pairs(batch.collect())
    assert want == [(100, 9000), (101, 9001)]

    lstream = spark.readStream.schema(
        "user_id long, click_id long, click_ts timestamp"
    ).parquet(cdir)
    rstream = spark.readStream.schema(
        "user_id long, purchase_id long, p_ts timestamp"
    ).parquet(pdir)
    joined = interval_join_stream(
        lstream,
        rstream,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="p_ts",
        lower="0 seconds",
        upper="15 minutes",
        watermark="30 minutes",
    )
    name = f"sj_{abs(hash(str(tmp_path))) % 10**8}"
    ckpt = str(tmp_path / "ckpt")
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _pairs(spark.sql(f"SELECT * FROM {name}").collect())
    assert got == want


def test_stream_join_plan_is_streaming_symmetric_hash(spark, tmp_path):
    """The streaming physical plan must be the symmetric stream-stream
    join operator (bounded state), not a static join fallback."""
    cdir, pdir = _inputs(spark, tmp_path)
    lstream = spark.readStream.schema(
        "user_id long, click_id long, click_ts timestamp"
    ).parquet(cdir)
    rstream = spark.readStream.schema(
        "user_id long, purchase_id long, p_ts timestamp"
    ).parquet(pdir)
    joined = interval_join_stream(
        lstream, rstream, ["user_id"], "click_ts", "p_ts"
    )
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stream_join_state_survives_restart(spark, tmp_path):
    """A left row arriving in run 1 must still match a right row that
    only arrives in run 2 under the SAME checkpoint — the symmetric
    join state is restored, not rebuilt empty."""
    cdir, pdir = str(tmp_path / "c"), str(tmp_path / "p")
    ckpt = str(tmp_path / "ckpt")
    _write(
        spark,
        [(5, 500, ts(0.0))],
        "user_id long, click_id long, click_ts timestamp",
        cdir,
    )
    _write(
        spark,
        [(6, 9600, ts(1.0))],  # unrelated user — run 1 emits nothing
        "user_id long, purchase_id long, p_ts timestamp",
        pdir,
    )

    out_dir = str(tmp_path / "out")

    def run(name):
        # file sink, not memory: only file/durable sinks support
        # checkpoint RECOVERY, which is the point of this test
        l = spark.readStream.schema(
            "user_id long, click_id long, click_ts timestamp"
        ).parquet(cdir)
        r = spark.readStream.schema(
            "user_id long, purchase_id long, p_ts timestamp"
        ).parquet(pdir)
        joined = interval_join_stream(
            l, r, ["user_id"], "click_ts", "p_ts",
            lower="0 seconds", upper="15 minutes", watermark="30 minutes",
        )
        q = (
            joined.select("click_id", "purchase_id")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return _pairs(spark.read.parquet(out_dir).collect())

    assert run("sjr1") == []
    # run 2: the matching purchase arrives in a NEW file
    spark.createDataFrame(
        [(5, 9500, ts(5.0))], "user_id long, purchase_id long, p_ts timestamp"
    ).coalesce(1).write.mode("append").parquet(pdir)
    assert run("sjr2") == [(500, 9500)]  # joined against restored state
