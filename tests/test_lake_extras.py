"""Lake extras: truncate (S5), delete_where cascade (J5), map-column
documents (S8 analog), schema evolution registry on the table."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable

UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def test_truncate_and_time_travel(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"), "url string, warc_ts timestamp, v string", "url", num_buckets=2
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "x")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    pre = LakeTable.load(t.path)
    t.truncate()
    assert t.scan(spark).count() == 0
    # old snapshot still readable (data files retained until expiry)
    assert pre.scan(spark).count() == 1


def test_delete_where_cascade(spark, tmp_path):
    """Parent users deleted → child sessions tombstoned by FK, the
    reference's ondelete=CASCADE re-expressed (model.py:45-50)."""
    sessions = LakeTable.create(
        str(tmp_path / "sessions"),
        "session_id string, warc_ts timestamp, user_id long",
        key_col="session_id",
        num_buckets=2,
    )
    rows = [("I", i + 1, f"s{i}", ts(i), i % 3) for i in range(9)]
    sessions.merge(
        spark,
        spark.createDataFrame(
            rows, "op string, op_seq long, session_id string, warc_ts timestamp, user_id long"
        ),
    )
    deleted_users = [0, 2]
    sessions.delete_where(spark, F.col("user_id").isin(deleted_users), op_seq=100)
    left = sessions.scan(spark).select("user_id").distinct().collect()
    assert {r["user_id"] for r in left} == {1}
    # a newer event for a cascaded key still wins (delete is an event,
    # not a barrier)
    sessions.merge(
        spark,
        spark.createDataFrame(
            [("U", 101, "s0", ts(1000), 0)],
            "op string, op_seq long, session_id string, warc_ts timestamp, user_id long",
        ),
    )
    assert sessions.scan(spark).where("session_id = 's0'").count() == 1


def test_map_column_documents(spark, tmp_path):
    """S8 — Mongo-style semi-structured docs: map payload column,
    keyed upsert/delete through the same MERGE."""
    t = LakeTable.create(
        str(tmp_path / "docs"),
        "doc_key string, warc_ts timestamp, doc map<string,string>",
        key_col="doc_key",
        num_buckets=2,
    )
    df = spark.createDataFrame(
        [
            ("I", 1, "d1", ts(1), {"a": "1"}),
            ("U", 2, "d1", ts(2), {"a": "2", "b": "3"}),
            ("I", 3, "d2", ts(3), {"x": "9"}),
            ("D", 4, "d2", ts(4), None),
        ],
        "op string, op_seq long, doc_key string, warc_ts timestamp, doc map<string,string>",
    )
    t.merge(spark, df)
    rows = {r["doc_key"]: r["doc"] for r in t.scan(spark).collect()}
    assert rows == {"d1": {"a": "2", "b": "3"}}


def test_describe_manifest_summary(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "d"), "url string, warc_ts timestamp, v string", "url",
        num_buckets=4,
    )
    rows = [("I", i + 1, f"u{i}", ts(i), "x") for i in range(40)]
    t.merge(
        spark,
        spark.createDataFrame(
            rows, "op string, op_seq long, url string, warc_ts timestamp, v string"
        ),
    )
    d = t.describe()
    assert d["rows"] == 40 and d["num_buckets"] == 4
    assert d["n_delta_files"] == d["n_files"] > 0
    assert d["delta_ratio"] == 1.0
    assert d["bucket_skew"] >= 1.0
    t.compact(spark)
    d2 = t.describe()
    assert d2["delta_ratio"] == 0.0 and d2["n_delta_files"] == 0
    assert d2["rows"] == 40 and d2["version"] == d["version"] + 1
