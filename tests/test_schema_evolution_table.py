"""Table-level schema evolution (Iceberg schema-id analog): files keep
their physical write-time schema; the read path lifts every file to the
live schema — added columns as typed NULLs, renames resolved from the
manifest's per-schema rename maps, widened types cast. Complements the
WIRE-level mapping tests (cdc/schema_evolution.py, test_pipeline)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable

UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 6, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def _mk(spark, tmp_path, ddl="url string, warc_ts timestamp, v string"):
    return LakeTable.create(str(tmp_path / "t"), ddl, "url", num_buckets=2)


def test_added_column_null_for_old_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "x")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    t.evolve_schema("url string, warc_ts timestamp, v string, extra long")
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 2, "b", ts(2), "y", 7)],
            "op string, op_seq long, url string, warc_ts timestamp, v string, extra long",
        ),
    )
    got = {r["url"]: r["extra"] for r in t.scan(spark).collect()}
    assert got == {"a": None, "b": 7}
    # compaction rewrites under the live schema and preserves the lift
    t.compact(spark)
    got = {r["url"]: r["extra"] for r in t.scan(spark).collect()}
    assert got == {"a": None, "b": 7}
    assert all(
        f.get("schema_id") == t.manifest["current_schema_id"]
        for f in t.manifest["files"]
    )


def test_renamed_column_keeps_old_file_values(spark, tmp_path):
    """The regression that motivates per-file schema ids: parquet
    matches columns by NAME, so without the lift a renamed column in a
    pre-rename file silently reads as all-NULL."""
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "keepme")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    t.evolve_schema(
        "url string, warc_ts timestamp, val string", renames={"v": "val"}
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 2, "b", ts(2), "new")],
            "op string, op_seq long, url string, warc_ts timestamp, val string",
        ),
    )
    got = {r["url"]: r["val"] for r in t.scan(spark).collect()}
    assert got == {"a": "keepme", "b": "new"}
    # LWW across the rename boundary: a newer event beats the old row
    t.merge(
        spark,
        spark.createDataFrame(
            [("U", 3, "a", ts(10), "updated")],
            "op string, op_seq long, url string, warc_ts timestamp, val string",
        ),
    )
    got = {r["url"]: r["val"] for r in t.scan(spark).collect()}
    assert got == {"a": "updated", "b": "new"}
    t.compact(spark)
    assert {r["url"]: r["val"] for r in t.scan(spark).collect()} == got
    # a reloaded handle lifts the same way
    assert {
        r["url"]: r["val"] for r in LakeTable.load(t.path).scan(spark).collect()
    } == got


def test_widened_column_casts(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"),
        "url string, warc_ts timestamp, n int",
        "url",
        num_buckets=2,
    )
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), 5)],
            "op string, op_seq long, url string, warc_ts timestamp, n int",
        ),
    )
    t.evolve_schema("url string, warc_ts timestamp, n bigint")
    df = t.scan(spark)
    assert dict(df.dtypes)["n"] == "bigint"
    assert df.collect()[0]["n"] == 5


def test_time_travel_keeps_old_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "x")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    v_old = t.manifest["version"]
    t.evolve_schema("url string, warc_ts timestamp, v string, extra long")
    assert "extra" in t.scan(spark).columns
    assert "extra" not in t.scan(spark, version=v_old).columns


def test_changes_between_across_evolution(spark, tmp_path):
    """CDF across an evolve_schema boundary: emitted in the NEWER
    schema, old-side values of added columns read as NULL."""
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "x")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    v_from = t.manifest["version"]
    t.evolve_schema("url string, warc_ts timestamp, v string, extra long")
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 2, "b", ts(2), "y", 7), ("U", 3, "a", ts(3), "x2", 1)],
            "op string, op_seq long, url string, warc_ts timestamp, v string, extra long",
        ),
    )
    feed = {
        r["url"]: r
        for r in t.changes_between(spark, v_from, t.manifest["version"]).collect()
    }
    assert feed["b"]["_change_op"] == "I" and feed["b"]["extra"] == 7
    assert feed["a"]["_change_op"] == "U" and feed["a"]["v"] == "x2"


def test_rename_of_key_or_order_cols_refused(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="key"):
        t.evolve_schema(
            "page string, warc_ts timestamp, v string", renames={"url": "page"}
        )


def test_rename_of_stats_col_refused(spark, tmp_path):
    t = LakeTable.create(
        str(tmp_path / "t"),
        "url string, warc_ts timestamp, n_tokens long",
        "url",
        num_buckets=2,
        props={"stats_cols": "n_tokens"},
    )
    with pytest.raises(ValueError, match="stats"):
        t.evolve_schema(
            "url string, warc_ts timestamp, token_count long",
            renames={"n_tokens": "token_count"},
        )


def test_evolve_stamps_schema_id_on_pre_upgrade_files(spark, tmp_path):
    """Files written before per-file schema ids existed must be stamped
    with their implicit id at the next evolve, or a later rename would
    skip their lift and silently null the column."""
    t = _mk(spark, tmp_path)
    t.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "keep")],
            "op string, op_seq long, url string, warc_ts timestamp, v string",
        ),
    )
    # simulate a pre-upgrade manifest: strip the recorded schema ids
    stripped = [
        {k: v for k, v in f.items() if k != "schema_id"}
        for f in t.manifest["files"]
    ]
    t.manifest = dict(t.manifest, files=stripped)
    t._commit(stripped, {"operation": "strip-ids-for-test"})
    t.evolve_schema(
        "url string, warc_ts timestamp, val string", renames={"v": "val"}
    )
    assert all("schema_id" in f for f in t.manifest["files"])
    got = {r["url"]: r["val"] for r in t.scan(spark).collect()}
    assert got == {"a": "keep"}
