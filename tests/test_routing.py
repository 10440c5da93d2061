"""Multi-table CDC routing: fan-out correctness, cross-table atomicity,
strict-mode unrouted detection."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc import oracle
from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files
from tiger_etl_spark.cdc.pipeline import create_pages_table
from tiger_etl_spark.cdc.routing import route_changes
from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA
from tiger_etl_spark.lake.table import LakeTable


def _routed_events(spark, path):
    ev = spark.read.schema(EVENTS_READ_SCHEMA).parquet(path)
    # deterministic route: half the urls to 'a', half to 'b'
    return ev.withColumn(
        "dest", F.when(F.crc32(F.col("url")) % 2 == 0, "a").otherwise("b")
    )


@pytest.fixture()
def stream(tmp_path):
    cdir = str(tmp_path / "changes")
    ev = gen_change_events(seed=21, n=1500, n_hosts=40)
    write_change_files(ev, cdir, n_files=3)
    return cdir


def test_routed_final_state_matches_oracle_split(spark, tmp_path, stream):
    routes = {
        "a": create_pages_table(str(tmp_path / "ta"), num_buckets=4),
        "b": create_pages_table(str(tmp_path / "tb"), num_buckets=4),
    }
    txn_dir = str(tmp_path / "txn")
    for i, p in enumerate(sorted(glob.glob(os.path.join(stream, "*.parquet")))):
        recs = route_changes(
            spark, routes, _routed_events(spark, p), "dest", batch_id=i,
            txn_dir=txn_dir,
        )
        assert set(recs) == {"a", "b"}

    expected = oracle.replay_dir(stream)
    got_a = {r["url"]: r["text"] for r in routes["a"].scan(spark).collect()}
    got_b = {r["url"]: r["text"] for r in routes["b"].scan(spark).collect()}
    assert not (set(got_a) & set(got_b))  # disjoint routing
    assert set(got_a) | set(got_b) == set(expected)
    for url, e in expected.items():
        got = got_a.get(url, got_b.get(url))
        assert got == e["text"], url


def test_atomic_publish_across_tables(spark, tmp_path, stream):
    """Crash between merges must publish NEITHER table: abort leaves
    both pointers at the pre-batch snapshot."""
    routes = {
        "a": create_pages_table(str(tmp_path / "ta"), num_buckets=4),
        "b": create_pages_table(str(tmp_path / "tb"), num_buckets=4),
    }
    txn_dir = str(tmp_path / "txn")
    batches = sorted(glob.glob(os.path.join(stream, "*.parquet")))
    route_changes(
        spark, routes, _routed_events(spark, batches[0]), "dest", batch_id=0,
        txn_dir=txn_dir,
    )
    va = routes["a"].manifest["version"]
    vb = routes["b"].manifest["version"]

    # inject a failure on the second table's apply by poisoning its route
    broken = dict(routes)
    broken["b"] = None  # apply_changes will raise on attribute access
    with pytest.raises(Exception):
        route_changes(
            spark, broken, _routed_events(spark, batches[1]), "dest",
            batch_id=1, txn_dir=txn_dir,
        )
    # both PUBLISHED pointers unchanged — no partial batch visible
    assert LakeTable.load(routes["a"].path).manifest["version"] == va
    assert LakeTable.load(routes["b"].path).manifest["version"] == vb

    # replay of the same batch against fresh handles completes cleanly
    fresh = {
        "a": LakeTable.load(routes["a"].path),
        "b": LakeTable.load(routes["b"].path),
    }
    route_changes(
        spark, fresh, _routed_events(spark, batches[1]), "dest", batch_id=1,
        txn_dir=txn_dir,
    )
    assert LakeTable.load(routes["a"].path).manifest["version"] > va


def test_strict_mode_flags_unrouted(spark, tmp_path, stream):
    routes = {"a": create_pages_table(str(tmp_path / "ta"), num_buckets=4)}
    p = sorted(glob.glob(os.path.join(stream, "*.parquet")))[0]
    with pytest.raises(ValueError, match="unrouted"):
        route_changes(
            spark, routes, _routed_events(spark, p), "dest", batch_id=0,
            txn_dir=str(tmp_path / "txn"), strict=True,
        )


def test_strict_raises_on_null_route_key(spark, tmp_path, stream):
    p = sorted(glob.glob(os.path.join(stream, "*.parquet")))[0]
    ev = spark.read.schema(EVENTS_READ_SCHEMA).parquet(p).withColumn(
        "dest",
        F.when(F.crc32(F.col("url")) % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("a")),
    )
    routes = {"a": create_pages_table(str(tmp_path / "ta"), num_buckets=2)}
    with pytest.raises(ValueError, match="unrouted"):
        route_changes(
            spark,
            routes,
            ev,
            table_col="dest",
            batch_id=0,
            txn_dir=str(tmp_path / "txn"),
            strict=True,
        )
