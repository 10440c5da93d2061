"""CDF replica sync (cdc/replicate.py): incremental parity, delete
propagation, idempotent no-op, checksum-verified equivalence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.replicate import create_replica, sync_to
from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators import audit

DDL = "url string, warc_ts timestamp, text string"
UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def batch_df(spark, rows):
    return spark.createDataFrame(
        [(op, sq, u, ts(t), x) for op, sq, u, t, x in rows],
        "op string, op_seq long, url string, warc_ts timestamp, text string",
    )


@pytest.fixture()
def pair(spark, tmp_path):
    src = LakeTable.create(str(tmp_path / "src"), DDL, key_col="url", num_buckets=4)
    rep = create_replica(src, str(tmp_path / "rep"))
    return src, rep


def _state(spark, t):
    return sorted(
        (r["url"], r["warc_ts"], r["text"]) for r in t.scan(spark).collect()
    )


def _checksum(spark, t):
    return audit.table_checksum(
        t.scan(spark),
        [F.col("url"), F.col("warc_ts"), F.col("text")],
    ).collect()[0].asDict()


def test_incremental_sync_parity(spark, pair):
    src, rep = pair
    src.merge(
        spark, batch_df(spark, [("I", i, f"u{i}", i, f"a{i}") for i in range(10)])
    )
    r1 = sync_to(spark, src, rep)
    assert r1["synced"] and _state(spark, rep) == _state(spark, src)

    src.merge(
        spark,
        batch_df(
            spark,
            [("U", 20, "u1", 20, "a1b"), ("D", 21, "u2", 21, None),
             ("I", 22, "u10", 22, "a10")],
        ),
    )
    r2 = sync_to(spark, src, rep)
    assert r2["synced"] and r2["src_version_from"] == r1["src_version_to"]
    assert _state(spark, rep) == _state(spark, src)
    assert _checksum(spark, rep) == _checksum(spark, src)
    urls = {u for u, _, _ in _state(spark, rep)}
    assert "u2" not in urls and "u10" in urls


def test_sync_is_idempotent_noop_when_current(spark, pair):
    src, rep = pair
    src.merge(spark, batch_df(spark, [("I", 1, "k", 1, "x")]))
    assert sync_to(spark, src, rep)["synced"]
    v = rep.manifest["version"]
    out = sync_to(spark, src, rep)
    assert not out["synced"]
    assert rep.manifest["version"] == v  # no empty commit


def test_sync_spanning_multiple_source_commits(spark, pair):
    src, rep = pair
    for j in range(3):
        src.merge(
            spark,
            batch_df(
                spark,
                [("I", j * 10 + i, f"b{j}-{i}", j * 10 + i, f"v{j}{i}") for i in range(4)],
            ),
        )
    src.merge(spark, batch_df(spark, [("D", 99, "b0-0", 99, None)]))
    out = sync_to(spark, src, rep)
    assert out["synced"] and out["src_version_from"] == 0
    assert _state(spark, rep) == _state(spark, src)


def test_bucket_checksums_align(spark, pair):
    """Same bucketing on both sides → the audit drill-down compares
    bucket-by-bucket."""
    src, rep = pair
    src.merge(
        spark, batch_df(spark, [("I", i, f"c{i}", i, f"t{i}") for i in range(20)])
    )
    sync_to(spark, src, rep)
    cols = [F.col("url"), F.col("text")]
    a = {
        r["bucket"]: r["checksum"]
        for r in audit.bucket_checksums(src.scan(spark), "url", cols, n_buckets=8).collect()
    }
    b = {
        r["bucket"]: r["checksum"]
        for r in audit.bucket_checksums(rep.scan(spark), "url", cols, n_buckets=8).collect()
    }
    assert a == b


def test_replica_ahead_raises(spark, pair, tmp_path):
    src, rep = pair
    src.merge(spark, batch_df(spark, [("I", 1, "k", 1, "x")]))
    sync_to(spark, src, rep)
    fresh = LakeTable.create(
        str(tmp_path / "src2"), DDL, key_col="url", num_buckets=4
    )
    with pytest.raises(ValueError, match="ahead of source"):
        sync_to(spark, fresh, rep)


def test_partial_source_replicates_explicit_nulls(spark, tmp_path):
    """A partial-policy source resolves columns itself; the replica
    applies full-row states. An explicit NULL produced on the source
    (a D+I recreate without the column) must reach the replica as NULL,
    not be coalesced back to the old value."""
    ddl = "url string, warc_ts timestamp, a string, b string"
    src = LakeTable.create(
        str(tmp_path / "src"), ddl, key_col="url", num_buckets=2,
        merge_policy="partial",
    )
    rep = create_replica(src, str(tmp_path / "rep"))
    assert rep.merge_policy == "lww"

    def b(rows):
        return spark.createDataFrame(
            rows, "op string, op_seq long, url string, warc_ts timestamp, a string, b string"
        )

    src.merge(spark, b([("I", 1, "k", ts(1), "a1", "b1")]))
    sync_to(spark, src, rep)
    # recreate the key with column b absent → source state has b NULL
    src.merge(spark, b([("D", 2, "k", ts(2), None, None)]))
    src.merge(spark, b([("I", 3, "k", ts(3), "a2", None)]))
    sync_to(spark, src, rep)
    s = {r["url"]: (r["a"], r["b"]) for r in src.scan(spark).collect()}
    r = {r["url"]: (r["a"], r["b"]) for r in rep.scan(spark).collect()}
    assert s == r == {"k": ("a2", None)}


def test_full_resync_after_source_snapshot_expiry(spark, pair):
    """When snapshot retention outpaces the sync cadence, sync_to falls
    back to a state diff against the replica — including deletes."""
    src, rep = pair
    src.merge(
        spark, batch_df(spark, [("I", i, f"e{i}", i, f"v{i}") for i in range(8)])
    )
    sync_to(spark, src, rep)
    for j in range(6):  # many commits, incl. a delete
        src.merge(spark, batch_df(spark, [("U", 50 + j, f"e{j}", 50 + j, f"w{j}")]))
    src.merge(spark, batch_df(spark, [("D", 99, "e7", 99, None)]))
    src.expire_snapshots(keep_last=1)  # replica's v1 manifest is gone
    out = sync_to(spark, src, rep)
    assert out["synced"] and out["full_resync"]
    assert _state(spark, rep) == _state(spark, src)
    assert "e7" not in {u for u, *_ in _state(spark, rep)}
    # subsequent syncs are incremental again
    src.merge(spark, batch_df(spark, [("I", 120, "e9", 120, "v9")]))
    out2 = sync_to(spark, src, rep)
    assert out2["synced"] and not out2["full_resync"]
    assert _state(spark, rep) == _state(spark, src)


def test_sync_propagates_schema_evolution(spark, tmp_path):
    """Source adds and renames columns between syncs: the replica's
    schema registry mirrors the source's, added columns carry values
    (not silently dropped by the merge projection), and pre-rename
    replica files still lift their old values under the new name."""
    src = LakeTable.create(str(tmp_path / "src"), DDL, key_col="url", num_buckets=4)
    rep = create_replica(src, str(tmp_path / "rep"))
    src.merge(spark, batch_df(spark, [("I", 1, "a", 1, "alpha")]))
    sync_to(spark, src, rep)
    assert _state(spark, rep) == _state(spark, src)

    # rename text -> body, add a score column, then write through v2
    src.evolve_schema(
        "url string, warc_ts timestamp, body string, score long",
        renames={"text": "body"},
    )
    src.merge(
        spark,
        spark.createDataFrame(
            [("I", 2, "b", ts(2), "beta", 9)],
            "op string, op_seq long, url string, warc_ts timestamp, "
            "body string, score long",
        ),
    )
    res = sync_to(spark, src, rep)
    assert res["synced"]
    got = {r["url"]: (r["body"], r["score"]) for r in rep.scan(spark).collect()}
    # 'a' was written pre-rename on BOTH sides; its text lifts to body.
    # 'b' carries the new column's value through the CDF merge.
    assert got == {"a": ("alpha", None), "b": ("beta", 9)}
    # registries mirrored: one more evolution later still aligns
    assert rep.manifest["schemas"] == src.manifest["schemas"]
    chk_s = audit.table_checksum(
        src.scan(spark).select("url", "body", "score")
    ).collect()[0]
    chk_r = audit.table_checksum(
        rep.scan(spark).select("url", "body", "score")
    ).collect()[0]
    assert chk_s["checksum"] == chk_r["checksum"]


def test_create_replica_from_evolved_source_aligns_ids(spark, tmp_path):
    src = LakeTable.create(str(tmp_path / "src"), DDL, key_col="url", num_buckets=4)
    src.evolve_schema(
        "url string, warc_ts timestamp, body string", renames={"text": "body"}
    )
    rep = create_replica(src, str(tmp_path / "rep2"))
    assert rep.manifest["schemas"] == src.manifest["schemas"]
    assert (
        rep.manifest["current_schema_id"] == src.manifest["current_schema_id"]
    )


def test_mirror_refuses_source_registry_regression(spark, tmp_path):
    """A source rolled back past an evolution the replica already
    mirrored must fail the sync loudly — silently shrinking the
    replica's registry would orphan its files' schema-id stamps."""
    src = LakeTable.create(str(tmp_path / "src"), DDL, key_col="url", num_buckets=2)
    rep = create_replica(src, str(tmp_path / "rep"))
    v_pre = src.manifest["version"]
    src.evolve_schema(
        "url string, warc_ts timestamp, body string", renames={"text": "body"}
    )
    src.merge(
        spark,
        spark.createDataFrame(
            [("I", 1, "a", ts(1), "x")],
            "op string, op_seq long, url string, warc_ts timestamp, body string",
        ),
    )
    sync_to(spark, src, rep)  # replica now has files stamped schema id 3
    src.rollback(v_pre)
    src.merge(spark, batch_df(spark, [("I", 2, "b", 2, "y")]))
    with pytest.raises(RuntimeError, match="absent from the source registry"):
        sync_to(spark, src, rep)
