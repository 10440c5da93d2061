"""Maintenance policy (maintain) and partition evolution (rebucket)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.lake.pruning import bucket_of

DDL = "url string, warc_ts timestamp, text string"
UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 5, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def batch_df(spark, rows):
    return spark.createDataFrame(
        [(op, sq, u, ts(t), x) for op, sq, u, t, x in rows],
        "op string, op_seq long, url string, warc_ts timestamp, text string",
    )


def _state(spark, t):
    return sorted((r["url"], r["text"]) for r in t.scan(spark).collect())


def test_maintain_compacts_only_over_threshold(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    for j in range(3):
        t.merge(spark, batch_df(spark, [("I", j * 10 + i, f"k{i}", j * 10 + i, f"v{j}") for i in range(4)]))
    out1 = t.maintain(spark, max_delta_files_per_bucket=8)
    assert not out1["compacted"]  # healthy: only a manifest check
    assert all(f["kind"] == "delta" for f in t.manifest["files"])

    out2 = t.maintain(spark, max_delta_files_per_bucket=2)
    assert out2["compacted"]
    assert all(f["kind"] == "base" for f in t.manifest["files"])
    assert _state(spark, t) == [(f"k{i}", "v2") for i in range(4)]
    # idempotent: nothing left to do
    out3 = t.maintain(spark, max_delta_files_per_bucket=2)
    assert not out3["compacted"]


def test_maintain_expires_snapshots(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    for j in range(8):
        t.merge(spark, batch_df(spark, [("U", j, "k", j, f"v{j}")]))
    t.maintain(spark, max_delta_files_per_bucket=1, keep_snapshots=2)
    hist = t.history()
    assert len(hist) <= 2
    assert _state(spark, t) == [("k", "v7")]


def test_rebucket_preserves_state_and_layout(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    t.merge(
        spark,
        batch_df(spark, [("I", i, f"u{i}", i, f"v{i}") for i in range(20)]),
    )
    t.merge(spark, batch_df(spark, [("D", 30, "u3", 30, None)]))
    before = _state(spark, t)
    old_version = t.manifest["version"]

    t.rebucket(spark, 8)
    assert t.num_buckets == 8
    assert _state(spark, t) == before
    # files land in the NEW buckets
    for f in t.manifest["files"]:
        assert 0 <= f["bucket"] < 8
    # point lookup prunes on the new bucketing
    planned = t.plan_files(keys=["u7"])
    assert planned and all(
        f["bucket"] == bucket_of("u7", 8) for f in planned
    )
    # tombstone survived the rewrite: a LATE older event cannot resurrect
    t.merge(spark, batch_df(spark, [("U", 2, "u3", 2, "zombie")]))
    assert ("u3", "zombie") not in _state(spark, t)
    # time travel still resolves under the OLD bucket count
    old = t.at_version(old_version)
    assert old.num_buckets == 2
    assert sorted(
        (r["url"], r["text"]) for r in old.scan(spark).collect()
    ) == before
    # merges after rebucket use the new layout and resolve correctly
    t.merge(spark, batch_df(spark, [("U", 40, "u5", 40, "v5b")]))
    got = dict(_state(spark, t))
    assert got["u5"] == "v5b"


def test_rebucket_noop_same_count(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=4)
    t.merge(spark, batch_df(spark, [("I", 1, "a", 1, "x")]))
    v = t.manifest["version"]
    t.rebucket(spark, 4)
    assert t.manifest["version"] == v


def test_rebucket_fresh_load_sees_new_count(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakeTable.create(path, DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", i, f"x{i}", i, "v") for i in range(6)]))
    t.rebucket(spark, 4)
    t2 = LakeTable.load(path)
    assert t2.num_buckets == 4
    assert _state(spark, t2) == _state(spark, t)


def test_bloom_filter_opt_in(spark, tmp_path):
    """props bloom_filter=true writes parquet bloom filters on the key
    column (row-group skipping inside the files manifest pruning keeps).
    pyarrow 16 doesn't surface the bloom offset, so presence is checked
    by the deterministic size delta of an identical write."""
    rows = [("I", i, f"u{i}", i, f"v{i}") for i in range(50)]
    t = LakeTable.create(
        str(tmp_path / "t"),
        DDL,
        key_col="url",
        num_buckets=2,
        props={"bloom_filter": "true", "bloom_filter_ndv": "1000"},
    )
    t.merge(spark, batch_df(spark, rows))
    plain = LakeTable.create(
        str(tmp_path / "plain"), DDL, key_col="url", num_buckets=2
    )
    plain.merge(spark, batch_df(spark, rows))
    by_bucket = lambda tbl: {f["bucket"]: f["bytes"] for f in tbl.manifest["files"]}
    b, p = by_bucket(t), by_bucket(plain)
    assert set(b) == set(p)
    assert all(b[k] > p[k] for k in b), (b, p)  # bitmap adds bytes
    # lookups still correct through the bloom-bearing files
    assert t.lookup(spark, "u7").collect()[0]["text"] == "v7"
    assert t.lookup(spark, "nope").collect() == []


def test_concurrent_merge_retry(spark, tmp_path):
    """Two writer handles race: the stale handle's commit fails, its
    orphaned data files are cleaned up, and merge_with_retry replays
    the batch onto the newer snapshot — both batches' effects land."""
    from tiger_etl_spark.lake.table import merge_with_retry

    path = str(tmp_path / "t")
    t1 = LakeTable.create(path, DDL, key_col="url", num_buckets=2)
    t2 = LakeTable.load(path)
    t1.merge(spark, batch_df(spark, [("I", 1, "a", 1, "from-w1")]))

    b2 = batch_df(spark, [("I", 2, "b", 2, "from-w2")])
    import os as _os
    n_before = len(_os.listdir(_os.path.join(path, "data")))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t2.merge(spark, b2)  # stale handle loses the race
    # losing attempt left no orphan files behind
    assert len(_os.listdir(_os.path.join(path, "data"))) == n_before

    stats = merge_with_retry(spark, path, b2)
    assert stats.rows_upserted == 1
    final = _state(spark, LakeTable.load(path))
    assert final == [("a", "from-w1"), ("b", "from-w2")]


def test_rebucket_lost_race_cleans_up(spark, tmp_path):
    path = str(tmp_path / "t")
    t1 = LakeTable.create(path, DDL, key_col="url", num_buckets=2)
    t1.merge(spark, batch_df(spark, [("I", i, f"k{i}", i, "v") for i in range(6)]))
    t2 = LakeTable.load(path)
    t1.merge(spark, batch_df(spark, [("I", 10, "extra", 10, "v")]))
    import os as _os
    n_before = len(_os.listdir(_os.path.join(path, "data")))
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t2.rebucket(spark, 8)  # stale handle loses the race
    assert len(_os.listdir(_os.path.join(path, "data"))) == n_before
    # the handle is restored to the published bucketing, not half-moved
    assert t2.num_buckets == 2
    fresh = LakeTable.load(path)
    assert fresh.num_buckets == 2
    assert len(_state(spark, fresh)) == 7


def test_vacuum_removes_only_old_orphans(spark, tmp_path):
    import os as _os
    import time as _time

    path = str(tmp_path / "t")
    t = LakeTable.create(path, DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", i, f"k{i}", i, "v") for i in range(4)]))
    before = _state(spark, t)
    # crash debris: a stale stage dir + an unreferenced data file
    _os.makedirs(_os.path.join(path, "stage-deadbeef"))
    orphan = _os.path.join(path, "data", "b00000-orphan-0-delta.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    old = _time.time() - 7200
    _os.utime(_os.path.join(path, "stage-deadbeef"), (old, old))
    _os.utime(orphan, (old, old))
    # a FRESH orphan (in-flight write) must survive
    fresh = _os.path.join(path, "data", "b00001-inflight-0-delta.parquet")
    with open(fresh, "wb") as f:
        f.write(b"junk")

    out = t.vacuum(max_age_hours=1.0)
    assert out == {
        "stage_dirs_removed": 1,
        "orphan_files_removed": 1,
        "orphan_segments_removed": 0,
    }
    assert not _os.path.exists(orphan)
    assert _os.path.exists(fresh)
    assert _state(spark, t) == before  # committed data untouched


def test_maintain_verify_checksum_passes_and_rolls_back(spark, tmp_path):
    """maintain(verify=True): a healthy compaction is checksum-proven
    content-preserving; a corrupted rewrite (simulated by a compact that
    also drops a row) is detected and ROLLED BACK, with snapshot expiry
    suppressed so the forensic manifests survive."""
    t = LakeTable.create(str(tmp_path / "tv"), DDL, key_col="url", num_buckets=2)
    for j in range(3):
        t.merge(
            spark,
            batch_df(
                spark,
                [("I", j * 10 + i, f"k{i}", j * 10 + i, f"v{j}") for i in range(4)],
            ),
        )
    before = _state(spark, t)

    out = t.maintain(spark, max_delta_files_per_bucket=2, verify=True)
    assert out["compacted"] and out["compaction_verified"] is True
    assert _state(spark, t) == before
    # healthy pass reports no verification key when nothing compacted
    out2 = t.maintain(spark, max_delta_files_per_bucket=2, verify=True)
    assert not out2["compacted"] and "compaction_verified" not in out2

    # corrupt path: wrap compact to silently delete one key afterwards
    t2 = LakeTable.create(str(tmp_path / "tv2"), DDL, key_col="url", num_buckets=2)
    for j in range(3):
        t2.merge(
            spark,
            batch_df(
                spark,
                [("I", j * 10 + i, f"k{i}", j * 10 + i, f"v{j}") for i in range(4)],
            ),
        )
    before2 = _state(spark, t2)
    real_compact = t2.compact

    def corrupting_compact(*a, **kw):
        res = real_compact(*a, **kw)
        t2.delete_where(spark, F.col("url") == "k0", op_seq=10_000)
        return res

    t2.compact = corrupting_compact
    try:
        out3 = t2.maintain(spark, max_delta_files_per_bucket=2, verify=True)
    finally:
        del t2.compact
    assert out3["compaction_verified"] is False
    assert out3["snapshots_expired_files_removed"] == 0
    # rolled back: full content restored, k0 included
    assert _state(spark, t2) == before2
