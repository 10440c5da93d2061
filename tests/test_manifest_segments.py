"""Sharded manifest (Iceberg manifest-list analog, lake/table.py):
commit cost must be O(files touched), not O(all files) — the round-2
100×-scale risk was the monolithic inline file list re-serialized on the
driver at every micro-batch commit (~400k entries at 100 TB)."""

from __future__ import annotations

import datetime as dt
import json
import os
import time

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.lake.table import _SEG_LIMIT

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


def _fake_entry(i: int, bucket: int) -> dict:
    return {
        "path": f"data/b{bucket:05d}-fake-{i}-base.parquet",
        "bucket": bucket,
        "kind": "base",
        "rows": 100,
        "bytes": 4096,
        "min": {}, "max": {},
    }


def test_commit_reuses_untouched_segments(spark, tmp_path):
    """A merge touching one bucket must carry every segment whose
    buckets it didn't touch BY REFERENCE (same seg path, no rewrite)."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=4)
    # several commits so multiple segments exist
    for j in range(4):
        t.merge(
            spark,
            batch_df(
                spark, [("I", j * 10 + i, f"k{i}", j * 10 + i, f"v{j}") for i in range(8)]
            ),
        )
    before = {s["path"] for s in t.manifest["manifest_list"]}
    assert before, "expected segments after merges"
    # MOR merge adds files, removes none -> every old segment carried
    t.merge(spark, batch_df(spark, [("I", 100, "k0", 100, "new")]))
    after = {s["path"] for s in t.manifest["manifest_list"]}
    assert before <= after, "MOR commit must reuse all prior segments"
    assert len(after - before) == 1  # exactly one new segment


def test_commit_cost_is_o_delta_not_o_table(tmp_path):
    """On a synthetic 100k-file table, a +1-file commit writes one tiny
    segment and a small v{N}.json — it must NOT re-serialize the table's
    whole file list (the round-2 O(n) failure mode)."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=64)
    big = [_fake_entry(i, i % 64) for i in range(100_000)]
    t._commit(big, {"operation": "seed"})
    seed_list = {s["path"] for s in t.manifest["manifest_list"]}

    sizes, times = [], []
    for k in range(5):
        extra = _fake_entry(200_000 + k, k % 64)
        t0 = time.time()
        t._commit(t.manifest["files"] + [extra], {"operation": f"add{k}"})
        times.append(time.time() - t0)
        mpath = os.path.join(t.path, "meta", f"v{t.manifest['version']}.json")
        sizes.append(os.path.getsize(mpath))
        new_segs = {s["path"] for s in t.manifest["manifest_list"]} - seed_list
        # each +1 commit adds exactly one segment holding ONE entry
        one = [s for s in t.manifest["manifest_list"] if s["path"] in new_segs]
        assert any(s["n_files"] == 1 for s in one)
    # the snapshot manifest stays small: no inline 100k-entry list
    # (inline serialization of 100k entries is ~15 MB)
    assert max(sizes) < 64 * 1024, f"v.json too big: {sizes}"
    # all seed segments carried by reference
    assert seed_list <= {s["path"] for s in t.manifest["manifest_list"]}

    # reload hydrates the full list from segments
    t2 = LakeTable.load(t.path)
    assert len(t2.manifest["files"]) == 100_005


def test_segment_merge_bounds_manifest_list(tmp_path):
    """manifest_list length stays bounded (LSM-style merge of the
    smallest segments once past _SEG_LIMIT)."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=4)
    for k in range(_SEG_LIMIT + 20):
        extra = _fake_entry(k, k % 4)
        t._commit(t.manifest["files"] + [extra], {"operation": f"a{k}"})
    assert len(t.manifest["manifest_list"]) <= _SEG_LIMIT
    assert len(t.manifest["files"]) == _SEG_LIMIT + 20
    t2 = LakeTable.load(t.path)
    assert len(t2.manifest["files"]) == _SEG_LIMIT + 20


def test_legacy_inline_manifest_migrates(spark, tmp_path):
    """A format-v2 manifest (inline "files", no manifest_list) loads,
    scans, and is migrated to segments on its first commit."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", i, f"k{i}", i, "v") for i in range(4)]))
    state = _state(spark, t)
    # rewrite the current manifest as legacy v2: inline files
    v = t.manifest["version"]
    mpath = os.path.join(t.path, "meta", f"v{v}.json")
    legacy = {k: v2 for k, v2 in t.manifest.items() if k != "manifest_list"}
    legacy["format_version"] = 2
    with open(mpath, "w") as f:
        json.dump(legacy, f)

    t2 = LakeTable.load(t.path)
    assert t2.manifest.get("manifest_list") is None
    assert _state(spark, t2) == state
    t2.merge(spark, batch_df(spark, [("I", 50, "k9", 50, "new")]))
    assert t2.manifest["format_version"] == 3
    assert t2.manifest["manifest_list"], "first commit must build segments"
    assert _state(spark, LakeTable.load(t.path)) == sorted(state + [("k9", "new")])


def test_expire_snapshots_gcs_segments(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    for j in range(6):
        t.merge(spark, batch_df(spark, [("I", j * 10 + i, f"k{i}", j * 10 + i, f"v{j}") for i in range(3)]))
    t.compact(spark)  # drops old bucket files from the live snapshot
    state = _state(spark, t)
    meta = os.path.join(t.path, "meta")
    n_segs_before = sum(1 for f in os.listdir(meta) if f.startswith("seg-"))
    t.expire_snapshots(keep_last=1)
    n_segs_after = sum(1 for f in os.listdir(meta) if f.startswith("seg-"))
    assert n_segs_after < n_segs_before, "expired-only segments must be GC'd"
    # live snapshot unharmed, fresh handle agrees
    assert _state(spark, LakeTable.load(t.path)) == state


def test_vacuum_removes_orphan_segments(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", i, f"k{i}", i, "v") for i in range(3)]))
    state = _state(spark, t)
    orphan = os.path.join(t.path, "meta", "seg-deadbeef.json")
    with open(orphan, "w") as f:
        json.dump([_fake_entry(0, 0)], f)
    old = time.time() - 7200
    os.utime(orphan, (old, old))
    fresh = os.path.join(t.path, "meta", "seg-feedface.json")
    with open(fresh, "w") as f:
        json.dump([_fake_entry(1, 1)], f)
    out = t.vacuum(max_age_hours=1.0)
    assert out["orphan_segments_removed"] == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(fresh)  # age-guarded: in-flight commit safe
    assert _state(spark, LakeTable.load(t.path)) == state


def test_time_travel_across_segment_rewrites(spark, tmp_path):
    """at_version re-hydrates from the OLD manifest's segments even after
    later commits rewrote/replaced them."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", 1, "a", 1, "v1")]))
    v1 = t.manifest["version"]
    t.merge(spark, batch_df(spark, [("U", 2, "a", 2, "v2")]))
    t.compact(spark)
    assert _state(spark, t) == [("a", "v2")]
    old = t.at_version(v1)
    assert _state(spark, old) == [("a", "v1")]


def test_evolve_schema_stamp_survives_reload(spark, tmp_path):
    """Regression (round-3 review): evolve_schema stamps the implicit
    schema_id onto legacy (unstamped) file entries; under the sharded
    manifest the stamped entries must land in REWRITTEN segments —
    pre-assigning them to self.manifest made the commit diff see 'no
    change' and carry the old unstamped segments, so after a reload a
    rename would silently null the column."""
    t = LakeTable.create(str(tmp_path / "t"), DDL, key_col="url", num_buckets=2)
    t.merge(spark, batch_df(spark, [("I", 1, "a", 1, "v1")]))
    # simulate legacy entries: strip schema_id stamps in the stored
    # segment (pre-per-file-id era) by rewriting manifest + segment
    legacy_files = [
        {k: v for k, v in f.items() if k != "schema_id"}
        for f in t.manifest["files"]
    ]
    t._commit(legacy_files, {"operation": "strip-for-test"})
    assert all("schema_id" not in f for f in LakeTable.load(t.path).manifest["files"])

    t2 = LakeTable.load(t.path)
    t2.evolve_schema(
        "url string, warc_ts timestamp, body_text string",
        renames={"text": "body_text"},
    )
    # the stamp must be ON DISK, not just in memory
    t3 = LakeTable.load(t.path)
    assert all("schema_id" in f for f in t3.manifest["files"])
    rows = t3.scan(spark).collect()
    assert [(r["url"], r["body_text"]) for r in rows] == [("a", "v1")]
