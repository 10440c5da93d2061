"""Per-micro-batch Write-Audit-Publish gate on the streaming ingest
path: a poisoned batch must never become reader-visible — halt policy
stops the stream fail-closed; quarantine policy dead-letters the batch
and keeps going, with exactly-once semantics across restarts."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc import oracle
from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files
from tiger_etl_spark.cdc.pipeline import create_pages_table
from tiger_etl_spark.cdc.streaming import AuditRejected, run_stream
from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.lake.wap import AuditSpec

N_EVENTS = 900
N_FILES = 6
POISON_IDX = 4  # post-schema-evolution file (v2: has html/lang columns)


def _mk_changes(tmp_path, poison: bool):
    d = str(tmp_path / ("poisoned" if poison else "clean"))
    ev = gen_change_events(seed=21, n=N_EVENTS, n_hosts=20)
    write_change_files(ev, d, n_files=N_FILES)
    if poison:
        # an upstream length-accounting break: every content_len in one
        # batch file goes negative. Row validation (FIXTURES §6) does
        # not police content_len — only the table-state audit can.
        path = sorted(glob.glob(os.path.join(d, "*.parquet")))[POISON_IDX]
        st = os.stat(path)
        t = pq.read_table(path)
        i = t.schema.get_field_index("content_len")
        bad = pa.array([-1] * len(t), type=t.schema.field(i).type)
        pq.write_table(t.set_column(i, "content_len", bad), path)
        # the file stream source orders by modification time — keep the
        # rewritten file in its original delivery slot
        os.utime(path, (st.st_atime, st.st_mtime))
    return d


def _audit() -> AuditSpec:
    return AuditSpec().check_max_violation_frac(
        "len_nonneg", F.col("content_len") >= 0, 0.05
    )


def _final(spark, tp):
    return {
        r["url"]: r["content_len"]
        for r in LakeTable.load(tp).scan(spark).collect()
    }


def test_audit_halt_stops_before_publish(spark, tmp_path):
    """halt: the poisoned batch aborts the stream; everything published
    so far is exactly the clean prefix, and the poisoned rows are
    nowhere. A restart re-delivers the same batch (checkpoint did not
    advance) and halts again — fail-closed."""
    cdir = _mk_changes(tmp_path, poison=True)
    tp = str(tmp_path / "pages")
    create_pages_table(tp, num_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(Exception) as ei:
        run_stream(
            spark, cdir, tp, ckpt, max_files_per_trigger=1, audit=_audit()
        )
    assert "failed audit" in str(ei.value)
    state = _final(spark, tp)
    # clean prefix only: replay the first POISON_IDX files through the
    # single-threaded oracle
    prefix = str(tmp_path / "prefix")
    os.makedirs(prefix)
    for f in sorted(glob.glob(os.path.join(cdir, "*.parquet")))[:POISON_IDX]:
        shutil.copy(f, prefix)
    expected = oracle.replay_dir(prefix)
    assert set(state) == set(expected)
    assert all(v is None or v >= 0 for v in state.values())
    # restart: same halt, nothing new published
    with pytest.raises(Exception):
        run_stream(
            spark, cdir, tp, ckpt, max_files_per_trigger=1, audit=_audit()
        )
    assert _final(spark, tp) == state


def test_audit_quarantine_continues_and_deadletters(spark, tmp_path):
    """quarantine: the poisoned batch is dead-lettered (raw rows +
    reasons) and the stream drains to the end; final state equals the
    oracle replay of every file EXCEPT the poisoned one."""
    cdir = _mk_changes(tmp_path, poison=True)
    tp = str(tmp_path / "pages")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        cdir,
        tp,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        audit=_audit(),
        audit_policy="quarantine",
    )
    assert res.batches_rejected == 1
    assert res.batches_applied == N_FILES - 1
    (bad_id, failures) = res.audit_failures[0]
    assert any("len_nonneg" in f for f in failures)

    files = sorted(glob.glob(os.path.join(cdir, "*.parquet")))
    clean = str(tmp_path / "clean_only")
    os.makedirs(clean)
    for i, f in enumerate(files):
        if i != POISON_IDX:
            shutil.copy(f, clean)
    expected = oracle.replay_dir(clean)
    state = _final(spark, tp)
    assert set(state) == set(expected)
    assert all(v is None or v >= 0 for v in state.values())

    rdir = os.path.join(tp, "_audit_rejects", f"batch_id={bad_id}")
    rejected = spark.read.parquet(rdir)
    assert rejected.count() > 0
    assert rejected.where(F.col("content_len") >= 0).count() == 0
    with open(os.path.join(rdir, "_reasons.json")) as fh:
        reasons = json.load(fh)
    assert reasons["failures"] == failures


def test_audit_quarantine_exactly_once_on_restart(spark, tmp_path):
    """A rejected batch is in the applied ledger: wiping the checkpoint
    and re-draining the same directory must re-apply NOTHING (neither
    the clean batches nor the rejected one) and leave state unchanged."""
    cdir = _mk_changes(tmp_path, poison=True)
    tp = str(tmp_path / "pages")
    create_pages_table(tp, num_buckets=4)
    run_stream(
        spark,
        cdir,
        tp,
        str(tmp_path / "ckpt1"),
        max_files_per_trigger=1,
        audit=_audit(),
        audit_policy="quarantine",
    )
    before = _final(spark, tp)
    res2 = run_stream(
        spark,
        cdir,
        tp,
        str(tmp_path / "ckpt2"),  # fresh checkpoint = full redelivery
        max_files_per_trigger=1,
        audit=_audit(),
        audit_policy="quarantine",
    )
    assert res2.batches_applied == 0
    assert res2.batches_rejected == 0
    assert res2.batches_skipped == N_FILES
    assert _final(spark, tp) == before


def test_replay_audit_rejects_repairs_and_publishes(spark, tmp_path):
    """The repair loop: a dead-lettered batch, fixed (content_len
    recomputed from html) and re-merged under the SAME audit, brings the
    table to full parity with the never-poisoned change log; the reject
    dir and the rejected-prop entry are cleared. An unfixed replay must
    still fail the gate and keep the dir."""
    from tiger_etl_spark.cdc.pipeline import replay_audit_rejects

    cdir = _mk_changes(tmp_path, poison=True)
    tp = str(tmp_path / "pages")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        cdir,
        tp,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
        audit=_audit(),
        audit_policy="quarantine",
    )
    assert res.batches_rejected == 1
    bad_id = res.audit_failures[0][0]
    table = LakeTable.load(tp)
    rdir = os.path.join(tp, "_audit_rejects", f"batch_id={bad_id}")

    # replay WITHOUT a fixer: the same poison re-merges staged, fails
    # the same gate, aborts — dir intact, nothing published
    v = table.manifest["version"]
    out = replay_audit_rejects(spark, table, audit=_audit())
    assert out == {
        "batches": 1,
        "published": 0,
        "still_failing": 1,
        "rows_applied": 0,
        "rows_dropped_invalid": 0,
    }
    assert os.path.isdir(rdir)
    assert LakeTable.load(tp).manifest["version"] == v

    # replay WITH the repair: publishes, clears dir + prop, and the
    # final state now equals the oracle replay of the CLEAN log
    def fix(df):
        return df.withColumn(
            "content_len", F.length("html").cast("long")  # null html → null
        )

    out2 = replay_audit_rejects(spark, table, fixer=fix, audit=_audit())
    assert out2["published"] == 1 and out2["rows_applied"] > 0
    assert not os.path.isdir(rdir)
    assert str(bad_id) not in table.props.get("audit_rejected", {})
    clean = _mk_changes(tmp_path, poison=False)
    expected = oracle.replay_dir(clean)
    state = {
        r["url"]: (r["content_len"], r["text"])
        for r in LakeTable.load(tp).scan(spark).collect()
    }
    assert set(state) == set(expected)
    for url, e in expected.items():
        assert state[url] == (e["content_len"], e["text"]), url


def test_clean_stream_with_audit_matches_oracle(spark, tmp_path):
    """The gate must be a no-op on a healthy stream: full parity with
    the oracle replay, every batch published."""
    cdir = _mk_changes(tmp_path, poison=False)
    tp = str(tmp_path / "pages")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        cdir,
        tp,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        audit=_audit(),
        audit_policy="quarantine",
    )
    assert res.batches_rejected == 0
    expected = oracle.replay_dir(cdir)
    table = LakeTable.load(tp)
    rows = {r["url"]: r for r in table.scan(spark).collect()}
    assert set(rows) == set(expected)
    for url, e in expected.items():
        got = rows[url]["html"]
        assert (bytes(got) if got is not None else None) == e["html"]
        assert rows[url]["text"] == e["text"]
