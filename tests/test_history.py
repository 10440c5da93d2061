"""Incremental SCD2 history maintenance (cdc/history.py): fragments
appended per batch must stitch to EXACTLY the full-recompute history
(operators/scd.py: scd2_history). The default per-event mode must hold
for ANY split, including duplicate re-delivery and late data; fold mode
under its strict in-order contract."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.history import (
    apply_scd2_changes,
    audit_overlaps,
    create_history_table,
    read_history,
    rewrite_history,
)
from tiger_etl_spark.operators.scd import scd2_history

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)
EVENT_COLS = ["url", "warc_ts", "op_seq", "lang"]


def _gen_events(n_keys=12, n_events=240, seed=7):
    """Deterministic change log: per-event (key, ts, seq, lang) with
    runs of repeated attr values, some keys bursty, some sparse; equal
    timestamps across keys; strictly increasing seq (binlog order)."""
    rng = random.Random(seed)
    rows = []
    lang = {k: "en" for k in range(n_keys)}
    for seq in range(n_events):
        k = rng.choice(range(n_keys))
        if rng.random() < 0.3:
            lang[k] = rng.choice(["en", "de", "fr", None])
        # coarse ts: plenty of equal timestamps, seq breaks ties
        ts = T0 + dt.timedelta(minutes=seq // 3)
        rows.append((f"u{k}", ts, seq, lang[k]))
    return rows


def _full(spark, rows):
    df = spark.createDataFrame(rows, EVENT_COLS)
    return scd2_history(
        df,
        ["url"],
        ["lang"],
        "warc_ts",
        tiebreak_cols=["op_seq"],
        extra_aggs={"last_seen": F.max("warc_ts")},
    )


def _canon(df):
    return {
        (r.url, r.version_idx): (r.lang, r.valid_from, r.valid_to,
                                 r.is_current, r.n_rows, r.last_seen)
        for r in df.collect()
    }


def _apply_split(spark, hist, rows, cuts, fold=False):
    """Apply `rows` (already seq-ordered) split at the given seq cuts."""
    bounds = [0, *cuts, len(rows)]
    for i in range(len(bounds) - 1):
        batch = rows[bounds[i]:bounds[i + 1]]
        if not batch:
            continue
        apply_scd2_changes(
            spark,
            hist,
            spark.createDataFrame(batch, EVENT_COLS),
            batch_id=i,
            fold=fold,
        )


@pytest.mark.parametrize("fold", [False, True])
@pytest.mark.parametrize(
    "cuts",
    [
        [80, 160],       # even thirds
        [1, 2, 3, 237],  # pathological: tiny batches, huge tail
    ],
)
def test_incremental_matches_full_recompute(spark, tmp_path, cuts, fold):
    rows = _gen_events()
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=4
    )
    _apply_split(spark, hist, rows, cuts, fold=fold)
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows))
    assert audit_overlaps(spark, hist).count() == 0


def test_event_mode_survives_duplicates_and_late_data(spark, tmp_path):
    """The adversarial stream shape (cdc/datagen.py): a later batch
    re-delivers earlier events verbatim AND carries late events whose
    timestamps fall inside spans already appended. Default per-event
    fragments must still equal the full recompute over the DEDUPED log."""
    rows = _gen_events(n_keys=6, n_events=120)
    b1, b2 = rows[:60], rows[60:]
    b2_dirty = rows[40:60] + b2          # 20 duplicate re-deliveries
    late = [("u0", T0 + dt.timedelta(minutes=1, seconds=30), 900, "xx"),
            ("u1", T0 + dt.timedelta(seconds=10), 901, None)]
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=4
    )
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(b1, EVENT_COLS), batch_id=0
    )
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(b2_dirty + late, EVENT_COLS),
        batch_id=1,
    )
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows + late))
    # per-event fragments interleave exactly — nothing to flag
    assert audit_overlaps(spark, hist).count() == 0


def test_fold_equal_ts_batch_boundary(spark, tmp_path):
    """fold=True with a split INSIDE an equal-timestamp run: stitch
    order must fall back to the first event's unique seq."""
    rows = [
        ("u", T0, 0, "en"),
        ("u", T0, 1, "de"),  # batch boundary here, same ts
        ("u", T0, 2, "en"),
        ("u", T0, 3, "en"),
    ]
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows, [2], fold=True)
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows))


def test_replay_is_noop_and_survives_reload(spark, tmp_path):
    from tiger_etl_spark.lake import LakeTable

    rows = _gen_events(n_keys=5, n_events=60)
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows, [30])
    before = _canon(read_history(spark, hist))
    # replay both batches (restart-between-commits shape)
    r0 = apply_scd2_changes(
        spark, hist, spark.createDataFrame(rows[:30], EVENT_COLS), batch_id=0
    )
    r1 = apply_scd2_changes(
        spark, hist, spark.createDataFrame(rows[30:], EVENT_COLS), batch_id=1
    )
    assert not r0["applied"] and not r1["applied"]
    assert _canon(read_history(spark, hist)) == before
    # a fresh handle sees the same committed history
    fresh = LakeTable.load(str(tmp_path / "h"))
    assert _canon(read_history(spark, fresh)) == before


def test_fold_mode_bounds_fragment_rows(spark, tmp_path):
    """fold=True: bookkeeping-only batches append ONE fragment each;
    they stitch back to a single current version with summed n_rows."""
    rows = [("u", T0 + dt.timedelta(minutes=i), i, "en") for i in range(9)]
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows, [3, 6], fold=True)
    out = read_history(spark, hist).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.version_idx, r.n_rows, r.is_current) == (0, 9, True)
    assert r.valid_from == T0 and r.last_seen == T0 + dt.timedelta(minutes=8)
    # storage really is 3 fragments (MOR: nothing read/rewritten at apply)
    assert hist.scan(spark).count() == 3


def test_rewrite_folds_fragments_and_preserves_history(spark, tmp_path):
    """Row-level compaction: fragment count drops to version count,
    read_history is bit-invariant, the ledger survives (old batches
    stay no-ops), and NEW batches stitch correctly on top."""
    rows = _gen_events(n_keys=8, n_events=180)
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=4
    )
    _apply_split(spark, hist, rows[:150], [50, 100])
    before = _canon(read_history(spark, hist))
    n_frags = hist.scan(spark).count()
    assert n_frags == 150  # per-event mode: one fragment per event
    stats = rewrite_history(spark, hist, str(tmp_path / "txn"))
    assert stats["fragments"] == len(before) < n_frags
    assert hist.scan(spark).count() == len(before)
    assert _canon(read_history(spark, hist)) == before
    # replayed old batch: still a ledger no-op after the rewrite
    r = apply_scd2_changes(
        spark, hist, spark.createDataFrame(rows[:50], EVENT_COLS), batch_id=0
    )
    assert not r["applied"]
    assert _canon(read_history(spark, hist)) == before
    # new tail batch on top of canonical fragments == full recompute
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(rows[150:], EVENT_COLS), batch_id=3
    )
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows))
    assert audit_overlaps(spark, hist).count() == 0


def test_rewrite_with_watermark_keeps_late_window_raw(spark, tmp_path):
    """Watermarked rewrite folds only settled fragments; a late event
    INSIDE the unfolded window still interleaves exactly afterwards."""
    rows = _gen_events(n_keys=4, n_events=80)
    wm = T0 + dt.timedelta(minutes=20)
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows, [40])
    rewrite_history(spark, hist, str(tmp_path / "txn"), watermark=wm)
    # raw single-event fragments survive at/after the watermark
    kept_raw = hist.scan(spark).where(
        (F.col("n_rows") == 1) & (F.col("last_seen") >= wm)
    )
    assert kept_raw.count() > 0
    late = [("u0", wm + dt.timedelta(seconds=7), 500, "zz")]
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(late, EVENT_COLS), batch_id=2
    )
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows + late))
    assert audit_overlaps(spark, hist).count() == 0


def test_rewrite_equal_ts_tail_boundary(spark, tmp_path):
    """A post-rewrite batch starting at the canonical open fragment's
    exact last_seen timestamp must stitch AFTER it (the canonical
    fragment keeps its first event's seq as the tiebreak)."""
    rows = [
        ("u", T0, 0, "en"),
        ("u", T0, 1, "en"),
        ("u", T0, 2, "de"),  # post-rewrite batch, same ts
        ("u", T0, 3, "en"),
    ]
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows[:2], [])
    rewrite_history(spark, hist, str(tmp_path / "txn"))
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(rows[2:], EVENT_COLS), batch_id=1
    )
    assert _canon(read_history(spark, hist)) == _canon(_full(spark, rows))


def test_fold_out_of_order_batch_flagged_by_audit(spark, tmp_path):
    """A late event landing INSIDE an already-FOLDED span is the one
    case stitching cannot repair — audit_overlaps must flag it (and
    only it: the same arrival under per-event mode is exact, see
    test_event_mode_survives_duplicates_and_late_data)."""
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    span = [("u", T0, 0, "en"), ("u", T0 + dt.timedelta(minutes=9), 1, "en")]
    inside = [("u", T0 + dt.timedelta(minutes=4), 2, "de")]
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(span, EVENT_COLS), 0, fold=True
    )
    apply_scd2_changes(
        spark, hist, spark.createDataFrame(inside, EVENT_COLS), 1, fold=True
    )
    flagged = audit_overlaps(spark, hist).collect()
    assert [(r.url, r.n_overlaps) for r in flagged] == [("u", 1)]


def test_null_attr_and_null_key_handling(spark, tmp_path):
    rows = [
        (None, T0, 0, "en"),                          # null key dropped
        ("u", T0, 1, None),                           # null attr is a value
        ("u", T0 + dt.timedelta(minutes=1), 2, None),
        ("u", T0 + dt.timedelta(minutes=2), 3, "en"),
    ]
    hist = create_history_table(
        str(tmp_path / "h"), "url string", "lang string", num_buckets=2
    )
    _apply_split(spark, hist, rows, [2])
    out = sorted(read_history(spark, hist).collect(),
                 key=lambda r: r.version_idx)
    assert [(r.url, r.version_idx, r.lang, r.n_rows) for r in out] == [
        ("u", 0, None, 2), ("u", 1, "en", 1),
    ]
