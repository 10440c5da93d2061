"""Incremental near-dup dedup at ingest: persisted signature index,
batch-vs-corpus decisions, keep-earliest within batch, CDC update/delete
maintenance, and replay of the decision logic against a brute-force
recomputation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.operators import dedup_ingest

UTC = dt.timezone.utc

LOREM = (
    "the quick brown fox jumps over the lazy dog while seventy shiny "
    "crawlers index every page of the open web nightly"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines"
)


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 3, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def batch(spark, rows):
    """rows: (op, op_seq, doc_id, t, text)"""
    return spark.createDataFrame(
        [(op, sq, d, ts(t), tx) for op, sq, d, t, tx in rows],
        "op string, op_seq long, doc_id long, ts timestamp, text string",
    )


@pytest.fixture()
def index(tmp_path):
    return dedup_ingest.create_signature_index(
        str(tmp_path / "sig_index"), num_buckets=4
    )


def near_variant(base: str, tag: str) -> str:
    """Same text with one appended word — high Jaccard, not exact."""
    return base + " " + tag


def test_batch_vs_corpus_and_within_batch(spark, index):
    b1 = batch(
        spark,
        [("I", 1, 1, 1, LOREM), ("I", 2, 2, 2, OTHER)],
    )
    kept1, st1 = dedup_ingest.apply_batch(
        spark, index, b1, "doc_id", "text", "ts", threshold=0.5
    )
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]
    assert st1.rows_dropped == 0 and st1.rows_indexed == 2

    # batch 2: 10 near-dups LOREM (vs corpus doc 1), 11+12 mutual
    # near-dups of fresh content (within-batch: 12 drops, 11 stays),
    # 13 unique
    fresh = "a wholly novel paragraph about synthetic benchmark corpora "
    fresh += "generated deterministically for oracle checked test suites"
    b2 = batch(
        spark,
        [
            ("I", 10, 10, 10, near_variant(LOREM, "extra")),
            ("I", 11, 11, 11, near_variant(fresh, "one")),
            ("I", 12, 12, 12, near_variant(fresh, "two")),
            ("I", 13, 13, 13, "short text"),
        ],
    )
    kept2, st2 = dedup_ingest.apply_batch(
        spark, index, b2, "doc_id", "text", "ts", threshold=0.5
    )
    kept_ids = sorted(r["doc_id"] for r in kept2.collect())
    assert kept_ids == [11, 13]
    assert st2.rows_dropped == 2
    # index grew only by survivors
    idx_ids = sorted(
        r["doc_id"] for r in index.scan(spark).select("doc_id").collect()
    )
    assert idx_ids == [1, 2, 11, 13]


def test_decisions_matched_id_prefers_corpus_then_lowest(spark, index):
    b1 = batch(spark, [("I", 1, 5, 1, LOREM)])
    dedup_ingest.apply_batch(spark, index, b1, "doc_id", "text", "ts", 0.5)
    sigs = dedup_ingest.signature_rows(
        batch(
            spark,
            [
                ("I", 10, 20, 10, near_variant(LOREM, "x")),
                ("I", 11, 21, 11, near_variant(LOREM, "y")),
            ],
        ),
        "doc_id",
        "text",
    )
    corpus = index.scan(spark).select("doc_id", "sig", "bands")
    dec = {
        r["doc_id"]: r
        for r in dedup_ingest.dedup_decisions(sigs, corpus, "doc_id", 0.5).collect()
    }
    # both match corpus doc 5 (rank 0) even though 20 < 21 within batch
    assert dec[20]["is_dup"] and dec[20]["matched_id"] == 5
    assert dec[21]["is_dup"] and dec[21]["matched_id"] == 5


def test_update_of_own_doc_is_not_a_duplicate(spark, index):
    dedup_ingest.apply_batch(
        spark, index, batch(spark, [("I", 1, 7, 1, LOREM)]),
        "doc_id", "text", "ts", 0.5,
    )
    # same doc id, near-identical new text: must NOT match itself
    upd = batch(spark, [("U", 2, 7, 2, near_variant(LOREM, "v2"))])
    kept, st = dedup_ingest.apply_batch(
        spark, index, upd, "doc_id", "text", "ts", 0.5
    )
    assert [r["doc_id"] for r in kept.collect()] == [7]
    assert st.rows_dropped == 0
    # index now carries the v2 signature (LWW on ts)
    row = index.scan(spark).where(F.col("doc_id") == 7).collect()[0]
    v2_sig = dedup_ingest.signature_rows(upd, "doc_id", "text").collect()[0]
    assert list(row["sig"]) == list(v2_sig["sig"])


def test_delete_passes_through_and_tombstones_index(spark, index):
    dedup_ingest.apply_batch(
        spark, index,
        batch(spark, [("I", 1, 1, 1, LOREM), ("I", 2, 2, 2, OTHER)]),
        "doc_id", "text", "ts", 0.5,
    )
    kept, _ = dedup_ingest.apply_batch(
        spark, index, batch(spark, [("D", 3, 1, 3, None)]),
        "doc_id", "text", "ts", 0.5,
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]  # the D row survives
    assert sorted(
        r["doc_id"] for r in index.scan(spark).select("doc_id").collect()
    ) == [2]
    # content equal to the deleted doc is ingestible again
    kept2, st2 = dedup_ingest.apply_batch(
        spark, index, batch(spark, [("I", 4, 30, 4, LOREM)]),
        "doc_id", "text", "ts", 0.5,
    )
    assert st2.rows_dropped == 0


def test_short_docs_never_match(spark, index):
    b = batch(
        spark,
        [("I", 1, 1, 1, "hi there"), ("I", 2, 2, 2, "hi there")],
    )
    kept, st = dedup_ingest.apply_batch(
        spark, index, b, "doc_id", "text", "ts", 0.5
    )
    # < 3 words -> no shingles -> no signature -> both kept
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]
    assert st.rows_dropped == 0


def test_incremental_equals_batch_recompute(spark, index):
    """Applying N micro-batches through the index gives the same final
    kept-set as one global keep-earliest pass over all events (brute
    force via dedup_decisions with an empty corpus)."""
    texts = {
        1: LOREM,
        2: OTHER,
        3: near_variant(LOREM, "alpha"),
        4: near_variant(OTHER, "beta"),
        5: "tiny",
        6: near_variant(LOREM, "gamma"),
    }
    all_rows = [("I", i, i, i, texts[i]) for i in sorted(texts)]
    kept_ids: list[int] = []
    for i in range(0, len(all_rows), 2):
        kept, _ = dedup_ingest.apply_batch(
            spark, index, batch(spark, all_rows[i : i + 2]),
            "doc_id", "text", "ts", 0.5,
        )
        kept_ids += [r["doc_id"] for r in kept.collect()]

    every = batch(spark, all_rows)
    sigs = dedup_ingest.signature_rows(every, "doc_id", "text")
    empty_corpus = sigs.where(F.lit(False))
    dec = dedup_ingest.dedup_decisions(sigs, empty_corpus, "doc_id", 0.5)
    brute = sorted(
        r["doc_id"] for r in dec.where(~F.col("is_dup")).collect()
    )
    assert sorted(kept_ids) == brute
