"""Corpus-level segment dedup (CCNet/Dolma line-dedup analog) and
SemDeDup (cluster-then-dedup over embeddings)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tiger_etl_spark.operators import dedup, similarity


def test_segment_dedup_lines(spark):
    rows = [
        (1, "intro\ncookie banner\nbody one"),
        (2, "cookie banner\nbody two"),
        (3, "cookie banner\ncookie banner\nunique tail\n"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(df, "doc_id", "text").collect()
    }
    # NULL text excluded entirely
    assert set(out) == {1, 2, 3}
    assert out[1]["clean_text"] == "intro\nbody one"
    assert (out[1]["n_segments"], out[1]["n_dup_segments"]) == (3, 1)
    assert out[2]["clean_text"] == "body two"
    # duplicated line counted per occurrence; trailing empty line kept
    # (doc 3 is the only doc with a trailing ''), order preserved
    assert out[3]["clean_text"] == "unique tail\n"
    assert (out[3]["n_segments"], out[3]["n_dup_segments"]) == (4, 2)


def test_segment_dedup_all_dropped_is_null(spark):
    rows = [(1, "same"), (2, "same")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.segment_dedup(df, "doc_id", "text").collect()
    assert all(r["clean_text"] is None for r in out)
    assert all(r["n_dup_segments"] == 1 for r in out)


def test_word_chunk_segments(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], "doc_id long, text string"
    )
    segs = df.select(
        "doc_id",
        dedup.word_chunk_segments(F.col("text"), 2).alias("s"),
    ).collect()
    by_id = {r["doc_id"]: [(s["pos"], s["seg"]) for s in r["s"]] for r in segs}
    assert by_id[1] == [(0, "a b"), (1, "c d"), (2, "e")]
    # empty text still yields the single empty chunk (split -> [''])
    assert by_id[2] == [(0, "")]
    assert by_id[3] == [(0, "x")]


def _naive_pairs(rows, thr):
    import numpy as np

    out = set()
    for ia, (id_a, _, va) in enumerate(rows):
        for id_b, _, vb in rows[ia + 1 :]:
            a, b = np.array(va), np.array(vb)
            c = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            if c >= thr:
                out.add((min(id_a, id_b), max(id_a, id_b)))
    return out


def test_neardup_pairs_grouped_matches_naive_and_subblocks(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        cell = i % 3
        base = rng.normal(size=8)
        rows.append((i, cell, (base / np.linalg.norm(base)).tolist()))
    # plant near-dups inside cell 0
    rows.append((100, 0, rows[0][2]))
    rows.append((101, 0, (np.array(rows[0][2]) * 2.0).tolist()))
    df = spark.createDataFrame(rows, "vid long, cell int, vec array<double>")
    naive = {
        c: _naive_pairs([r for r in rows if r[1] == c], 0.8) for c in (0, 1, 2)
    }
    expected = set().union(*naive.values())
    # block_rows=4 forces multi-block triangles in every cell
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.neardup_pairs_grouped(
            df, "vid", "vec", 0.8, ["cell"], block_rows=4
        ).collect()
    }
    assert got == expected
    assert (0, 100) in got and (0, 101) in got  # planted pairs found


def test_semantic_dedup_drops_planted_duplicates(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = [rng.normal(size=16).tolist() for _ in range(30)]
    rows = [(i, v) for i, v in enumerate(vecs)]
    rows.append((900, vecs[5]))  # exact duplicate -> same cell, cos=1
    rows.append((901, (np.array(vecs[5]) * 3.0).tolist()))  # scaled dup
    rows.append((902, [0.0] * 16))  # zero vector: excluded, never dropped
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dropped = {
        r["vec_id"]
        for r in similarity.semantic_dedup_dropped(
            df, "vec_id", "embedding", threshold=0.99, n_cells=4, dim=16
        ).collect()
    }
    assert {900, 901} <= dropped
    assert 5 not in dropped  # the lowest id of the group survives
    assert 902 not in dropped
    kept = similarity.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.99, n_cells=4, dim=16
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == {r[0] for r in rows} - dropped


def test_semantic_dedup_respects_cell_boundaries(spark):
    # identical vectors but forced into different cells via cell_df:
    # cross-cell near-dups are NOT dropped (that's SemDeDup's contract)
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "_cell"])
    )
    dropped = similarity.semantic_dedup_dropped(
        df,
        "vec_id",
        "embedding",
        threshold=0.9,
        cell_df=df,
    ).collect()
    assert dropped == []


def test_duplicate_spans_planted(spark):
    from tiger_etl_spark.operators.dedup import duplicate_spans

    shared = "the quick brown fox jumps over the lazy dog again and again!"
    # boundary chars around the shared sentence differ between docs,
    # so the duplicated region is EXACTLY the shared sentence
    docs = [
        (1, "AAAA unique prefix one(%s)unique suffix one BBBB" % shared),
        (2, "CCCC another beginning[%s]different ending DDDD" % shared),
        (3, "totally unrelated text with no repeated windows at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = duplicate_spans(df, "doc_id", "text", k=20).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    for doc_id, text in [(1, docs[0][1]), (2, docs[1][1])]:
        got = by_doc[doc_id]
        assert len(got) == 1
        s = got[0]
        lo = text.index(shared) + 1  # 1-based
        hi = lo + len(shared) - 1
        # span covers the shared sentence exactly (fixed-k windows find
        # the full extent; edges can't extend past the shared region)
        assert s["span_start"] == lo and s["span_end"] == hi
        assert s["span_chars"] == len(shared)
