"""Similarity operators: LSH near-dup recall in the production regime,
ANN probe pruning over persisted signatures."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from tiger_etl_spark.operators import similarity

DIM = 32


def _corpus(seed: int, n_background: int, n_dup_pairs: int):
    """Random unit-ish vectors plus planted near-dup pairs
    (cosine ≥ ~0.98: original + small noise)."""
    rng = random.Random(seed)

    def rand_vec():
        return [rng.gauss(0, 1) for _ in range(DIM)]

    rows, planted = [], []
    vid = 0
    for _ in range(n_background):
        rows.append((vid, rand_vec()))
        vid += 1
    for _ in range(n_dup_pairs):
        v = rand_vec()
        w = [x + rng.gauss(0, 0.02) for x in v]
        rows.append((vid, v))
        rows.append((vid + 1, w))
        planted.append((vid, vid + 1))
        vid += 2
    return rows, planted


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))


def test_lsh_neardup_high_recall_in_production_regime(spark):
    """Default banding (16×8) at threshold 0.9: finds (nearly) every
    planted near-dup; everything it reports really is ≥ 0.9 (exact
    verify); and random background pairs are pruned, not reported."""
    rows, planted = _corpus(seed=13, n_background=300, n_dup_pairs=25)
    by_id = dict(rows)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.neardup_pairs_lsh(
            df, "vec_id", "embedding", threshold=0.9, dim=DIM
        ).collect()
    }
    truly_planted = [p for p in planted if _cos(by_id[p[0]], by_id[p[1]]) >= 0.9]
    found = sum(1 for p in truly_planted if p in got)
    assert found / len(truly_planted) >= 0.95, (found, len(truly_planted))
    # exact verify: no false positives
    for (a, b), c in got.items():
        assert _cos(by_id[a], by_id[b]) >= 0.9 and abs(c - _cos(by_id[a], by_id[b])) < 1e-9


def test_lsh_neardup_matches_exact_on_found_pairs(spark):
    """Every pair the LSH path reports must also be in the exact
    operator's output with the same cosine (LSH ⊆ exact)."""
    rows, _ = _corpus(seed=29, n_background=150, n_dup_pairs=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r.id_a, r.id_b): round(r.cosine, 9)
        for r in similarity.neardup_pairs(
            df, "vec_id", "embedding", 0.9, n_blocks=3
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b): round(r.cosine, 9)
        for r in similarity.neardup_pairs_lsh(
            df, "vec_id", "embedding", 0.9, dim=DIM
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert exact[k] == v


def test_lsh_topk_with_persisted_signatures_matches_inline(spark):
    rows, _ = _corpus(seed=7, n_background=200, n_dup_pairs=5)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = [((i * 13) % 9 - 4) / 4.0 for i in range(DIM)]
    sig = similarity.build_lsh_signatures(df, "embedding", n_planes=8, dim=DIM)
    with_sig = similarity.lsh_topk(
        df, "vec_id", "embedding", query, 5, n_planes=8, max_hamming=2, sig_df=sig
    ).collect()
    inline = similarity.lsh_topk(
        df, "vec_id", "embedding", query, 5, n_planes=8, max_hamming=2
    ).collect()
    assert [(r.vec_id, round(r.cosine, 9)) for r in with_sig] == [
        (r.vec_id, round(r.cosine, 9)) for r in inline
    ]


def test_zero_norm_vectors_are_ignored(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [2.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.neardup_pairs(df, "vec_id", "embedding", 0.5, n_blocks=2).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 3)}
    got2 = similarity.neardup_pairs_lsh(
        df, "vec_id", "embedding", 0.5, dim=2, n_bands=4, rows_per_band=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in got2} <= {(1, 3)}


def test_lsh_bucket_cap_splits_hot_buckets_without_changing_pairs(spark):
    """Skew guard: a planted duplicate mass (40 copies of one page's
    embedding — every copy lands in ONE bucket per band) plus random
    background. With bucket_cap far below the mass, hot buckets split
    into triangle sub-blocks; the pair set and cosines must be
    IDENTICAL to the uncapped run, including every intra-mass pair
    (which now spans sub-block groups)."""
    rng = random.Random(99)
    rows = [(i, [rng.gauss(0, 1) for _ in range(DIM)]) for i in range(60)]
    mass = [rng.gauss(0, 1) for _ in range(DIM)]
    rows += [(100 + i, list(mass)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    kw = dict(threshold=0.9, dim=DIM, n_bands=8, rows_per_band=4)
    plain = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.neardup_pairs_lsh(
            df, "vec_id", "embedding", **kw
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.cosine
        for r in similarity.neardup_pairs_lsh(
            df, "vec_id", "embedding", bucket_cap=8, **kw
        ).collect()
    }
    assert set(capped) == set(plain)
    for k in plain:
        assert abs(capped[k] - plain[k]) < 1e-9
    # the duplicate mass itself must be fully present: 40×39/2 pairs
    mass_pairs = {k for k in capped if k[0] >= 100 and k[1] >= 100}
    assert len(mass_pairs) == 40 * 39 // 2
