"""Spherical k-means: planted-cluster recovery, determinism under
repartitioning, and learned-centroid IVF beating the random quantizer."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.operators import similarity
from tiger_etl_spark.operators.clustering import assign_clusters, kmeans_fit

DIM = 16
N_PER = 30


def _unit(v):
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _planted(seed=42):
    """3 well-separated unit centers; N_PER jittered points each."""
    rng = random.Random(seed)
    centers = []
    for c in range(3):
        centers.append(_unit([rng.gauss(0, 1) for _ in range(DIM)]))
    rows = []
    for ci, c in enumerate(centers):
        for i in range(N_PER):
            p = [x + rng.gauss(0, 0.08) for x in c]
            rows.append((ci * N_PER + i, ci, _unit(p)))
    return centers, rows


@pytest.fixture(scope="module")
def planted(spark):
    centers, rows = _planted()
    df = spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<double>"
    ).persist()
    df.count()
    return centers, df


def test_kmeans_recovers_planted_clusters(planted):
    _, df = planted
    cents = kmeans_fit(df, "embedding", k=3, dim=DIM, max_iter=10)
    assert len(cents) == 3
    for c in cents:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
    got = assign_clusters(df, "embedding", cents).select(
        "true_cluster", "_cell"
    ).collect()
    # perfect purity: each planted cluster maps to exactly one cell
    mapping = {}
    for r in got:
        mapping.setdefault(r["true_cluster"], set()).add(r["_cell"])
    assert all(len(cells) == 1 for cells in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3


def test_kmeans_deterministic_under_repartition(planted):
    _, df = planted
    a = kmeans_fit(df, "embedding", k=3, dim=DIM, max_iter=5)
    b = kmeans_fit(df.repartition(7), "embedding", k=3, dim=DIM, max_iter=5)
    flat = lambda cs: [x for c in cs for x in c]  # noqa: E731
    assert max(abs(x - y) for x, y in zip(flat(a), flat(b))) < 1e-12


def test_learned_ivf_beats_random_quantizer(planted):
    centers, df = planted
    # query near planted center 0 — its true top-10 are in-cluster
    query = _unit([x + 0.01 for x in centers[0]])
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(df, "vec_id", "embedding", query, 10).collect()
    }
    learned = kmeans_fit(df, "embedding", k=3, dim=DIM, max_iter=10)
    cells = similarity.build_ivf_cells(
        df, "embedding", 3, DIM, centroids=learned
    ).persist()
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            df, "vec_id", "embedding", query, 10,
            n_cells=3, nprobe=1, cell_df=cells, centroids=learned,
        ).collect()
    }
    # probing ONE learned cell recovers the full exact top-10
    assert got == exact
    # and it scanned only ~a third of the corpus
    probe = similarity.ivf_probe_cells(query, 3, 1, centroids=learned)
    scanned = cells.where(F.col("_cell").isin(probe)).count()
    assert scanned <= 2 * N_PER
    cells.unpersist()


def test_kmeans_sampled_recovers_planted_clusters(planted):
    """Bounded-sample training (FAISS regime): with the sample covering
    the corpus, quality matches full training; under repartitioning the
    hash-ordered sample — hence the centroids — is identical."""
    _, df = planted
    cents = kmeans_fit(
        df, "embedding", k=3, dim=DIM, max_iter=10, sample_per_centroid=30
    )
    for c in cents:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-9
    got = assign_clusters(df, "embedding", cents).select(
        "true_cluster", "_cell"
    ).collect()
    mapping = {}
    for r in got:
        mapping.setdefault(r["true_cluster"], set()).add(r["_cell"])
    assert all(len(cells) == 1 for cells in mapping.values())
    assert len({next(iter(c)) for c in mapping.values()}) == 3

    b = kmeans_fit(
        df.repartition(7), "embedding", k=3, dim=DIM,
        max_iter=10, sample_per_centroid=30,
    )
    flat = lambda cs: [x for c in cs for x in c]  # noqa: E731
    assert max(abs(x - y) for x, y in zip(flat(cents), flat(b))) < 1e-12
