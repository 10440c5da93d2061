"""ANN index maintenance at ingest: embeddings live in a LakeTable with
their IVF cell assignment computed at write time; probes filter on the
stored cell column (no vector arithmetic on the scan side) and stay
correct across CDC merges (update + insert)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators import similarity

DIM = 8
N_CELLS = 4
UTC = dt.timezone.utc

QUERY = [((i * 29) % 13 - 6) / 6.0 for i in range(DIM)]


def vec(seed: int) -> list[float]:
    return [((seed * 31 + d * 7) % 19 - 9) / 9.0 for d in range(DIM)]


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def embed_batch(spark, rows):
    """rows: (op, op_seq, vec_id, t, seed|None)"""
    df = spark.createDataFrame(
        [
            (op, sq, v, ts(t), vec(sd) if sd is not None else None)
            for op, sq, v, t, sd in rows
        ],
        "op string, op_seq long, vec_id long, ts timestamp, embedding array<double>",
    )
    # the ingest-time quantizer: cell computed once at write, stored
    cells = similarity.ivf_centroids(N_CELLS, DIM)
    return df.withColumn(
        "cell",
        F.when(
            F.col("embedding").isNotNull(),
            similarity.ivf_cell_col(F.col("embedding"), cells),
        ),
    )


@pytest.fixture()
def table(tmp_path):
    return LakeTable.create(
        str(tmp_path / "emb"),
        "vec_id long, ts timestamp, embedding array<double>, cell int",
        key_col="vec_id",
        order_cols=("ts",),
        num_buckets=4,
    )


def probe_topk(spark, table, k=5):
    probe = similarity.ivf_probe_cells(QUERY, N_CELLS, N_CELLS)  # full probe
    snap = table.scan(spark).where(F.col("cell").isin(probe))
    return similarity.cosine_topk(snap, "vec_id", "embedding", QUERY, k)


def brute_topk(spark, table, k=5):
    return similarity.cosine_topk(
        table.scan(spark), "vec_id", "embedding", QUERY, k
    )


def test_stored_cells_survive_merges_and_probe_stays_exact(spark, table):
    table.merge(
        spark,
        embed_batch(spark, [("I", i, i, i, i) for i in range(1, 31)]),
    )
    got1 = [r["vec_id"] for r in probe_topk(spark, table).collect()]
    want1 = [r["vec_id"] for r in brute_topk(spark, table).collect()]
    assert got1 == want1

    # CDC: update 5 vectors (new embeddings → possibly new cells),
    # insert 5, delete 2 — stored cells must track the new state
    upd = [("U", 100 + i, i, 100 + i, 1000 + i) for i in range(1, 6)]
    ins = [("I", 200 + i, 30 + i, 200 + i, 2000 + i) for i in range(1, 6)]
    dels = [("D", 300, 10, 300, None), ("D", 301, 11, 301, None)]
    table.merge(spark, embed_batch(spark, upd + ins + dels))

    snap = table.scan(spark)
    assert snap.count() == 33  # 30 + 5 - 2
    # every stored cell equals a fresh assignment of the stored vector
    cells = similarity.ivf_centroids(N_CELLS, DIM)
    mismatch = snap.where(
        F.col("cell") != similarity.ivf_cell_col(F.col("embedding"), cells)
    ).count()
    assert mismatch == 0

    got2 = [r["vec_id"] for r in probe_topk(spark, table).collect()]
    want2 = [r["vec_id"] for r in brute_topk(spark, table).collect()]
    assert got2 == want2
    # deleted keys never surface
    assert 10 not in got2 and 11 not in got2


def test_partial_probe_scans_fraction(spark, table):
    table.merge(
        spark,
        embed_batch(spark, [("I", i, i, i, i * 3) for i in range(1, 41)]),
    )
    snap = table.scan(spark).persist()
    per_cell = dict(
        (r["cell"], r["count"]) for r in snap.groupBy("cell").count().collect()
    )
    total = sum(per_cell.values())
    # pruning contract: the probe filter reads exactly the probed cells'
    # rows — nothing more (for every nprobe level)
    for nprobe in range(1, N_CELLS + 1):
        probe = similarity.ivf_probe_cells(QUERY, N_CELLS, nprobe)
        scanned = snap.where(F.col("cell").isin(probe)).count()
        assert scanned == sum(per_cell.get(c, 0) for c in probe)
    # and with data spread over >1 cell, some partial probe is a strict
    # subset of the corpus
    assert len(per_cell) > 1
    probe1 = similarity.ivf_probe_cells(QUERY, N_CELLS, 1)
    assert snap.where(F.col("cell").isin(probe1)).count() < total
    snap.unpersist()


def test_learned_centroids_are_the_ingest_default(spark, table):
    """clustering.ingest_ivf_cells: first batch fits + persists learned
    centroids in table props; later batches (including a restart's fresh
    handle) reuse the SAME matrix, so stored cells stay comparable and
    the probe stays exact across CDC merges."""
    import json

    from tiger_etl_spark.lake import LakeTable
    from tiger_etl_spark.operators.clustering import (
        _CENTROID_PROP,
        ingest_ivf_cells,
    )

    def raw_batch(rows):
        return spark.createDataFrame(
            [
                (op, sq, v, ts(t), vec(sd) if sd is not None else None)
                for op, sq, v, t, sd in rows
            ],
            "op string, op_seq long, vec_id long, ts timestamp, "
            "embedding array<double>",
        )

    b1 = ingest_ivf_cells(
        table, raw_batch([("I", i, i, i, i) for i in range(1, 31)]),
        "embedding", N_CELLS, DIM,
    )
    table.merge(spark, b1)
    cents = json.loads(table.props[_CENTROID_PROP])
    assert len(cents) == N_CELLS and len(cents[0]) == DIM

    # restart: a fresh handle must load, not re-fit (same matrix)
    t2 = LakeTable.load(table.path)
    b2 = ingest_ivf_cells(
        t2,
        raw_batch(
            [("U", 100 + i, i, 100 + i, 1000 + i) for i in range(1, 6)]
            + [("I", 200 + i, 30 + i, 200 + i, 2000 + i) for i in range(1, 6)]
            + [("D", 300, 10, 300, None)]
        ),
        "embedding", N_CELLS, DIM,
    )
    t2.merge(spark, b2)
    assert json.loads(t2.props[_CENTROID_PROP]) == cents

    # every stored cell equals a fresh assignment under the PERSISTED
    # learned centroids
    snap = t2.scan(spark)
    assert snap.count() == 34  # 30 + 5 - 1
    mismatch = snap.where(
        F.col("cell") != similarity.ivf_cell_col(F.col("embedding"), cents)
    ).count()
    assert mismatch == 0

    # learned-cell probe (full) == brute force, and the learned
    # quantizer's top-1-probe recall is >= the deterministic one's
    k = 5
    exact = [
        r["vec_id"]
        for r in similarity.cosine_topk(snap, "vec_id", "embedding", QUERY, k).collect()
    ]
    probe_all = similarity.ivf_probe_cells(QUERY, N_CELLS, N_CELLS, centroids=cents)
    got = [
        r["vec_id"]
        for r in similarity.cosine_topk(
            snap.where(F.col("cell").isin(probe_all)),
            "vec_id", "embedding", QUERY, k,
        ).collect()
    ]
    assert got == exact

    def recall_1probe(centroids):
        probe = similarity.ivf_probe_cells(QUERY, N_CELLS, 1, centroids=centroids)
        cells_df = snap.withColumn(
            "_c", similarity.ivf_cell_col(F.col("embedding"), centroids)
        ).where(F.col("_c").isin(probe))
        got1 = {
            r["vec_id"]
            for r in similarity.cosine_topk(
                cells_df, "vec_id", "embedding", QUERY, k
            ).collect()
        }
        return len(got1 & set(exact)) / k

    det = similarity.ivf_centroids(N_CELLS, DIM)
    assert recall_1probe(cents) >= recall_1probe(det)
