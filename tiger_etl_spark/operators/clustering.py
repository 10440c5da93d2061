"""Distributed spherical k-means (Lloyd's algorithm) over an embedding
column — the learned coarse quantizer for IVF ANN (`similarity.ivf_topk`
accepts its centroids), and a corpus-organization primitive in its own
right (topic bucketing, diversity sampling).

Not present in the reference (no numeric-vector surface); the closest
analog is the relevance-scoring + grouping flow
(`/root/reference/system/system/database_functions/user_group_management/user_group_management.py:611-630`).

Scale shape per iteration: one projection computing the argmax-cosine
assignment (k dot-product folds per row, JVM expressions, no shuffle)
and one groupBy(cluster) with `dim` sums + a count — partial-aggregated
map-side, so the shuffle is k×(dim+1) values per input partition,
independent of row count. Only the k×dim centroid matrix ever reaches
the driver (it parameterizes the next iteration's expressions — the
same pattern as broadcast-joining a tiny dim table). Iterations are
driver-sequenced like any iterative MLlib algorithm.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiger_etl_spark.operators.similarity import ivf_cell_col, ivf_centroids


def _unit(vec: list[float]) -> list[float]:
    nrm = math.sqrt(sum(x * x for x in vec))
    return [x / nrm for x in vec] if nrm > 0 else vec


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    dim: int,
    max_iter: int = 8,
    tol: float = 1e-4,
    sample_per_centroid: int | None = None,
) -> list[list[float]]:
    """Fit k unit-norm centroids by spherical k-means (cosine
    assignment, mean update, renormalize). Deterministic: initialized
    from the md5-derived `ivf_centroids`, ties broken by first-max —
    the same run on any partitioning/cluster size returns the same
    centroids. Returns the centroid list (k×dim, driver-sized by
    design — it feeds the next iteration's column expressions).

    `sample_per_centroid` switches to bounded-sample training — the
    standard quantizer-training regime (FAISS trains its coarse
    quantizer on ~256 vectors per centroid, never the corpus): ONE
    Spark job takes the k×sample_per_centroid vectors with the smallest
    xxhash64 (a deterministic, partitioning-invariant sample;
    TakeOrdered, no global sort materialization), then Lloyd iterations
    run in numpy on the driver. At 10^10 vectors this is the only sane
    shape — iterating Spark jobs over the full corpus to move 16
    centroids is pure waste — and the bounded driver footprint is
    k·s·dim floats (MBs), same class as the centroid matrix itself.
    The distributed path (default) remains for full-corpus training.

    Empty clusters keep their previous centroid (standard Lloyd's
    fallback; with hash-random init and web-scale corpora this is the
    rare path)."""
    cents = ivf_centroids(k, dim)
    if sample_per_centroid:
        import numpy as np

        cap = k * int(sample_per_centroid)
        samp = (
            df.select(F.col(vec_col).alias("_v"))
            .orderBy(F.xxhash64("_v"))
            .limit(cap)
            .collect()
        )
        x = np.asarray([r["_v"] for r in samp], dtype=np.float64)
        c = np.asarray(cents, dtype=np.float64)
        for _ in range(max_iter):
            # argmax returns the FIRST max — same tie-break as
            # ivf_cell_col's array_position
            cell = np.argmax(x @ c.T, axis=1)
            new = c.copy()
            shift = 0.0
            for ci in range(k):
                pts = x[cell == ci]
                if len(pts) == 0:
                    continue  # empty cluster keeps its centroid
                m = pts.mean(axis=0)
                nrm = float(np.linalg.norm(m))
                u = m / nrm if nrm > 0 else m
                shift = max(shift, float(np.max(np.abs(u - c[ci]))))
                new[ci] = u
            c = new
            if shift < tol:
                break
        return [[float(v) for v in row] for row in c]
    src = df.select(F.col(vec_col)).persist()
    try:
        for _ in range(max_iter):
            assigned = src.withColumn("_cell", ivf_cell_col(F.col(vec_col), cents))
            sums = assigned.groupBy("_cell").agg(
                *[
                    F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                    for i in range(dim)
                ],
                F.count("*").alias("n"),
            )
            new = [list(c) for c in cents]
            shift = 0.0
            for r in sums.collect():
                ci = r["_cell"] - 1
                mean = [r[f"s{i}"] / r["n"] for i in range(dim)]
                u = _unit(mean)
                shift = max(
                    shift, max(abs(a - b) for a, b in zip(u, cents[ci]))
                )
                new[ci] = u
            cents = new
            if shift < tol:
                break
        return cents
    finally:
        src.unpersist()


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Attach `_cell` (1-based nearest-centroid id by cosine) — the
    same assignment expression IVF probing prunes on."""
    return df.withColumn("_cell", ivf_cell_col(F.col(vec_col), centroids))


_CENTROID_PROP = "ivf_centroids"


def fit_or_load_centroids(
    table,
    df: DataFrame,
    vec_col: str,
    k: int,
    dim: int,
    max_iter: int = 8,
    sample_per_centroid: int | None = 256,
) -> list[list[float]]:
    """The LEARNED quantizer is the ingest default: on a table's first
    embedding batch, fit spherical k-means on it and persist the k×dim
    centroid matrix in the table's props (its own atomic commit);
    every later batch loads the persisted matrix, so cell ids stay
    comparable across the table's whole life — re-fitting per batch
    would silently re-number cells and break the stored `_cell` column
    the probes prune on. kmeans_fit falls back to the deterministic
    md5-derived centroids as its initialization, so an empty/degenerate
    first batch still yields a valid quantizer."""
    import json as _json

    raw = table.props.get(_CENTROID_PROP)
    if raw:
        cents = _json.loads(raw)
        if len(cents) != k or (cents and len(cents[0]) != dim):
            raise ValueError(
                f"table {table.path} has a persisted IVF quantizer of "
                f"shape {len(cents)}x{len(cents[0]) if cents else 0} but "
                f"k={k}, dim={dim} was requested — silently reusing it "
                "would mis-probe every query (or index past the vector). "
                "Either request the stored shape or rebuild the index "
                "(clear the prop and recompute the cell column)."
            )
        return cents
    cents = kmeans_fit(
        df, vec_col, k, dim, max_iter=max_iter,
        sample_per_centroid=sample_per_centroid,
    )
    table.update_props({_CENTROID_PROP: _json.dumps(cents)})
    return cents


def ingest_ivf_cells(
    table,
    df: DataFrame,
    vec_col: str,
    k: int,
    dim: int,
    cell_col: str = "cell",
) -> DataFrame:
    """Canonical ANN ingest path: attach the stored IVF cell column to a
    change batch using the table's persisted LEARNED centroids (fitted
    from this batch if the table has none yet). NULL vectors (e.g. D
    tombstone payloads) keep a NULL cell."""
    cents = fit_or_load_centroids(
        table, df.where(F.col(vec_col).isNotNull()), vec_col, k, dim
    )
    return df.withColumn(
        cell_col,
        F.when(
            F.col(vec_col).isNotNull(), ivf_cell_col(F.col(vec_col), cents)
        ),
    )
