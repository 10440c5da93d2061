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
) -> list[list[float]]:
    """Fit k unit-norm centroids by spherical k-means (cosine
    assignment, mean update, renormalize). Deterministic: initialized
    from the md5-derived `ivf_centroids`, ties broken by first-max —
    the same run on any partitioning/cluster size returns the same
    centroids. Returns the centroid list (k×dim, driver-sized by
    design — it feeds the next iteration's column expressions).

    Empty clusters keep their previous centroid (standard Lloyd's
    fallback; with hash-random init and web-scale corpora this is the
    rare path)."""
    cents = ivf_centroids(k, dim)
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
