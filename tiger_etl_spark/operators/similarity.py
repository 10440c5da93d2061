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
    cosine ≥ threshold. Exact all-pairs self-join — correct and
    oracle-checkable at test scale. The 100 TB path blocks the join by
    LSH signature first (`lsh_signature_col` equi-join, which bounds
    candidates by bucket size instead of n²) and uses this exact scorer
    only on candidates; the scorer column is identical in both."""
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_pair(F.col("_va"), F.col("_vb"))
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= F.lit(float(threshold)))
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
