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

import pandas as pd
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
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int | None = None,
    block_rows: int = 8192,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine ≥ threshold — exact, as a distributed triangle block join.

    Rows are hashed into G blocks; each row is replicated to the G
    block-pair groups (min(g,j), max(g,j)) it participates in, and each
    group scores its two sub-matrices with one BLAS matmul inside
    `applyInPandas`, emitting only above-threshold (a < b) entries.
    Nothing is collected to the driver and nothing is broadcast: shuffle
    volume is N·G rows, per-task memory is two (N/G)×dim float64
    blocks, and the G·(G+1)/2 tasks spread across the cluster. The
    O(N²) dot-products are inherent to the *exact* semantics; for the
    approximate scale path that prunes candidate pairs first, see
    `neardup_pairs_lsh`. Zero-norm vectors carry no cosine and are
    filtered out."""
    import pandas as pd

    filtered = df.select(F.col(id_col), F.col(vec_col)).where(
        _norm(F.col(vec_col)) > 0
    )
    if n_blocks is None:
        n = filtered.count()
        # enough blocks that a block fits comfortably in a task AND the
        # triangle gives at least ~2×cores tasks of parallelism
        par = filtered.sparkSession.sparkContext.defaultParallelism
        g_mem = -(-n // block_rows)  # ceil
        g_par = 1
        while g_par * (g_par + 1) // 2 < 2 * par and g_par < 64:
            g_par += 1
        n_blocks = max(g_mem, min(g_par, max(1, n)))
    G = int(n_blocks)
    thr = float(threshold)

    tagged = filtered.withColumn(
        "_g", F.pmod(F.xxhash64(F.col(id_col)), F.lit(G)).cast("int")
    )
    # replicate each row to every block-pair group it belongs to
    exploded = tagged.withColumn(
        "_bp",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(G - 1)),
                lambda j: F.struct(
                    F.least(F.col("_g"), j).alias("gi"),
                    F.greatest(F.col("_g"), j).alias("gj"),
                ),
            )
        ),
    ).select(
        F.col("_bp.gi").alias("_gi"),
        F.col("_bp.gj").alias("_gj"),
        F.col("_g"),
        F.col(id_col),
        F.col(vec_col),
    )

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        gi, gj = int(pdf["_gi"].iloc[0]), int(pdf["_gj"].iloc[0])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        g = pdf["_g"].to_numpy()
        if gi == gj:
            sims = mat @ mat.T
            li, ri = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame(
                {"id_a": ids[li], "id_b": ids[ri], "cosine": sims[li, ri]}
            )
        lm, rm = g == gi, g == gj
        if not lm.any() or not rm.any():
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        sims = mat[lm] @ mat[rm].T
        lid, rid = ids[lm], ids[rm]
        li, ri = np.nonzero(sims >= thr)
        a, b = lid[li], rid[ri]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine": sims[li, ri],
            }
        )

    return exploded.groupBy("_gi", "_gj").applyInPandas(
        score, schema="id_a long, id_b long, cosine double"
    )


def _band_sig_udf(dim: int, n_bands: int, rows_per_band: int):
    """Arrow-batched band-signature UDF: one (N×dim)@(dim×planes)
    matmul per batch, sign bits grouped into per-band hash strings.
    Planes derive from md5 — no broadcast random state."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    planes = _planes(n_bands * rows_per_band, dim)
    pl_t = np.array(planes, dtype=np.float64).T  # (dim, n_planes)

    @pandas_udf("array<string>")
    def band_sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array(list(vecs), dtype=np.float64)  # (N, dim)
        bits = (mat @ pl_t) >= 0  # (N, n_planes)
        chars = np.where(bits, "1", "0").reshape(
            len(mat), n_bands, rows_per_band
        )
        return pd.Series([["".join(band) for band in row] for row in chars])

    return band_sigs


def banded_signatures(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bands: int = 16,
    rows_per_band: int = 8,
) -> DataFrame:
    """(id, unit-norm vec, band_id, band_hash) — the shared signature
    stage of the banded near-dup path, exposed so callers can persist
    ONE banded table and feed every consumer (uncapped + capped verify,
    repeated runs): at production scale this is a stored table keyed by
    (band_id, band_hash), not a per-query recomputation. Vectors are
    normalized once here (norms dominate fold cost; sign bits are
    invariant to positive scaling). Zero-norm vectors are dropped —
    cosine is undefined for them."""
    src = df.select(F.col(id_col), F.col(vec_col))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        # spread a narrow source before paying per-row plane dots
        src = src.repartition(par)
    base = (
        src.withColumn("_nrm", _norm(F.col(vec_col)))
        .where(F.col("_nrm") > 0)
        .select(
            id_col,
            F.transform(
                F.col(vec_col), lambda x: x.cast("double") / F.col("_nrm")
            ).alias(vec_col),
        )
    )
    band_sigs = _band_sig_udf(dim, n_bands, rows_per_band)
    return base.select(
        id_col,
        vec_col,
        F.posexplode(band_sigs(F.col(vec_col))).alias("band_id", "band_hash"),
    )


def neardup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    n_bands: int = 16,
    rows_per_band: int = 8,
    bucket_cap: int | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Approximate near-dup pairs — the 100 TB path: banded
    random-hyperplane LSH prunes candidates, exact cosine verifies.

    Each row gets `n_bands` band signatures (each the sign-bit string of
    `rows_per_band` deterministic hyperplanes); rows sharing any band
    collide into a candidate pair; candidates are deduped as bare id
    pairs (vectors re-joined afterwards, so duplicate band collisions
    never shuffle vector payloads) and verified with the exact JVM-side
    cosine. The self-join is keyed on (band_id, band_hash) — shuffle
    fan-out is bucket sizes, never N².

    Recall = 1-(1-p^r)^b with p = 1-θ/π. The defaults (16 bands × 8
    planes) target the production near-dup regime: cosine ≥ 0.9 →
    recall ≈ 0.996 while random pairs (p = 0.5) collide with only ~6%
    probability. At LOW thresholds hyperplane LSH discriminates weakly
    (p barely above 0.5) — wider bands then trade recall for pruning,
    and exact `neardup_pairs` is usually the better tool.

    Plan shape: normalized vectors ride the band shuffle (volume =
    n_bands × vector column — linear; for very wide vectors project to
    ids and re-join instead); each (band_id, band_hash) bucket is scored
    by one BLAS mat @ mat.T triangle inside `applyInPandas` (the same
    block-scorer shape as `neardup_pairs`), the threshold filters inside
    the scorer so only true near-dups reach the final pair-dedup
    exchange. The dense arithmetic deliberately lives in two
    Arrow-batched numpy steps — plane signatures as one
    (N×dim)@(dim×planes) product and per-bucket verification as one
    matmul — because the equivalent per-element `aggregate` folds
    evaluate interpreted (measured 2× slower end-to-end even with
    bucket-collision candidate counts, far worse at lower selectivity),
    and unrolling them into flat JVM expressions overflows both py4j
    plan construction and Janino's 64 KB method limit. Values at a
    rounding/sign boundary within ~1e-13 could in principle differ from
    a sequential-sum engine; the DuckDB-oracle parity check covers
    this. No broadcast of random state (planes derive from md5).

    `bucket_cap` is the skew guard for production corpora: a mass of
    exact duplicates (one popular page crawled a million times) lands
    the whole mass in ONE (band_id, band_hash) bucket in every band —
    a single task holding an m×m score matrix. With a cap set, bucket
    sizes are counted first (a narrow map-side-combined agg — the
    vector column never rides that shuffle), only the buckets OVER the
    cap (≤ total_rows/cap of them, small by construction) are
    broadcast back, and each hot bucket is split into G = ⌈size/cap⌉
    hash sub-blocks scored as the same triangle block-pair groups
    `neardup_pairs` uses — per-task memory is capped at ~(2·cap)×dim
    and hot buckets spread across G·(G+1)/2 tasks instead of one.
    Non-hot buckets (G = 1) take the identical single-group path, and
    the output is identical with or without a cap. The price is one
    extra evaluation of the signature stage for the count pass;
    persist the input upstream if that matters. Default None keeps the
    single-pass plan — random sign-bit hashes keep buckets even unless
    the corpus carries duplicate mass."""
    band_sigs = _band_sig_udf(dim, n_bands, rows_per_band)
    src = df.select(F.col(id_col), F.col(vec_col))
    par = df.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < par:
        src = src.repartition(par)
    if banded is None:
        banded = banded_signatures(
            df, id_col, vec_col, dim, n_bands, rows_per_band
        )
        count_src = None  # count pass can use raw vectors (cheaper)
    else:
        # caller persisted the banded table (the production pattern):
        # the count pass reads the SAME cached artifact instead of a
        # second raw signature evaluation
        count_src = banded
    # Per-bucket BLAS verify instead of a band self-join + per-pair fold
    # dot: at low thresholds collisions far outnumber survivors, and an
    # interpreted 'dim'-element fold per collision dominated the query.
    # Grouping by (band_id, band_hash) shuffles each row once per band
    # and scores the whole bucket with one mat @ mat.T — same triangle
    # scorer shape as `neardup_pairs`. Work per bucket is O(|bucket|²·
    # dim) BLAS; at production scale cap bucket size (sub-block skewed
    # hashes) — random sign-bit hashes keep buckets even here.
    thr = float(threshold)

    def bucket_score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        if "_gi" in pdf.columns and int(pdf["_gi"].iloc[0]) != int(
            pdf["_gj"].iloc[0]
        ):
            # cross sub-block group of a capped hot bucket: score the
            # gi-rows × gj-rows rectangle only
            gi, gj = int(pdf["_gi"].iloc[0]), int(pdf["_gj"].iloc[0])
            g = pdf["_g"].to_numpy()
            lm, rm = g == gi, g == gj
            if not lm.any() or not rm.any():
                return pd.DataFrame(
                    {"id_a": [], "id_b": [], "cosine": []}
                ).astype({"id_a": "int64", "id_b": "int64", "cosine": "float64"})
            sims = mat[lm] @ mat[rm].T
            lid, rid = ids[lm], ids[rm]
            li, ri = np.nonzero(sims >= thr)
            a, b = lid[li], rid[ri]
            return pd.DataFrame(
                {
                    "id_a": np.minimum(a, b),
                    "id_b": np.maximum(a, b),
                    "cosine": sims[li, ri],
                }
            )
        sims = mat @ mat.T  # unit-norm rows → cosines
        li, ri = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame(
            {"id_a": ids[li], "id_b": ids[ri], "cosine": sims[li, ri]}
        )

    if bucket_cap is not None:
        cap = int(bucket_cap)
        # The count pass only needs band hashes, and sign bits are
        # invariant to positive scaling — so when the banded table was
        # built in-query it runs band_sigs on the RAW vectors, skipping
        # base's per-row normalization fold (the expensive part of the
        # signature stage). Zero-norm rows (absent from `banded`) can
        # only overcount a bucket, which splits it conservatively —
        # never under-splits. With a caller-persisted `banded`, the
        # counts read that cache directly (exact sizes, zero recompute).
        if count_src is not None:
            counted = count_src.select("band_id", "band_hash")
        else:
            counted = src.select(
                F.posexplode(band_sigs(F.col(vec_col))).alias(
                    "band_id", "band_hash"
                )
            )
        hot = (
            counted.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("_bn"))
            .where(F.col("_bn") > cap)
        )
        blocked = (
            banded.join(F.broadcast(hot), ["band_id", "band_hash"], "left")
            .withColumn(
                "_nblk",
                F.coalesce(
                    F.ceil(F.col("_bn") / F.lit(cap)).cast("int"), F.lit(1)
                ),
            )
            .withColumn(
                "_g",
                F.pmod(F.xxhash64(F.col(id_col)), F.col("_nblk")).cast("int"),
            )
        )
        grouped = (
            blocked.withColumn(
                "_bp",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.col("_nblk") - 1),
                        lambda j: F.struct(
                            F.least(F.col("_g"), j).alias("gi"),
                            F.greatest(F.col("_g"), j).alias("gj"),
                        ),
                    )
                ),
            )
            .select(
                "band_id",
                "band_hash",
                F.col("_bp.gi").alias("_gi"),
                F.col("_bp.gj").alias("_gj"),
                "_g",
                id_col,
                vec_col,
            )
            .groupBy("band_id", "band_hash", "_gi", "_gj")
        )
    else:
        grouped = banded.groupBy("band_id", "band_hash")

    return grouped.applyInPandas(
        bucket_score, schema="id_a long, id_b long, cosine double"
    ).dropDuplicates(["id_a", "id_b"])


def _triangle_scorer(id_col: str, vec_col: str, thr: float):
    """Pandas scorer for triangle block-pair groups: normalizes the
    group's vectors once, scores the same-block triangle (gi == gj) or
    the cross-block rectangle (gi != gj) with one BLAS matmul, and emits
    (id_a < id_b) pairs at cosine >= thr. Shared by the grouped near-dup
    operators; the group keys beyond (_gi, _gj, _g) are ignored."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf[vec_col]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        gi, gj = int(pdf["_gi"].iloc[0]), int(pdf["_gj"].iloc[0])
        if gi == gj:
            sims = mat @ mat.T
            li, ri = np.nonzero((sims >= thr) & (ids[:, None] < ids[None, :]))
            return pd.DataFrame(
                {"id_a": ids[li], "id_b": ids[ri], "cosine": sims[li, ri]}
            )
        g = pdf["_g"].to_numpy()
        lm, rm = g == gi, g == gj
        if not lm.any() or not rm.any():
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        sims = mat[lm] @ mat[rm].T
        lid, rid = ids[lm], ids[rm]
        li, ri = np.nonzero(sims >= thr)
        a, b = lid[li], rid[ri]
        return pd.DataFrame(
            {
                "id_a": np.minimum(a, b),
                "id_b": np.maximum(a, b),
                "cosine": sims[li, ri],
            }
        )

    return score


def neardup_pairs_grouped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    group_cols: list[str],
    block_rows: int = 8192,
) -> DataFrame:
    """Exact above-threshold cosine pairs WITHIN each group — the inner
    step of cluster-then-dedup (SemDeDup). Per group the same triangle
    block-pair decomposition as `neardup_pairs`: group sizes are counted
    first (a narrow map-side-combined agg over the group keys — the
    vector column never rides that shuffle), each group splits into
    G = ⌈size/block_rows⌉ hash sub-blocks, rows replicate to the G
    block-pair sub-groups they participate in, and each sub-group is
    scored with one BLAS matmul inside `applyInPandas`. Per-task memory
    is capped at ~(2·block_rows)×dim float64 regardless of group-size
    skew; a hot group spreads across G·(G+1)/2 tasks instead of
    serializing onto one. Zero-norm vectors carry no cosine and are
    excluded. Nothing is collected or broadcast."""
    thr = float(threshold)
    gcols = list(group_cols)
    filtered = df.select(*gcols, F.col(id_col), F.col(vec_col)).where(
        _norm(F.col(vec_col)) > 0
    )
    counts = filtered.groupBy(*gcols).agg(F.count("*").alias("_gn"))
    blocked = (
        filtered.join(counts, gcols)
        .withColumn(
            "_nblk",
            F.ceil(F.col("_gn") / F.lit(int(block_rows))).cast("int"),
        )
        .withColumn(
            "_g", F.pmod(F.xxhash64(F.col(id_col)), F.col("_nblk")).cast("int")
        )
    )
    exploded = blocked.withColumn(
        "_bp",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.col("_nblk") - 1),
                lambda j: F.struct(
                    F.least(F.col("_g"), j).alias("gi"),
                    F.greatest(F.col("_g"), j).alias("gj"),
                ),
            )
        ),
    ).select(
        *gcols,
        F.col("_bp.gi").alias("_gi"),
        F.col("_bp.gj").alias("_gj"),
        "_g",
        id_col,
        vec_col,
    )
    return exploded.groupBy(*gcols, "_gi", "_gj").applyInPandas(
        _triangle_scorer(id_col, vec_col, thr),
        schema="id_a long, id_b long, cosine double",
    )


def semantic_dedup_dropped(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_cells: int = 16,
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
    cell_df: DataFrame | None = None,
    block_rows: int = 8192,
) -> DataFrame:
    """SemDeDup (cluster-then-dedup over embeddings, Abbas et al. 2023):
    coarse-assign every embedding to its nearest centroid cell, find
    within-cell near-duplicate pairs (exact cosine ≥ threshold), and
    drop the higher id of every pair — one distinct id per dropped row.

    Pass `cell_df` (from `build_ivf_cells`, persisted / partitioned by
    `_cell` at ingest) so the assignment is a stored column, or
    `centroids` from `clustering.kmeans_fit` for a learned quantizer;
    the deterministic default keeps the operator oracle-checkable.

    Scale: pair scoring never crosses cells, so total work is
    Σ|cell|²·dim instead of N²·dim; hot cells sub-block through
    `neardup_pairs_grouped` (per-task memory capped at ~2·block_rows
    vectors). The dropped-id set returns as a DataFrame — anti-join it
    against the corpus (`semantic_dedup`), never collect it."""
    if cell_df is None:
        d = dim if dim is not None else len(df.select(vec_col).head()[0])
        cell_df = build_ivf_cells(df, vec_col, n_cells, d, centroids)
    pairs = neardup_pairs_grouped(
        cell_df, id_col, vec_col, threshold, ["_cell"], block_rows
    )
    return pairs.select(F.col("id_b").alias(id_col)).distinct()


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    **kwargs,
) -> DataFrame:
    """Corpus rows surviving SemDeDup (see `semantic_dedup_dropped`):
    keep every row with no lower-id near-duplicate in its cell."""
    dropped = semantic_dedup_dropped(df, id_col, vec_col, threshold, **kwargs)
    return df.join(dropped, id_col, "left_anti")


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


def build_lsh_signatures(
    df: DataFrame, vec_col: str, n_planes: int, dim: int
) -> DataFrame:
    """Attach the persisted-signature column `_sig` (sign bits over the
    deterministic hyperplanes). At scale this is computed ONCE at ingest
    and stored/partitioned in the table, so every ANN probe prunes on it
    instead of re-scanning vectors — see `lsh_topk(sig_df=...)`."""
    planes = _planes(n_planes, dim)
    return df.withColumn("_sig", lsh_signature_col(F.col(vec_col), planes))


def probe_signatures(
    query: list[float], n_planes: int, max_hamming: int
) -> list[str]:
    """The query's bucket plus all buckets within `max_hamming` bit
    flips (multi-probe)."""
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
    return probe_sigs


def _centroid_component(cell: int, dim: int) -> float:
    """Deterministic pseudo-random IVF centroid component in [-1, 1)
    (distinct md5 namespace from the LSH planes)."""
    h = hashlib.md5(f"ivf{cell}:{dim}".encode()).hexdigest()
    return int(h[:12], 16) / float(16**12) * 2.0 - 1.0


def ivf_centroids(n_cells: int, n_dims: int) -> list[list[float]]:
    """Unit-norm deterministic centroids. Real IVF learns these with
    k-means over a sample; the coarse-quantizer *plumbing* (assign →
    probe → re-rank) is identical, so deterministic centroids keep the
    operator oracle-checkable while the learned variant only swaps this
    function."""
    cents = [
        [_centroid_component(c, d) for d in range(n_dims)]
        for c in range(n_cells)
    ]
    out = []
    for c in cents:
        nrm = math.sqrt(sum(x * x for x in c))
        out.append([x / nrm for x in c])
    return out


def ivf_cell_col(vec_col: Column, centroids: list[list[float]]) -> Column:
    """1-based id of the nearest centroid by cosine. Centroids are
    unit-norm, so argmax of the raw dot equals argmax of cosine — the
    row vector never needs normalizing for assignment. First-max wins
    on ties (deterministic)."""
    dots = F.array(*[_dot(vec_col, c) for c in centroids])
    return F.array_position(dots, F.array_max(dots)).cast("int")


def build_ivf_cells(
    df: DataFrame,
    vec_col: str,
    n_cells: int,
    dim: int,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Attach the persisted coarse-quantizer column `_cell`. At scale
    this is computed once at ingest and the table is partitioned by it,
    so a probe reads only nprobe/n_cells of the data (partition
    pruning), never a full scan. Pass `centroids` (e.g. from
    `clustering.kmeans_fit`) to use a learned quantizer instead of the
    deterministic default."""
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    return df.withColumn("_cell", ivf_cell_col(F.col(vec_col), cents))


def ivf_probe_cells(
    query: list[float],
    n_cells: int,
    nprobe: int,
    centroids: list[list[float]] | None = None,
) -> list[int]:
    """The nprobe centroid ids nearest the query (1-based), ties by id."""
    cents = centroids if centroids is not None else ivf_centroids(n_cells, len(query))
    scored = sorted(
        (
            (-sum(v * c for v, c in zip(query, cent)), i + 1)
            for i, cent in enumerate(cents)
        ),
    )
    return [i for _, i in scored[:nprobe]]


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    n_cells: int = 16,
    nprobe: int = 4,
    cell_df: DataFrame | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize rows to their nearest centroid
    cell, probe only the `nprobe` cells nearest the query, exact-rerank
    the survivors by cosine. Pass `cell_df` (from `build_ivf_cells`,
    persisted/partitioned) so the probe is a cell-id IN-filter with no
    vector arithmetic on the scan side; pass `centroids` (e.g. from
    `clustering.kmeans_fit`) for a learned quantizer — `cell_df` must
    then have been built with the same centroids."""
    probe = ivf_probe_cells(query, n_cells, nprobe, centroids)
    if cell_df is None:
        cell_df = build_ivf_cells(df, vec_col, n_cells, len(query), centroids)
    cands = cell_df.where(F.col("_cell").isin(probe))
    return cosine_topk(cands, id_col, vec_col, query, k)


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int,
    n_planes: int = 8,
    max_hamming: int = 1,
    sig_df: DataFrame | None = None,
) -> DataFrame:
    """ANN: restrict the exact cosine re-rank to rows whose LSH bucket is
    within `max_hamming` bits of the query's bucket. Pass `sig_df` (from
    `build_lsh_signatures`, persisted) so the probe is a bucket-list
    IN-filter over the precomputed `_sig` column — no vector arithmetic
    on the scan side; without it the signature is computed inline."""
    probe_sigs = probe_signatures(query, n_planes, max_hamming)
    if sig_df is None:
        sig_df = build_lsh_signatures(df, vec_col, n_planes, len(query))
    cands = sig_df.where(F.col("_sig").isin(probe_sigs))
    return cosine_topk(cands, id_col, vec_col, query, k)
