"""Deterministic sampling / dataset-splitting operators.

Training-data pipelines need reproducible row selection: train/val/test
splits that stay stable across reruns and cluster sizes, and per-stratum
quota samples (e.g. N docs per language) for balanced eval sets. The
reference has no sampling surface (its pagination slices,
`/root/reference/system/system/database_functions/user_management/user_management.py:544-547`,
are the closest analog); these operators provide the content-addressed
equivalent at corpus scale.

Determinism contract: selection depends only on row ids (md5-derived
buckets), never on partitioning, task order, or RNG state — the same
row lands in the same split on 1 core or 1000 executors, and the
DuckDB oracle reproduces the exact assignment from the same md5.

Scale notes: `hash_split` is a pure per-row projection (no shuffle).
`stratified_sample` bounds its per-stratum sort: a hash-threshold
prefilter keeps ~oversample×n rows per stratum before the window rank,
so the sort input is O(n) per stratum instead of the stratum size —
the standard sample-then-rank trick for top-n-per-group at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 3 hex chars of md5 → uniform bucket in [0, 4096)
_BUCKET_SPACE = 4096


def hash_bucket(id_col: Column, space: int = _BUCKET_SPACE) -> Column:
    """Deterministic uniform bucket from an id: first 3 hex chars of
    md5(id as string). Engine-portable (DuckDB reproduces it with
    strpos-nibble arithmetic on the same md5 hex)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 3), 16, 10)
        .cast("int")
        % space
    )


def split_assign(
    id_col: Column, weights: dict[str, float], space: int = _BUCKET_SPACE
) -> Column:
    """Split label from cumulative weight thresholds over the hash
    bucket. `weights` maps label → fraction (must sum to ≤ 1; remainder
    falls into the last label)."""
    bucket = hash_bucket(id_col, space)
    expr = None
    cum = 0.0
    labels = list(weights.items())
    for name, w in labels[:-1]:
        cum += w
        cond = bucket < int(round(cum * space))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = labels[-1][0]
    return F.lit(last) if expr is None else expr.otherwise(last)


def hash_split(
    df: DataFrame, id_col: str, weights: dict[str, float]
) -> DataFrame:
    """Attach a `split` column (train/val/test style) — a pure
    projection, no shuffle, stable under replay and repartitioning."""
    return df.withColumn("split", split_assign(F.col(id_col), weights))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n_per_stratum: int,
    oversample: float = 4.0,
) -> DataFrame:
    """Deterministic quota sample: the `n_per_stratum` rows with the
    smallest (md5(id), id) order within each stratum.

    Two phases: (1) per-stratum counts (tiny agg, broadcast back) set a
    hash-bucket cutoff keeping ~oversample×n rows, so (2) the window
    rank sorts only the survivors — per-task memory is O(n·oversample)
    per stratum regardless of stratum size. Selection is by hash order,
    so it is uniform over the stratum and identical on any cluster.
    """
    bucket = hash_bucket(F.col(id_col))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    cutoff = F.when(
        F.col("_n") <= F.lit(int(n_per_stratum * oversample)),
        F.lit(_BUCKET_SPACE),
    ).otherwise(
        F.ceil(
            F.lit(float(_BUCKET_SPACE * oversample * n_per_stratum))
            / F.col("_n")
        ).cast("int")
    )
    pre = (
        df.join(F.broadcast(counts.select(strata_col, cutoff.alias("_cut"))), strata_col)
        .where(bucket < F.col("_cut"))
        .drop("_cut")
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def alpha_mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    alpha: float = 0.5,
    space: int = _BUCKET_SPACE,
) -> DataFrame:
    """Alpha (temperature) mixture sampling — the multilingual-LM
    rebalancing scheme (XLM-R §3.1 / mC4): keep source s with
    probability p_s ∝ N_s^(α−1), normalized so the LARGEST source's
    relative keep-rate scaling is 1 at its own size, i.e.

        p_s = (N_s / N_max)^(α−1) · (N_max^(α−1)/N_max^(α−1)) → capped at 1
        expected kept_s ∝ N_s^α

    α=1 keeps everything; α→0 flattens toward equal source sizes.
    Selection is the deterministic per-row hash-bucket Bernoulli
    (`hash_bucket(id) < p_s·space`), so the sample is reproducible on
    any cluster and in the DuckDB oracle. One tiny source-counts agg is
    broadcast back; the filter is a pure projection — no data shuffle.
    `p_s` is floored to the bucket grid (int(p·space))."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    nmax = F.max("_n").over(Window.partitionBy())
    probs = counts.select(
        source_col,
        F.least(
            F.lit(space),
            F.floor(
                F.pow(F.col("_n") / nmax, F.lit(float(alpha) - 1.0)) * space
            ).cast("int"),
        ).alias("_thr"),
    )
    return (
        df.join(F.broadcast(probs), source_col)
        .where(hash_bucket(F.col(id_col), space) < F.col("_thr"))
        .drop("_thr")
    )


def shuffle_assign(
    df: DataFrame,
    id_col: str,
    salt: str = "",
    num_shards: int = 1024,
    space: int = _BUCKET_SPACE,
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a `shard` (which output file it belongs to) and a `pos` (its
    position within that shard), drawn from a salted content hash —
    together they define a full pseudo-random permutation of the corpus
    WITHOUT a global sort.

    This is how you shuffle 100 TB: a true global orderBy(rand()) is a
    single total-order sort (range exchange + global merge); here the
    permutation is (a) shard = hash-bucket of the salted key — a pure
    projection — and (b) pos = rank within the shard of the salted key,
    i.e. one exchange on `shard` plus an in-partition sort of
    corpus/num_shards rows. Each shard is independently orderable and
    the concatenation shard 0..N-1 in pos order IS the shuffled corpus.
    Changing `salt` yields a fresh epoch-level permutation; the same
    (salt, id) pair lands at the same (shard, pos) on any cluster size,
    any partitioning, and in the DuckDB oracle (md5 both sides).

    Reference has no shuffle surface (its ORDER BY pagination,
    user_management.py:544-547, is the closest analog); the semantics
    follow standard LM-corpus practice (shard-then-shuffle, e.g.
    Megatron/GPT-NeoX data loaders consume exactly this layout).
    """
    sid = F.col(id_col).cast("string")
    key = F.md5(F.concat(sid, F.lit(":" + salt)))
    shard = (
        F.conv(F.substring(key, 1, 3), 16, 10).cast("int") % num_shards
    ).cast("int")
    keyed = df.withColumn("_skey", key).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("_skey", F.col(id_col))
    return (
        keyed.withColumn(
            "pos", (F.row_number().over(w) - 1).cast("long")
        ).drop("_skey")
    )


def mixture_epochs(
    df: DataFrame,
    source_col: str,
    tokens_col: str,
    budget_tokens: int | None = None,
) -> DataFrame:
    """Data-mixing card (the LLaMA/DoReMi-style table a training run is
    configured from): per source, document/token counts and the
    EPOCH FACTOR — how many passes over that source hit its share of
    the token budget under a uniform target mixture:

        epochs_s = (budget / n_sources) / tokens_s

    `budget_tokens` defaults to the corpus total (pure re-balancing: a
    small source is repeated >1 epoch, a large one sampled <1). Emitted
    as integer parts-per-million computed with INTEGER division only
    (`1e6 * budget div (n_sources * tokens_s)`) — engine-exact, never a
    rounded double (the round-2 comparator-exactness convention).

    One tiny agg (n_sources rows) + window-less broadcast totals; no
    data shuffle beyond the groupBy. Reference has no mixing surface;
    semantics follow the public data-card convention (epochs column of
    the LLaMA-1 table 1 / DoReMi §2 weights).
    """
    per = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col(tokens_col)).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    total = (
        F.lit(int(budget_tokens)).cast("long")
        if budget_tokens is not None
        else F.sum("n_tokens").over(w)
    )
    ns = F.count(F.lit(1)).over(w)
    return per.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.expr("1000000").cast("long").alias("_m"),
        total.alias("_b"),
        ns.cast("long").alias("_ns"),
    ).select(
        source_col,
        "n_docs",
        "n_tokens",
        F.expr("_m * _b div (_ns * n_tokens)").cast("long").alias(
            "epochs_ppm"
        ),
    )
