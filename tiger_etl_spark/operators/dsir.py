"""DSIR-style importance-resampling data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a small TARGET corpus (the distribution you want more of — e.g.
curated English prose) and a large RAW corpus, score every raw document
by the log-likelihood ratio of its hashed n-gram features under two
bag-of-hashed-ngrams unigram models:

    weight(doc) = sum_b  c_doc[b] * ( log p_target[b] - log p_raw[b] )

then keep the top-weighted docs (the deterministic top-k variant of
DSIR's Gumbel resampling). Features are unigrams + word bigrams hashed
into `n_buckets` buckets; both models use add-1 smoothing over the
bucket space.

The reference has no selection surface; its closest analog is the
relevance-scored top-N search
(/root/reference/system/system/database_functions/user_group_management/user_group_management.py:611-630)
— score-per-row then rank — which is exactly the shape this operator
lifts to corpus scale.

Engine-exactness: bucket ids come from the portable md5-prefix hash
(same value in Spark and DuckDB), and log-probabilities are quantized
to integer micro-nats (`floor(ln(p) * 1e6)` as BIGINT) before the
per-doc sum, so the whole weight computation after the two `ln` calls
is integer arithmetic — a 1-ulp `ln` divergence between engines cannot
flip a weight unless it lands exactly on an integer boundary.

Scale shape (100 TB): the gram explode is one linear pass (same cost
class as the MinHash shingle pass); per-doc bucket counts are one hash
aggregation keyed by (id, bucket); each fitted model is exactly
`n_buckets` rows (a few thousand) and BROADCASTS to the weight join, so
scoring the raw corpus is explode → agg → broadcast-join → agg with no
large shuffle beyond the (id, bucket) combine. Fit the target model on
the (small) target corpus directly; for the raw model at 100 TB, fit on
a deterministic hash-sample (`sample_space`/`sample_keep`) — importance
weights only need p_raw up to a constant, and a uniform hash-sample
keeps the bucket distribution unbiased.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"
_LOG_SCALE = 1_000_000  # micro-nats


def _words(text_col: str) -> Column:
    toks = F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def hashed_gram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    include_bigrams: bool = True,
) -> DataFrame:
    """(id, bucket, cnt): per-document hashed n-gram feature counts.
    Grams are word unigrams (+ space-joined bigrams); bucket =
    md5-prefix hash mod `n_buckets` (engine-portable). One explode +
    one hash aggregation; combines map-side."""
    # staged select: the bigram transform references the tokenized
    # array by name. sequence(1, 0) would count DOWN — guard <2 tokens.
    grams = (
        F.concat(
            F.col("_w"),
            F.when(
                F.size("_w") >= 2,
                F.expr(
                    "transform(sequence(1, size(_w) - 1),"
                    " i -> concat(_w[i-1], ' ', _w[i]))"
                ),
            ).otherwise(F.expr("array()")),
        )
        if include_bigrams
        else F.col("_w")
    )
    g = df.select(F.col(id_col), _words(text_col).alias("_w")).select(
        F.col(id_col), F.explode(grams).alias("g")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10)
        .cast("long")
        % n_buckets
    )
    return (
        g.select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def fit_bucket_logprobs(
    gram_counts: DataFrame,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, logp_micro) over the COMPLETE bucket space: add-1
    smoothed bucket probabilities quantized to integer micro-nats,
    `floor(ln((C[b]+1)/(total+B)) * 1e6)` as BIGINT. Absent buckets get
    the smoothing floor, so the result always has exactly `n_buckets`
    rows — small enough to broadcast."""
    spark = gram_counts.sparkSession
    c = gram_counts.groupBy("bucket").agg(F.sum("cnt").alias("c"))
    total = c.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t"))
    space = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return (
        space.join(c, "bucket", "left")
        .join(F.broadcast(total))
        .select(
            "bucket",
            F.floor(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.col("t") + F.lit(n_buckets)).cast("double")
                )
                * F.lit(_LOG_SCALE)
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )


def importance_weights(
    raw_counts: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, weight_micro): per-document DSIR importance weight in
    integer micro-nats — sum of cnt * (logp_target - logp_raw) over the
    doc's hashed grams. Both models are n_buckets-row tables and
    broadcast; the only shuffle is the final per-doc sum."""
    ratio = (
        target_model.withColumnRenamed("logp_micro", "lt")
        .join(raw_model.withColumnRenamed("logp_micro", "lr"), "bucket")
        .select("bucket", (F.col("lt") - F.col("lr")).alias("dl"))
    )
    return (
        raw_counts.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("cnt") * F.col("dl")).alias("weight_micro"))
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    k: int = 50,
) -> DataFrame:
    """Top-k raw documents by DSIR importance weight toward the target
    distribution (ties broken by id — fully deterministic). Returns
    (id, weight_micro). The top-k is TakeOrderedAndProject — no global
    sort materializes."""
    raw_counts = hashed_gram_counts(raw, id_col, text_col, n_buckets)
    tgt_counts = hashed_gram_counts(target, id_col, text_col, n_buckets)
    raw_model = fit_bucket_logprobs(raw_counts, n_buckets, id_col)
    tgt_model = fit_bucket_logprobs(tgt_counts, n_buckets, id_col)
    w = importance_weights(raw_counts, tgt_model, raw_model, id_col)
    return w.orderBy(F.desc("weight_micro"), F.col(id_col)).limit(k)
