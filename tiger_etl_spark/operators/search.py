"""Corpus-frequency analysis and TF-IDF relevance search.

The reference's search surface is substring scoring + top-N
(`/root/reference/system/system/database_functions/user_group_management/user_group_management.py:611-630`,
relevance weights exact=10/prefix=5/contains=2 — re-expressed as
`operators/windows.relevance_topn`). These operators add the
corpus-statistics layer a web-scale text pipeline needs on top:
vocabulary heavy hitters (stopword mining, tokenizer vocab seeding) and
TF-IDF-weighted document retrieval.

Scale shape: everything is explode → hash-aggregate → broadcast-join.
Token counts combine map-side (associative), document frequencies are
one distinct-pair aggregation, and the per-term IDF table is tiny (the
query's terms only) so it broadcasts; no sort touches the full corpus —
top-k is TakeOrderedAndProject (per-partition heaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = "[^a-z0-9]+"


def tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token) rows: lowercase, split on non-alphanumeric runs,
    drop empties. One token per occurrence (not distinct) so downstream
    term frequencies are occurrence counts."""
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)).alias("token"),
    ).where(F.col("token") != "")


def top_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Corpus heavy hitters: top-k tokens by total occurrence count
    (ties by token). groupBy(token) combines partially map-side; the
    top-k never materializes a global sort."""
    if tok is None:
        tok = tokens(df, id_col, text_col)
    return (
        tok
        .groupBy("token")
        .agg(F.count("*").alias("occurrences"), F.countDistinct(id_col).alias("doc_freq"))
        .orderBy(F.desc("occurrences"), F.col("token"))
        .limit(k)
    )


def _word_arrays(text_col: str):
    toks = F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT)
    return F.filter(toks, lambda t: t != "")


def ngram_stream(df: DataFrame, text_col: str, n: int = 2) -> DataFrame:
    """One exploded (`ngram`) stream — build once, persist, and feed
    every n-gram consumer (`top_ngrams`, `bigram_pmi`) instead of
    re-exploding the corpus per query."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    toks = _word_arrays(text_col)
    grams = F.transform(
        guarded_positions(F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return df.select(F.explode(grams).alias("ngram"))


def top_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 20,
    ngrams: DataFrame | None = None,
) -> DataFrame:
    """Corpus n-gram heavy hitters: top-k word n-grams by occurrence
    count (ties by ngram) — LM vocabulary / collocation mining. Same
    explode → map-side-combined hash agg → TakeOrdered shape as
    `top_tokens`; n-grams are built per-row with JVM higher-order
    functions (sequence + slice), no shuffle before the aggregate."""
    if ngrams is None:
        ngrams = ngram_stream(df, text_col, n)
    return (
        ngrams
        .groupBy("ngram")
        .agg(F.count("*").alias("occurrences"))
        .orderBy(F.desc("occurrences"), F.col("ngram"))
        .limit(k)
    )


def bigram_pmi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
    min_count: int = 5,
    scale: int = 6,
    ngrams: DataFrame | None = None,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    ``pmi = ln( (c_xy / N_bigram) / ((c_x / N_token) · (c_y / N_token)) )``
    over word bigrams, keeping only bigrams seen ≥ ``min_count`` times.
    The classic collocation / multi-word-expression miner for tokenizer
    vocabulary construction (Church & Hanks 1990).

    Scale shape: two map-side-combined hash aggregates (unigram and
    bigram counts — the same explode shape as `top_ngrams`), the two
    corpus totals reduced to one-row frames that broadcast as a scalar
    cross-join, and the unigram count table joined onto the (far
    smaller, min_count-filtered) bigram table twice — keyed by token,
    evenly hashed, and broadcast when the vocabulary fits. The final
    top-k is TakeOrderedAndProject. Ordering is by the ROUNDED pmi so
    the k-boundary is deterministic across engines/summation orders."""
    toks = _word_arrays(text_col)
    uni_src = (
        tok.select("token") if tok is not None
        else df.select(F.explode(toks).alias("token"))
    )
    uni = uni_src.groupBy("token").agg(F.count("*").alias("c_tok"))
    if ngrams is None:
        ngrams = ngram_stream(df, text_col, 2)
    big = (
        ngrams
        .groupBy("ngram")
        .agg(F.count("*").alias("c_big"))
        .where(F.col("c_big") >= min_count)
        .withColumn("_w1", F.split_part(F.col("ngram"), F.lit(" "), F.lit(1)))
        .withColumn("_w2", F.split_part(F.col("ngram"), F.lit(" "), F.lit(2)))
    )
    # corpus totals WITHOUT another explode: per-row token/gram counts
    # are array lengths, summed by a narrow partial-agg (1-row shuffle)
    totals = df.select(
        F.size(toks).alias("_nt"),
        F.greatest(F.size(toks) - 1, F.lit(0)).alias("_ng"),
    ).agg(
        F.sum("_nt").alias("n_tok"), F.sum("_ng").alias("n_big")
    )
    u1 = uni.select(
        F.col("token").alias("_w1"), F.col("c_tok").alias("c_w1")
    )
    u2 = uni.select(
        F.col("token").alias("_w2"), F.col("c_tok").alias("c_w2")
    )
    joined = (
        big.join(F.broadcast(u1), "_w1")
        .join(F.broadcast(u2), "_w2")
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("c_big") / F.col("n_big"))
            / ((F.col("c_w1") / F.col("n_tok")) * (F.col("c_w2") / F.col("n_tok")))
        ),
        scale,
    )
    return (
        joined.select(
            "ngram",
            F.col("c_big").alias("occurrences"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.col("ngram"))
        .limit(k)
    )


def tfidf_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query, scored by
    sum over query terms of tf(term, doc) × ln(N / df(term)).

    tf is the raw occurrence count; df is the number of documents
    containing the term; N is the corpus size. The token table is
    filtered to the query's terms *before* any aggregation, so the
    shuffled volume is proportional to query-term occurrences, not the
    corpus vocabulary; the per-term IDF table (≤ len(terms) rows) is
    broadcast into the scoring join. Scores are rounded to 6 decimals
    for cross-engine hash stability.
    """
    tok = (tokens(df, id_col, text_col) if tok is None else tok).where(
        F.col("token").isin(list(terms))
    )
    n_docs = df.count()
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    idf = (
        tok.groupBy("token")
        .agg(F.countDistinct(id_col).alias("df"))
        .select("token", F.log(F.lit(float(n_docs)) / F.col("df")).alias("idf"))
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("tf") * F.col("idf")), 6).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    tok: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents under Okapi BM25 (Robertson/Sparck Jones):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5) / (df + 0.5))

    Same plan skeleton as `tfidf_search` plus the length-normalization
    inputs: `dl` (per-doc token count) is one associative explode+agg
    over the corpus, `avgdl` a 1-row aggregate broadcast into the
    scoring join — no scalar ever leaves the cluster. Query-term
    filtering still happens before the tf aggregation, so the scoring
    shuffle is query-term occurrences, not the corpus. Deterministic
    double math mirrored by the DuckDB oracle."""
    tok_all = tokens(df, id_col, text_col) if tok is None else tok
    n_docs = df.count()
    dl = tok_all.groupBy(id_col).agg(F.count("*").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    tok = tok_all.where(F.col("token").isin(list(terms)))
    tf = tok.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    idf = (
        tok.groupBy("token")
        .agg(F.countDistinct(id_col).alias("df"))
        .select(
            "token",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(F.col("idf") * F.col("tf") * F.lit(k1 + 1.0) / denom), 6
            ).alias("score")
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
