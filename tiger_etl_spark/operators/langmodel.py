"""Statistical LM quality scoring — corpus-trained character bigram
model, CCNet-style.

CCNet/RefinedWeb-class pipelines score candidate documents by
perplexity under a small language model and drop the tails; the
container has no KenLM, but the *pipeline shape* is identical for a
character-bigram model trained on the corpus itself, and that model is
fully expressible in DataFrame ops (and in ANSI SQL for the oracle):

- **Train**: one explode of char bigrams → two map-side-combined hash
  aggregates (bigram counts, then prefix-char totals derived FROM the
  bigram table, never a second corpus pass). The model is
  |alphabet|² rows — broadcastable at any corpus size.
- **Score**: the same exploded stream joined to the broadcast model,
  averaged per document — one keyed aggregate, everything linear in
  corpus size, no Python in the plan.

Probabilities are Laplace-smoothed: ``p(c2|c1) = (c(c1c2) + 1) /
(c(c1·) + V)`` where V = number of distinct prefix chars (documented
deviation from add-V-over-full-alphabet; deterministic and
reproducible cross-engine). Documents shorter than two characters have
no bigrams and drop out of the scored output.

At 100 TB you train once, persist the model table, and score
incrementally at ingest — the train stage is a one-off linear pass and
the scoring stage is broadcast-join + agg, the same shape LakeTable
merges already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _char_bigrams(text_col: str):
    """Per-row array of character bigrams of lower(text)."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    t = F.lower(F.col(text_col))
    return F.transform(
        guarded_positions(F.length(t) - 1),
        lambda i: F.substring(t, i, F.lit(2)),
    )


def char_bigram_model(df: DataFrame, text_col: str) -> DataFrame:
    """(bg, logp) — Laplace-smoothed log-probability per observed char
    bigram. |alphabet|² rows; broadcast it at score time."""
    bg = df.select(F.explode(_char_bigrams(text_col)).alias("bg"))
    counts = bg.groupBy("bg").agg(F.count("*").alias("c_xy"))
    pref = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("c_xy").alias("c_x")
    )
    v = pref.agg(F.count("*").cast("double").alias("v"))
    return (
        counts.withColumn("c1", F.substring("bg", 1, 1))
        .join(F.broadcast(pref), "c1")
        .crossJoin(F.broadcast(v))
        .select(
            "bg",
            F.log((F.col("c_xy") + 1) / (F.col("c_x") + F.col("v"))).alias("logp"),
        )
    )


def char_lm_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
    scale: int = 6,
    unseen_logp: float | None = None,
) -> DataFrame:
    """(id, n_bigrams, avg_logp) per document — mean log-probability of
    the document's char bigrams under ``model`` (trained on ``df``
    itself when not supplied; at ingest, pass the persisted corpus
    model). Low scores flag boilerplate/garbage for quality filtering.

    When scoring NEW text under a stored model, bigrams absent from the
    model must not silently drop (an all-novel garbage document would
    otherwise vanish from — i.e. pass — the filter): pass
    ``unseen_logp`` (e.g. ``ln(1/(max c_x + V))``, a floor below every
    seen bigram) and unseen bigrams score that penalty via a left join.
    Self-trained scoring covers every bigram by construction, so the
    parameter is required exactly when ``model`` is supplied."""
    scored = _scored_bigrams(df, id_col, text_col, model, unseen_logp)
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), scale).alias("avg_logp"),
        )
    )


def _scored_bigrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None,
    unseen_logp: float | None,
) -> DataFrame:
    """(id, bg, logp): the document bigram stream joined to the
    broadcast model — shared by the rounded-double and integer
    micro-nat aggregators."""
    ex = df.select(F.col(id_col), F.explode(_char_bigrams(text_col)).alias("bg"))
    if model is None:
        model = char_bigram_model(df, text_col)
        return ex.join(F.broadcast(model), "bg")
    if unseen_logp is None:
        raise ValueError(
            "scoring under an external model requires unseen_logp "
            "(otherwise unseen bigrams drop and garbage scores high)"
        )
    return ex.join(F.broadcast(model), "bg", "left").withColumn(
        "logp", F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))
    )


def char_lm_micro_nats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
    unseen_logp: float | None = None,
) -> DataFrame:
    """(id, n_bigrams, lm_micro_nats) — like `char_lm_scores` but the
    mean log-probability is quantized to integer micro-nats
    (`floor(avg*1e6)`), the comparator-exact currency the repo uses
    wherever a double would otherwise ride into a hash comparison."""
    scored = _scored_bigrams(df, id_col, text_col, model, unseen_logp)
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.avg("logp") * F.lit(1_000_000.0))
        .cast("long")
        .alias("lm_micro_nats"),
    )


BUCKET_LABELS = ("head", "middle", "tail")


def ccnet_buckets(
    scores: DataFrame,
    id_col: str,
    lang_col: str,
    score_col: str = "lm_micro_nats",
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet §4.4 perplexity bucketing: within each language, rank
    documents by LM score (best = most natural text first) and cut the
    ranking into `n_buckets` equal-depth buckets — head / middle /
    tail for the default 3. Rank-exact (ntile) semantics: deterministic
    given the integer score + id tie-break, ANSI-identical in DuckDB.

    Scale shape: ntile partitions by language, so each language's score
    table sorts in one task — fine for the SCORE table (id, lang, int)
    up to ~10^8 docs/lang per task, but at full 100 TB corpus width use
    `ccnet_bucket_thresholds` + `assign_buckets`: thresholds computed
    once from this (or a sampled) ranking, assignment a pure scan-stage
    comparison with no sort of the corpus at all — which is exactly how
    CCNet itself applies fixed per-language cutoffs."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(lang_col)
        .orderBy(F.desc(score_col), F.col(id_col))
    )
    nt = F.ntile(n_buckets).over(w)
    label = F.element_at(
        F.lit(list(BUCKET_LABELS[:n_buckets])), nt
    ) if n_buckets <= len(BUCKET_LABELS) else nt.cast("string")
    return scores.select(
        id_col, lang_col, score_col, label.alias("lm_bucket")
    )


def ccnet_bucket_thresholds(
    buckets: DataFrame,
    lang_col: str,
    score_col: str = "lm_micro_nats",
) -> DataFrame:
    """(lang, lm_bucket, min_score) — per-language lower score bound of
    each rank-exact bucket, derived once from a `ccnet_buckets` run
    (typically over a sample). Broadcastable: |languages| × buckets."""
    return buckets.groupBy(lang_col, "lm_bucket").agg(
        F.min(score_col).alias("min_score")
    )


def assign_buckets(
    scores: DataFrame,
    thresholds: DataFrame,
    lang_col: str,
    score_col: str = "lm_micro_nats",
) -> DataFrame:
    """Scan-stage bucket assignment under stored per-language
    thresholds: broadcast join + greatest-lower-bound pick, no sort,
    no per-language shuffle — the 100 TB application path. Documents
    scoring below every threshold fall into the last (worst) bucket."""
    th = thresholds.groupBy(lang_col).agg(
        F.sort_array(
            F.collect_list(F.struct("min_score", "lm_bucket")), asc=False
        ).alias("cuts")
    )
    pick = F.filter(
        F.col("cuts"), lambda c: F.col(score_col) >= c["min_score"]
    )
    chosen = F.when(F.size(pick) > 0, pick[0]["lm_bucket"]).otherwise(
        F.element_at(F.col("cuts"), -1)["lm_bucket"]
    )
    return (
        scores.join(F.broadcast(th), lang_col, "left")
        .withColumn("lm_bucket", chosen)
        .drop("cuts")
    )


def feature_hash_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """fastText-style linear quality scorer over hashed token features
    (the Dolma/RefinedWeb quality-classifier shape): whitespace tokens
    → md5 feature-hash buckets → per-bucket weight → summed doc score.

    The weight table here is a deterministic integer surrogate
    (`(bucket * 2654435761) % 1000003 − 500001`, a Knuth-hash spread
    over ±5e5) so the whole scorer is engine-exact and oracle-checkable;
    swapping it for learned weights is a broadcast join against a
    (bucket, weight) table on the same bucket key — the plan shape
    (scan-stage hashing, no shuffle, no UDF) is identical.

    Everything runs as JVM higher-order expressions in the scan stage:
    `transform` hashes each token, `aggregate` folds the integer sum —
    no Python, no shuffle, column-pruned to (id, text).
    """
    # NULL text behaves like empty text: F.trim(NULL) is NULL, so without
    # the coalesce the empty-guard is NULL and the otherwise-branch runs
    # size(split(NULL)) = -1 under non-ANSI Spark (n_tokens=-1, NULL
    # score/keep) — diverging from the oracle's 0/0/true.
    trimmed = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    tokens = F.split(F.lower(trimmed), r"\s+")
    n_tok = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(tokens)
    ).cast("long")

    def weight(tok):
        bucket = (
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
            % n_buckets
        )
        return (bucket * F.lit(2654435761).cast("long")) % 1000003 - 500001

    score = F.when(F.length(trimmed) == 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.transform(tokens, weight),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        score.alias("score"),
        (score >= 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Word-bigram interpolated Kneser–Ney LM — the actual CCNet/KenLM shape
# (Kneser & Ney 1995; Chen & Goodman 1999 interpolated form), expressed
# entirely in DataFrame ops (and ANSI SQL for the oracle).
# ---------------------------------------------------------------------------


def _word_tokens(text_col: str):
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    return F.filter(F.split(t, r"\s+"), lambda w: w != "")


def _word_bigrams(text_col: str):
    """Per-row array of struct(w1, w2) word bigrams (whitespace tokens,
    lowercased). Empty for docs with <2 tokens."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    toks = _word_tokens(text_col)
    return F.transform(
        guarded_positions(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
        ),
    )


def kn_bigram_model(
    df: DataFrame, text_col: str, discount: float = 0.75
) -> DataFrame:
    """(w1, w2, logp) — interpolated Kneser–Ney log-probability for every
    OBSERVED word bigram:

        P(w2|w1) = (c(w1,w2) − D)/c(w1)
                 + D·N1+(w1,·)/c(w1) · N1+(·,w2)/T

    where N1+(w1,·) = distinct continuations of w1, N1+(·,w2) = distinct
    contexts preceding w2 (the continuation count that makes KN correct
    for high-frequency-but-narrow words like "Francisco"), and T = total
    distinct bigram types. One corpus explode, then hash aggregates over
    the bigram-type table only — the corpus is never re-read. Joins are
    keyed on w1/w2 (vocab-sized sides; AQE broadcasts them when small —
    no forced broadcast, so a 100M-type web vocabulary still plans).

    Unseen-pair mass: for a SEEN context w1, probability not covered by
    this table backs off to λ(w1)·Pcont(w2) with λ(w1)=D·N1+(w1,·)/c(w1)
    — `kn_lm_micro_nats` applies that (or a flat floor for unseen w1)
    when scoring new text under a stored model.
    """
    d = float(discount)
    if not 0.0 < d < 1.0:
        raise ValueError("discount must be in (0, 1)")
    bg = df.select(F.explode(_word_bigrams(text_col)).alias("b")).select(
        "b.w1", "b.w2"
    )
    counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    ctx = counts.groupBy("w1").agg(
        F.sum("c_xy").alias("c_x"), F.count("*").alias("n1p_fwd")
    )
    cont = counts.groupBy("w2").agg(F.count("*").alias("n1p_bwd"))
    t = counts.agg(F.count("*").cast("double").alias("t_types"))
    return (
        counts.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c_xy") - F.lit(d)) / F.col("c_x")
                + F.lit(d)
                * F.col("n1p_fwd")
                / F.col("c_x")
                * (F.col("n1p_bwd") / F.col("t_types"))
            ).alias("logp"),
        )
    )


def kn_lm_micro_nats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame | None = None,
    unseen_logp: float | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """(id, n_bigrams, kn_micro_nats) — mean interpolated-KN
    log-probability of each document's word bigrams, quantized to
    integer micro-nats (`floor(avg·1e6)`, the comparator-exact currency
    used repo-wide). Quantization caveat (applies to every micro-nat
    column in the repo): the average is a double, and Spark's partial
    aggregation may sum logp in a different order than a single-thread
    oracle, so a document whose true mean lies within ~1 ULP of a
    micro-nat boundary could floor differently across engines. In
    practice a boundary hit needs avg·1e6 within ~1e-10 of an integer —
    never observed across the oracle suite — and the failure mode is a
    visible off-by-one in one row, not silent corruption; a comparator
    that must be airtight can allow ±1 on *_micro_nats columns.
    Documents with <2 tokens have no bigrams and drop out. Self-trained (model=None) covers every scored bigram by
    construction; under a stored corpus model, pass ``unseen_logp`` (a
    floor below every seen log-probability, e.g. ``ln(D/(max c_x)·1/T)``)
    so novel-bigram garbage cannot silently vanish from the filter —
    same contract as `char_lm_scores`."""
    ex = df.select(
        F.col(id_col), F.explode(_word_bigrams(text_col)).alias("b")
    ).select(id_col, "b.w1", "b.w2")
    if model is None:
        model = kn_bigram_model(df, text_col, discount)
        scored = ex.join(model, ["w1", "w2"])
    else:
        if unseen_logp is None:
            raise ValueError(
                "scoring under an external model requires unseen_logp "
                "(otherwise unseen bigrams drop and garbage scores high)"
            )
        scored = ex.join(model, ["w1", "w2"], "left").withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))
        )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.avg("logp") * F.lit(1_000_000.0))
        .cast("long")
        .alias("kn_micro_nats"),
    )


# ---------------------------------------------------------------------------
# General-order interpolated Kneser–Ney (n ≥ 2) — the full KenLM shape.
#
# Lower-order statistics are KenLM-style ADJUSTED counts (Heafield 2013
# §3.3; equivalently the "continuation counts" of Chen & Goodman 1999):
# the order-n table holds real corpus counts; every order-k table
# (k < n) holds, for each k-gram u, the number of DISTINCT words w such
# that (w, u) is an observed (k+1)-gram — derived by one groupBy from
# the next table up, so the corpus is exploded exactly once and every
# later aggregate runs over n-gram TYPE tables only.
#
#     P_1(w)        = A_1(w) / Σ A_1
#     P_k(w | ctx)  = (A_k(ctx,w) − D)/Σ_w A_k(ctx,·)
#                     + D·N1+(ctx,·)/Σ_w A_k(ctx,·) · P_{k−1}(w | suffix(ctx))
#
# With a single discount 0 < D < 1 and A ≥ 1 everywhere, the max(·,0)
# clamp of the textbook form is vacuous. For n = 2 this reduces exactly
# to `kn_bigram_model` (pinned by test). Joins are keyed on word tuples
# — vocabulary-sized sides, no forced broadcast, so a web-scale type
# table still plans; the only broadcast is the 1-row Σ A_1 total.
# ---------------------------------------------------------------------------


def _word_ngrams(text_col: str, n: int):
    """Per-row array of struct(g1..gn) word n-grams. Empty for docs
    with < n tokens."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    toks = _word_tokens(text_col)
    return F.transform(
        guarded_positions(F.size(toks) - (n - 1)),
        lambda i: F.struct(
            *[
                F.element_at(toks, i + j).alias(f"g{j + 1}")
                for j in range(n)
            ]
        ),
    )


def kn_ngram_model(
    df: DataFrame, text_col: str, n: int = 3, discount: float = 0.75
) -> DataFrame:
    """(g1..gn, logp) — interpolated Kneser–Ney log-probability for
    every observed word n-gram, with adjusted-count backoff through all
    lower orders down to the continuation unigram (see module comment).
    One corpus explode; everything after runs on type tables."""
    d = float(discount)
    if not 0.0 < d < 1.0:
        raise ValueError("discount must be in (0, 1)")
    if n < 2:
        raise ValueError("kn_ngram_model requires n >= 2")
    grams = df.select(F.explode(_word_ngrams(text_col, n)).alias("g")).select(
        "g.*"
    )
    # adjusted-count tables, A[k] keyed on columns g1..gk (the k-gram):
    # A[n] = real counts; A[k] = distinct-predecessor counts from A[k+1]
    A: dict[int, DataFrame] = {
        n: grams.groupBy(*[f"g{i}" for i in range(1, n + 1)]).agg(
            F.count("*").alias("a")
        )
    }
    for k in range(n - 1, 0, -1):
        A[k] = (
            A[k + 1]
            .groupBy(
                *[
                    F.col(f"g{i}").alias(f"g{i - 1}")
                    for i in range(2, k + 2)
                ]
            )
            .agg(F.count("*").alias("a"))
        )
    tot = A[1].agg(F.sum("a").cast("double").alias("tot"))
    p = A[1].crossJoin(F.broadcast(tot)).select(
        "g1", (F.col("a") / F.col("tot")).alias("p")
    )
    for k in range(2, n + 1):
        ctx_cols = [f"g{i}" for i in range(1, k)]
        ctx = A[k].groupBy(*ctx_cols).agg(
            F.sum("a").alias("denom"), F.count("*").alias("n1p")
        )
        # lower-order table keyed on the SUFFIX (g2..gk of this order)
        lower = p.select(
            *[F.col(f"g{i}").alias(f"g{i + 1}") for i in range(1, k)],
            F.col("p").alias("_p_lower"),
        )
        p = (
            A[k]
            .join(ctx, ctx_cols)
            .join(lower, [f"g{i}" for i in range(2, k + 1)])
            .select(
                *[f"g{i}" for i in range(1, k + 1)],
                (
                    (F.col("a") - F.lit(d)) / F.col("denom")
                    + F.lit(d)
                    * F.col("n1p")
                    / F.col("denom")
                    * F.col("_p_lower")
                ).alias("p"),
            )
        )
    return p.select(
        *[f"g{i}" for i in range(1, n + 1)], F.log("p").alias("logp")
    )


def kn_ngram_micro_nats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    model: DataFrame | None = None,
    unseen_logp: float | None = None,
    discount: float = 0.75,
) -> DataFrame:
    """(id, n_ngrams, kn_micro_nats) — mean interpolated-KN
    log-probability of each document's word n-grams in integer
    micro-nats (same currency and same floor-boundary caveat as
    `kn_lm_micro_nats`). Documents with < n tokens drop out.
    Self-trained covers every scored n-gram; under a stored model,
    ``unseen_logp`` is required so novel-n-gram garbage cannot vanish
    from the filter."""
    keys = [f"g{i}" for i in range(1, n + 1)]
    ex = df.select(
        F.col(id_col), F.explode(_word_ngrams(text_col, n)).alias("g")
    ).select(id_col, *[f"g.{k}" for k in keys])
    if model is None:
        model = kn_ngram_model(df, text_col, n, discount)
        scored = ex.join(model, keys)
    else:
        if unseen_logp is None:
            raise ValueError(
                "scoring under an external model requires unseen_logp "
                "(otherwise unseen n-grams drop and garbage scores high)"
            )
        scored = ex.join(model, keys, "left").withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))
        )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_ngrams"),
        F.floor(F.avg("logp") * F.lit(1_000_000.0))
        .cast("long")
        .alias("kn_micro_nats"),
    )
