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
    ex = df.select(F.col(id_col), F.explode(_char_bigrams(text_col)).alias("bg"))
    if model is None:
        model = char_bigram_model(df, text_col)
        scored = ex.join(F.broadcast(model), "bg")
    else:
        if unseen_logp is None:
            raise ValueError(
                "scoring under an external model requires unseen_logp "
                "(otherwise unseen bigrams drop and garbage scores high)"
            )
        scored = ex.join(F.broadcast(model), "bg", "left").withColumn(
            "logp", F.coalesce(F.col("logp"), F.lit(float(unseen_logp)))
        )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("logp"), scale).alias("avg_logp"),
        )
    )
