"""Char-bigram LM quality scoring (CCNet-style statistical filter)."""

from __future__ import annotations

import math

from tiger_etl_spark.operators import langmodel


def test_model_probabilities_are_smoothed_and_normalized(spark):
    df = spark.createDataFrame([(1, "abab")], "id long, text string")
    model = {r["bg"]: r["logp"] for r in langmodel.char_bigram_model(df, "text").collect()}
    # bigrams: ab, ba, ab → c(ab)=2, c(ba)=1; prefixes a:2, b:1; V=2
    assert set(model) == {"ab", "ba"}
    assert math.isclose(model["ab"], math.log(3 / 4))
    assert math.isclose(model["ba"], math.log(2 / 3))


def test_repetitive_text_scores_higher_than_rare_text(spark):
    docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    docs.append((100, "zzqx jkvw qqzx"))  # bigrams rare in the corpus
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scores = {r["doc_id"]: r["avg_logp"] for r in langmodel.char_lm_scores(df, "doc_id", "text").collect()}
    assert scores[100] < scores[0]


def test_short_docs_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = langmodel.char_lm_scores(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {1}
    assert out[0]["n_bigrams"] == 10


def test_external_model_scores_new_docs(spark):
    train = spark.createDataFrame(
        [(i, "hello world hello") for i in range(5)], "doc_id long, text string"
    )
    model = langmodel.char_bigram_model(train, "text")
    new = spark.createDataFrame([(9, "hello")], "doc_id long, text string")
    out = langmodel.char_lm_scores(
        new, "doc_id", "text", model=model, unseen_logp=-50.0
    ).collect()
    assert len(out) == 1 and out[0]["n_bigrams"] == 4


def test_external_model_scores_unseen_bigrams(spark):
    """A document whose bigrams the stored model never saw must get the
    penalty score, not silently vanish from the filter's view."""
    import pytest as _pt

    from tiger_etl_spark.operators.langmodel import (
        char_bigram_model,
        char_lm_scores,
    )

    train = spark.createDataFrame(
        [(1, "aaab"), (2, "abab")], "doc_id long, text string"
    )
    model = char_bigram_model(train, "text")
    new = spark.createDataFrame(
        [(10, "abab"), (11, "zzzz")], "doc_id long, text string"
    )
    with _pt.raises(ValueError, match="unseen_logp"):
        char_lm_scores(new, "doc_id", "text", model=model)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in char_lm_scores(
            new, "doc_id", "text", model=model, unseen_logp=-50.0
        ).collect()
    }
    assert 11 in got  # all-novel doc present...
    assert got[11] == (3, -50.0)  # ...at the penalty floor
    assert got[10][1] > -50.0  # seen bigrams score from the model
