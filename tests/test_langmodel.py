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


def _scored_lang_df(spark):
    """12 docs in 2 langs with clearly separated quality tiers."""
    natural = "the quick brown fox jumps over the lazy dog and runs home "
    noisy = "qzxj wvkq zzqx jxqv kqzw xjqz vqkx "
    rows = []
    for i in range(6):
        # mix: doc 0/1 pure natural ... doc 4/5 pure noise
        k = i // 2
        rows.append((i, "en", natural * (3 - k) + noisy * k))
        rows.append((10 + i, "fr", natural * (3 - k) + noisy * k))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_micro_nats_quantize_the_average(spark):
    df = _scored_lang_df(spark)
    d = {r["doc_id"]: r for r in langmodel.char_lm_scores(df, "doc_id", "text", scale=9).collect()}
    m = {r["doc_id"]: r for r in langmodel.char_lm_micro_nats(df, "doc_id", "text").collect()}
    assert set(d) == set(m)
    for i in d:
        assert m[i]["n_bigrams"] == d[i]["n_bigrams"]
        # floor(avg*1e6) within 1 of round-9-then-floor
        import math
        assert abs(m[i]["lm_micro_nats"] - math.floor(d[i]["avg_logp"] * 1e6)) <= 1


def test_ccnet_buckets_rank_exact(spark):
    df = _scored_lang_df(spark)
    scores = langmodel.char_lm_micro_nats(df, "doc_id", "text").join(
        df.select("doc_id", "lang"), "doc_id"
    )
    out = langmodel.ccnet_buckets(scores, "doc_id", "lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert len(rows) == 6
        labels = {r["lm_bucket"] for r in rows}
        assert labels == {"head", "middle", "tail"}
        # equal-depth: 2 docs per bucket
        from collections import Counter
        assert Counter(r["lm_bucket"] for r in rows) == Counter(
            {"head": 2, "middle": 2, "tail": 2}
        )
        # head buckets hold the highest (most natural) scores
        ranked = sorted(rows, key=lambda r: (-r["lm_micro_nats"], r["doc_id"]))
        assert [r["lm_bucket"] for r in ranked] == [
            "head", "head", "middle", "middle", "tail", "tail"
        ]


def test_threshold_assignment_matches_rank_path_off_boundaries(spark):
    df = _scored_lang_df(spark)
    scores = langmodel.char_lm_micro_nats(df, "doc_id", "text").join(
        df.select("doc_id", "lang"), "doc_id"
    )
    exact = langmodel.ccnet_buckets(scores, "doc_id", "lang")
    th = langmodel.ccnet_bucket_thresholds(exact, "lang")
    assigned = langmodel.assign_buckets(scores, th, "lang")
    got = {r["doc_id"]: r["lm_bucket"] for r in assigned.collect()}
    want = {r["doc_id"]: r["lm_bucket"] for r in exact.collect()}
    # distinct integer scores here => threshold path reproduces ranks
    assert got == want


def test_assign_buckets_below_all_thresholds_goes_to_tail(spark):
    scores = spark.createDataFrame(
        [(1, "en", -999_000_000)], "doc_id long, lang string, lm_micro_nats long"
    )
    th = spark.createDataFrame(
        [("en", "head", -100), ("en", "middle", -200), ("en", "tail", -300)],
        "lang string, lm_bucket string, min_score long",
    )
    out = langmodel.assign_buckets(scores, th, "lang").collect()
    assert out[0]["lm_bucket"] == "tail"


def test_feature_hash_score_null_text_behaves_like_empty(spark):
    # NULL text must match the oracle's empty-text semantics (0 tokens,
    # score 0, keep=true) — not size(split(NULL)) = -1 / NULL score.
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "hello world")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in langmodel.feature_hash_score(df, "doc_id", "text").collect()
    }
    for did in (1, 2, 3):
        assert rows[did]["n_tokens"] == 0
        assert rows[did]["score"] == 0
        assert rows[did]["keep"] is True
    assert rows[4]["n_tokens"] == 2
    assert rows[4]["score"] is not None


def _py_kn(docs, discount=0.75):
    """Independent single-threaded interpolated-KN reimplementation
    (dict arithmetic, no Spark) used as the parity oracle."""
    import math
    from collections import Counter, defaultdict

    bigrams = Counter()
    for _, text in docs:
        toks = [w for w in text.lower().strip().split() if w]
        for a, b in zip(toks, toks[1:]):
            bigrams[(a, b)] += 1
    c_x = defaultdict(int)
    n1p_fwd = defaultdict(int)
    n1p_bwd = defaultdict(int)
    for (a, b), c in bigrams.items():
        c_x[a] += c
        n1p_fwd[a] += 1
        n1p_bwd[b] += 1
    t = len(bigrams)

    def prob(a, b):
        disc = max(bigrams.get((a, b), 0) - discount, 0.0)
        lam = discount * n1p_fwd[a] / c_x[a] if a in c_x else 1.0
        pcont = n1p_bwd.get(b, 0) / t
        return disc / c_x[a] + lam * pcont if a in c_x else pcont

    scores = {}
    for did, text in docs:
        toks = [w for w in text.lower().strip().split() if w]
        lps = [math.log(prob(a, b)) for a, b in zip(toks, toks[1:])]
        if lps:
            scores[did] = (len(lps), math.floor(sum(lps) / len(lps) * 1e6))
    return bigrams, c_x, n1p_fwd, n1p_bwd, t, prob, scores


_KN_DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog and a bird"),
    (4, "the cat the cat the cat"),
    (5, "one-token"),
    (6, "   "),
]


def test_kn_model_matches_independent_reimplementation(spark):
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r["logp"]
        for r in langmodel.kn_bigram_model(df, "text").collect()
    }
    bigrams, *_rest, prob, _ = _py_kn(_KN_DOCS)
    assert set(got) == set(bigrams)
    for (a, b), lp in got.items():
        assert abs(lp - math.log(prob(a, b))) < 1e-12, (a, b)


def test_kn_probabilities_sum_to_one_per_seen_context(spark):
    """Interpolated KN must be a proper distribution: for every seen
    context w1, P over the WHOLE continuation vocabulary (seen pairs by
    the model, unseen via λ(w1)·Pcont) sums to 1."""
    bigrams, c_x, n1p_fwd, n1p_bwd, t, prob, _ = _py_kn(_KN_DOCS)
    vocab = set(n1p_bwd) | set(c_x)
    for a in c_x:
        total = sum(prob(a, b) for b in vocab)
        # vocab for Pcont is "words with at least one context" — words
        # never appearing as w2 contribute 0, so total is exactly 1
        assert abs(total - 1.0) < 1e-9, (a, total)


def test_kn_micro_nats_scores_and_dropout(spark):
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_micro_nats"])
        for r in langmodel.kn_lm_micro_nats(df, "doc_id", "text").collect()
    }
    *_ignored, scores = _py_kn(_KN_DOCS)
    assert got == scores          # bit-exact micro-nats vs reimplementation
    assert 5 not in got and 6 not in got  # <2 tokens -> no bigrams -> drop
    # the repetitive doc (4) scores higher than the diverse one (3)
    assert got[4][1] > got[3][1]


def _py_kn_ngram(docs, n=3, discount=0.75):
    """Independent single-thread reimplementation of general-order
    interpolated KN with KenLM-style adjusted counts — the oracle for
    kn_ngram_model/kn_ngram_micro_nats."""
    from collections import defaultdict

    counts = defaultdict(int)
    doc_grams = {}
    for did, text in docs:
        toks = [w for w in text.lower().strip().split() if w]
        gs = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        doc_grams[did] = gs
        for g in gs:
            counts[g] += 1
    A = {n: dict(counts)}
    for k in range(n - 1, 0, -1):
        ak = defaultdict(int)
        for g in A[k + 1]:
            ak[g[1:]] += 1
        A[k] = dict(ak)
    denom, n1p = {}, {}
    for k in range(2, n + 1):
        dk, nk = defaultdict(int), defaultdict(int)
        for g, a in A[k].items():
            dk[g[:-1]] += a
            nk[g[:-1]] += 1
        denom[k], n1p[k] = dk, nk
    tot = sum(A[1].values())

    def prob(gram):
        k = len(gram)
        if k == 1:
            return A[1].get(gram, 0) / tot
        ctx = gram[:-1]
        lower = prob(gram[1:])
        if ctx not in denom[k]:
            return lower
        a = A[k].get(gram, 0)
        return (
            max(a - discount, 0.0) / denom[k][ctx]
            + discount * n1p[k][ctx] / denom[k][ctx] * lower
        )

    scores = {}
    for did, gs in doc_grams.items():
        lps = [math.log(prob(g)) for g in gs]
        if lps:
            scores[did] = (len(lps), math.floor(sum(lps) / len(lps) * 1e6))
    return A, denom, n1p, tot, prob, scores


def test_kn_ngram_trigram_matches_independent_reimplementation(spark):
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        (r["g1"], r["g2"], r["g3"]): r["logp"]
        for r in langmodel.kn_ngram_model(df, "text", n=3).collect()
    }
    A, *_rest, prob, _ = _py_kn_ngram(_KN_DOCS, n=3)
    assert set(got) == set(A[3])
    for g, lp in got.items():
        assert abs(lp - math.log(prob(g))) < 1e-12, g


def test_kn_ngram_order2_reduces_to_bigram_model(spark):
    """n=2 under the general recursion must reproduce kn_bigram_model
    exactly — adjusted counts at order 1 ARE the continuation counts."""
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    big = {
        (r["w1"], r["w2"]): r["logp"]
        for r in langmodel.kn_bigram_model(df, "text").collect()
    }
    gen = {
        (r["g1"], r["g2"]): r["logp"]
        for r in langmodel.kn_ngram_model(df, "text", n=2).collect()
    }
    assert set(big) == set(gen)
    for k in big:
        assert abs(big[k] - gen[k]) < 1e-12, k


def test_kn_ngram_probabilities_sum_to_one_per_seen_context(spark):
    """For every seen trigram context (w1,w2), P(w3|w1,w2) over the
    whole vocabulary — seen trigrams through the model, unseen through
    the backoff chain — sums to exactly 1."""
    A, denom, n1p, tot, prob, _ = _py_kn_ngram(_KN_DOCS, n=3)
    vocab = {g[0] for g in A[1]} | {g[-1] for g in A[3]} | {
        g[0] for g in A[3]
    }
    for ctx in denom[3]:
        total = sum(prob(ctx + (w,)) for w in vocab)
        assert abs(total - 1.0) < 1e-9, (ctx, total)


def test_kn_ngram_order4_matches_reimplementation(spark):
    """The recursion is order-generic: n=4 (one step beyond anything
    hand-written) must still match the independent reimplementation
    bit-exactly in micro-nats."""
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["kn_micro_nats"])
        for r in langmodel.kn_ngram_micro_nats(
            df, "doc_id", "text", n=4
        ).collect()
    }
    *_ignored, scores = _py_kn_ngram(_KN_DOCS, n=4)
    assert got == scores
    assert 5 not in got and 6 not in got  # <4 tokens drop


def test_kn_ngram_micro_nats_scores_and_dropout(spark):
    df = spark.createDataFrame(_KN_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_ngrams"], r["kn_micro_nats"])
        for r in langmodel.kn_ngram_micro_nats(df, "doc_id", "text", n=3).collect()
    }
    *_ignored, scores = _py_kn_ngram(_KN_DOCS, n=3)
    assert got == scores  # bit-exact micro-nats vs reimplementation
    assert 5 not in got and 6 not in got  # <3 tokens -> no trigrams


def test_kn_ngram_external_model_requires_unseen_floor(spark):
    import pytest as _pt

    df = spark.createDataFrame(_KN_DOCS[:4], "doc_id long, text string")
    model = langmodel.kn_ngram_model(df, "text", n=3)
    with _pt.raises(ValueError, match="unseen_logp"):
        langmodel.kn_ngram_micro_nats(df, "doc_id", "text", n=3, model=model)
    new = spark.createDataFrame(
        [(9, "zzz qqq vvv www")], "doc_id long, text string"
    )
    out = langmodel.kn_ngram_micro_nats(
        new, "doc_id", "text", n=3, model=model, unseen_logp=-20.0
    ).collect()
    assert out[0]["n_ngrams"] == 2
    assert out[0]["kn_micro_nats"] == -20_000_000


def test_kn_external_model_requires_unseen_floor(spark):
    import pytest as _pt

    df = spark.createDataFrame(_KN_DOCS[:4], "doc_id long, text string")
    model = langmodel.kn_bigram_model(df, "text")
    with _pt.raises(ValueError, match="unseen_logp"):
        langmodel.kn_lm_micro_nats(df, "doc_id", "text", model=model)
    new = spark.createDataFrame(
        [(9, "zzz qqq vvv www")], "doc_id long, text string"
    )
    out = langmodel.kn_lm_micro_nats(
        new, "doc_id", "text", model=model, unseen_logp=-20.0
    ).collect()
    assert out[0]["n_bigrams"] == 3
    assert out[0]["kn_micro_nats"] == -20_000_000
