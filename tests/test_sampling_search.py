"""Unit tests for sampling/split, vocabulary/TF-IDF search, SimHash
Hamming pairs, and IVF ANN operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tiger_etl_spark.operators import dedup, sampling, search, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


# ------------------------------------------------------------- hash_split
def test_hash_split_total_and_determinism(docs):
    out = sampling.hash_split(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    assert out.count() == docs.count()
    # assignment is a pure function of the id: repartitioning must not
    # move any row between splits
    a = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in sampling.hash_split(
            docs.repartition(7), "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
        )
        .select("doc_id", "split")
        .collect()
    }
    assert a == b
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.8 < frac_train < 0.97


def test_hash_split_no_shuffle(docs):
    out = sampling.hash_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------- mixture_epochs
def test_mixture_epochs_integer_arithmetic(spark):
    """Epoch factors are pure integer division of the uniform-target
    share: with an explicit budget the expected ppm is computable by
    hand; the corpus-total default re-balances (small source > 1 epoch,
    large < 1)."""
    rows = [("a", 100)] * 10 + [("b", 300)] * 30
    df = spark.createDataFrame(rows, "source string, n_tok long")
    # explicit budget 20_000 over 2 sources → 10_000 tokens/source:
    # a has 1_000 tokens → 10.0 epochs; b has 9_000 → 1.111111
    out = {
        r["source"]: r
        for r in sampling.mixture_epochs(
            df, "source", "n_tok", budget_tokens=20_000
        ).collect()
    }
    assert out["a"]["n_docs"] == 10 and out["a"]["n_tokens"] == 1_000
    assert out["a"]["epochs_ppm"] == 10_000_000
    assert out["b"]["epochs_ppm"] == (1_000_000 * 20_000) // (2 * 9_000)
    # default budget = corpus total (10_000): a → 5.0 epochs, b → 0.555...
    out2 = {
        r["source"]: r["epochs_ppm"]
        for r in sampling.mixture_epochs(df, "source", "n_tok").collect()
    }
    assert out2["a"] == 5_000_000
    assert out2["b"] == (1_000_000 * 10_000) // (2 * 9_000)


# --------------------------------------------------------- shuffle_assign
def test_shuffle_assign_is_dense_permutation(docs):
    """(shard, pos) must be a full permutation: every shard's positions
    are exactly 0..n_s-1, total rows preserved, and the whole assignment
    is a pure function of (salt, id) — invariant under repartitioning."""
    out = sampling.shuffle_assign(docs, "doc_id", salt="ep0", num_shards=8)
    n = docs.count()
    assert out.count() == n
    per = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.count_distinct("pos").alias("d"),
        )
        .collect()
    )
    assert len(per) == 8
    for r in per:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"]
        # rough uniformity: no shard more than 2x the fair share
        assert r["n"] < 2 * n / 8
    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in out.collect()}
    b = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in sampling.shuffle_assign(
            docs.repartition(13), "doc_id", salt="ep0", num_shards=8
        ).collect()
    }
    assert a == b


def test_shuffle_assign_salt_changes_permutation(docs):
    """A different salt must produce a genuinely different permutation
    (fresh epoch order), while each remains internally dense."""
    a = sampling.shuffle_assign(docs, "doc_id", salt="ep0", num_shards=8)
    b = sampling.shuffle_assign(docs, "doc_id", salt="ep1", num_shards=8)
    joined = a.alias("a").join(b.alias("b"), "doc_id").select(
        (
            (F.col("a.shard") == F.col("b.shard"))
            & (F.col("a.pos") == F.col("b.pos"))
        ).cast("int").alias("same")
    )
    frac_same = joined.agg(F.avg("same")).first()[0]
    assert frac_same < 0.05


def test_shuffle_assign_single_exchange(docs):
    """The permutation costs exactly one exchange (on `shard`) — no
    global sort / range partitioning anywhere in the plan."""
    out = sampling.shuffle_assign(docs, "doc_id", salt="x", num_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()


# ----------------------------------------------------- stratified_sample
def test_stratified_sample_matches_full_rank(docs):
    """The hash-threshold prefilter must not change the selected set:
    compare against the unbounded rank over the full stratum."""
    got = sampling.stratified_sample(docs, "lang", "doc_id", 10)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    want = (
        docs.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 10)
        .drop("_rk")
    )
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in want.select("doc_id").collect()
    )
    per = got.groupBy("lang").count().collect()
    full = dict(docs.groupBy("lang").count().collect())
    for r in per:
        assert r["count"] == min(10, full[r["lang"]])


# ------------------------------------------------------------ top_tokens
def test_top_tokens_matches_python(docs):
    got = search.top_tokens(docs, "doc_id", "text", k=5).collect()
    import collections
    import re

    occ: collections.Counter = collections.Counter()
    dfreq: dict[str, set] = {}
    for row in docs.select("doc_id", "text").collect():
        toks = [t for t in re.split("[^a-z0-9]+", row["text"].lower()) if t]
        occ.update(toks)
        for t in set(toks):
            dfreq.setdefault(t, set()).add(row["doc_id"])
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["occurrences"]) for r in got] == want
    for r in got:
        assert r["doc_freq"] == len(dfreq[r["token"]])


def test_tfidf_search_prefers_term_heavy_docs(docs):
    out = search.tfidf_search(docs, "doc_id", "text", ["vector", "merge"], k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # top hit must actually contain a query term
    top_doc = docs.where(F.col("doc_id") == rows[0]["doc_id"]).collect()[0]
    assert "vector" in top_doc["text"] or "merge" in top_doc["text"]


# --------------------------------------------------------- simhash_pairs
def test_simhash_pairs_banding_is_exact(spark, docs):
    """Banded pruning (d < bands) must find exactly the brute-force
    pair set."""
    sigs = dedup.simhash(docs, "doc_id", "text", bits=32).persist()
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(sigs, "doc_id", max_hamming=3).collect()
    }
    rows = sigs.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            x, y = (a, b) if a["doc_id"] < b["doc_id"] else (b, a)
            h = bin(x["simhash"] ^ y["simhash"]).count("1")
            if h <= 3:
                want.add((x["doc_id"], y["doc_id"], h))
    assert got == want
    sigs.unpersist()


def test_simhash_pairs_rejects_unsound_band_config(spark, docs):
    sigs = dedup.simhash(docs, "doc_id", "text", bits=32)
    with pytest.raises(ValueError):
        dedup.simhash_pairs(sigs, "doc_id", max_hamming=4, bands=4)


# -------------------------------------------------------------- ivf_topk
_QUERY = [((i * 37) % 17 - 8) / 8.0 for i in range(64)]


def test_ivf_full_probe_equals_exact(embeddings):
    """Probing every cell degenerates to exact brute-force top-k."""
    exact = similarity.cosine_topk(embeddings, "vec_id", "embedding", _QUERY, 10)
    ivf = similarity.ivf_topk(
        embeddings, "vec_id", "embedding", _QUERY, 10, n_cells=16, nprobe=16
    )
    assert [r["vec_id"] for r in ivf.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]


def test_ivf_partial_probe_recall(embeddings):
    """nprobe=4/16 must still recover most of the exact top-10 (the
    cells are random, not learned, so demand a loose bound) and scan
    only a fraction of the corpus."""
    exact = {r["vec_id"] for r in similarity.cosine_topk(
        embeddings, "vec_id", "embedding", _QUERY, 10).collect()}
    cells = similarity.build_ivf_cells(embeddings, "embedding", 16, 64).persist()
    got = {r["vec_id"] for r in similarity.ivf_topk(
        embeddings, "vec_id", "embedding", _QUERY, 10,
        n_cells=16, nprobe=8, cell_df=cells).collect()}
    # random (unlearned) centroids: probing 8/16 cells recovers well
    # over the ~50% base rate because neighbors correlate with the
    # query's cells; learned k-means centroids would tighten this
    assert len(got & exact) >= 4
    probe = similarity.ivf_probe_cells(_QUERY, 16, 8)
    n_scanned = cells.where(F.col("_cell").isin(probe)).count()
    assert n_scanned < embeddings.count()
    cells.unpersist()


# ---------------------------------------------------------------- DSIR


def test_dsir_ranks_target_like_docs_first(spark):
    """Planted corpus: raw docs are either 'sports prose' (matching the
    target distribution) or 'markup noise'; DSIR must rank every
    sports doc above every noise doc, and weights must be integral
    micro-nats (engine-exact arithmetic)."""
    from tiger_etl_spark.operators import dsir

    sports = "the match ended with a late goal and the crowd sang all night"
    noise = "zz9 qq8 xx7 vv6 kk5 jj4 hh3 gg2 ff1 ee0 dd9 cc8 bb7 aa6"
    raw_rows = [(i, sports + f" extra{i % 3}") for i in range(10)] + [
        (100 + i, noise + f" tail{i % 3}") for i in range(10)
    ]
    target_rows = [(1000 + i, sports + f" bonus{i % 2}") for i in range(5)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")

    out = dsir.dsir_select(raw, target, n_buckets=512, k=20).collect()
    assert len(out) == 20
    ranked = [r["doc_id"] for r in out]
    assert set(ranked[:10]) == set(range(10))  # all sports docs first
    assert all(isinstance(r["weight_micro"], int) for r in out)
    # weights strictly separate the two populations
    w_sports = min(r["weight_micro"] for r in out if r["doc_id"] < 100)
    w_noise = max(r["weight_micro"] for r in out if r["doc_id"] >= 100)
    assert w_sports > w_noise


def test_dsir_models_cover_full_bucket_space(spark):
    from tiger_etl_spark.operators import dsir

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    counts = dsir.hashed_gram_counts(df, "doc_id", "text", n_buckets=64)
    model = dsir.fit_bucket_logprobs(counts, n_buckets=64)
    rows = model.collect()
    assert len(rows) == 64  # absent buckets present at the smoothing floor
    assert all(r["logp_micro"] < 0 for r in rows)
