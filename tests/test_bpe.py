"""BPE vocabulary learning: distributed trainer vs a single-threaded
reference implementation of the Sennrich et al. 2016 algorithm."""

from __future__ import annotations

import re

from tiger_etl_spark.operators import bpe


def _ref_bpe(word_cnt: dict[str, int], n_merges: int, min_count: int = 2):
    """Reference BPE: dict-based, same tie-break (count desc, pair asc)."""
    state = {w: (list(w) + [bpe.END], c) for w, c in word_cnt.items()}
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in state.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < min_count:
            break
        merges.append((a, b, n))
        state = {
            w: (bpe.merge_word(syms, a, b), c) for w, (syms, c) in state.items()
        }
    return merges


def _word_counts_py(texts: list[str]) -> dict[str, int]:
    pat = re.compile("[^a-z0-9]+")
    out: dict[str, int] = {}
    for t in texts:
        for w in pat.split(t.lower()):
            if w:
                out[w] = out.get(w, 0) + 1
    return out


TEXTS = [
    "the lowest newer wider lower newest widest low new wide",
    "low low lower lowest newer newer newest wide wider widest",
    "the the the new new newer est est ests",
    "lowly newly widely lowness newness wideness",
]


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    wc = bpe.word_counts(df, "text")
    got = bpe.bpe_train(wc, n_merges=25)
    want = _ref_bpe(_word_counts_py(TEXTS), 25)
    assert got == want
    assert len(got) >= 10  # the corpus supports a real merge sequence


def test_bpe_distributed_regime_matches_driver_regime(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    wc = bpe.word_counts(df, "text")
    # driver_word_limit=0 forces the fully distributed merge loop
    got = bpe.bpe_train(wc, n_merges=8, driver_word_limit=0)
    want = _ref_bpe(_word_counts_py(TEXTS), 8)
    assert got == want


def test_merge_word_overlap_is_leftmost_greedy():
    assert bpe.merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert bpe.merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert bpe.merge_word(["x", "a", "b", "y"], "a", "b") == ["x", "ab", "y"]


def test_encode_and_token_counts_match_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    merges = bpe.bpe_train(bpe.word_counts(df, "text"), n_merges=15)
    # driver-side encode agrees with applying merges step by step
    assert bpe.encode_word("lowest", merges)[-1].endswith(bpe.END)
    # distributed token counts == per-doc sum of reference encode lengths
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_counts(df, "doc_id", "text", merges).collect()
    }
    pat = re.compile("[^a-z0-9]+")
    for i, t in enumerate(TEXTS):
        want = sum(
            len(bpe.encode_word(w, merges))
            for w in pat.split(t.lower())
            if w
        )
        assert got[i] == want


def test_bpe_early_stop_on_min_count(spark):
    df = spark.createDataFrame([(1, "a b c d e f g h")],
                               "doc_id long, text string")
    # every word is a single char: each (ch, </w>) pair has count 1
    merges = bpe.bpe_train(bpe.word_counts(df, "text"), n_merges=10)
    assert merges == []


def test_max_words_prunes_deterministically(spark):
    df = spark.createDataFrame([(1, "aa aa aa bb bb cc")],
                               "doc_id long, text string")
    top = {r["word"] for r in bpe.word_counts(df, "text", max_words=2).collect()}
    assert top == {"aa", "bb"}
