"""Distributed BPE (byte-pair-encoding) vocabulary learning —
tokenizer training over the corpus, the Sennrich et al. 2016 algorithm
re-expressed as iterated Spark aggregations.

The reference has no tokenizer surface (its only text analysis is the
substring UA classifier,
/root/reference/modules/authentication_management/session_manager.py:208-247);
this is a beyond-reference capability a training-data pipeline needs:
the learned merge table IS the tokenizer, and per-doc BPE token counts
feed sequence packing and cost estimation.

Algorithm (classic BPE, trained on the word-frequency dict — never the
raw corpus):

    state   = (symbols: array<string>, cnt) per distinct word,
              symbols = characters + '</w>' end marker
    repeat n_merges times:
        pair counts  = explode adjacent symbol pairs, weighted by cnt
        best         = argmax (count desc, pair asc — deterministic)
        state        = greedy left-to-right merge of `best` in every
                       word that contains it

Scale shape (100 TB): the corpus is touched ONCE (the word-count
aggregation — distinct words, not occurrences, typically 10–100M rows
at web scale). Each merge iteration then runs on the word table only:
one map-side-combined pair aggregation, a 1-row argmax to the driver
(the only driver traffic), and a filtered Arrow-batched merge apply
that rewrites ONLY the words containing the chosen pair (vanishingly
few after the early merges). Lineage is cut with localCheckpoint each
iteration so the plan stays flat across hundreds of merges. Real
tokenizer trainers also prune the word table to the top-K words by
count first — `max_words` does that with a deterministic tie-break.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

_TOKEN_SPLIT = "[^a-z0-9]+"
END = "</w>"


def word_counts(
    df: DataFrame, text_col: str, max_words: int | None = None
) -> DataFrame:
    """(word, cnt) over the corpus: lowercase, split on non-alphanumeric
    runs. One explode + one map-side-combined aggregation — the single
    full-corpus pass of BPE training. `max_words` keeps the top-K words
    by (cnt desc, word) — the standard prune before the merge loop."""
    w = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), _TOKEN_SPLIT),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    if max_words is not None:
        w = w.orderBy(F.desc("cnt"), F.col("word")).limit(max_words)
    return w


def _initial_state(words: DataFrame) -> DataFrame:
    """(syms, cnt): each word as its character sequence + '</w>'.
    Spark's split keeps a trailing empty match ('ab' -> [a, b, '']), so
    the empty strings are filtered before appending the end marker."""
    return words.select(
        F.concat(
            F.filter(
                F.split(F.col("word"), "(?!^)"), lambda c: c != ""
            ),
            F.array(F.lit(END)),
        ).alias("syms"),
        "cnt",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies weighted by word count. The transform/
    explode is JVM-side; the aggregation combines map-side."""
    pairs = F.expr(
        "transform(sequence(1, size(syms) - 1),"
        " i -> struct(syms[i-1] AS a, syms[i] AS b))"
    )
    return (
        state.where(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "cnt")
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )


def merge_word(syms: Sequence[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right merge of adjacent (a, b) → a+b — the exact
    in-word semantics of reference BPE (overlaps resolve leftmost:
    'aaa' under (a,a) → ['aa', 'a'])."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply_merge(state: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite ONLY the words containing the (a, b) pair via an
    Arrow-batched pandas UDF (words are short — the per-word Python
    loop is the standard implementation); untouched words pass through
    with no Python."""

    @pandas_udf(T.ArrayType(T.StringType()))
    def do_merge(s: pd.Series) -> pd.Series:
        return s.map(lambda syms: merge_word(list(syms), a, b))

    idx = F.sequence(F.lit(1), F.size("syms") - 1)
    has_pair = (F.size("syms") >= 2) & F.exists(
        idx,
        lambda i: (F.element_at("syms", i) == F.lit(a))
        & (F.element_at("syms", i + 1) == F.lit(b)),
    )
    changed = state.where(has_pair).select(
        do_merge(F.col("syms")).alias("syms"), "cnt"
    )
    return state.where(~has_pair).unionByName(changed)


def _bpe_train_driver(
    word_cnt: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[str, str, int]]:
    """Single-node merge loop over a collected (word, cnt) dict — same
    semantics as the distributed loop (count desc, (a, b) asc ties,
    min_count early stop). Real tokenizer trainers run exactly this on
    the word dict; the distributed loop is for vocabularies too large
    to collect."""
    state = [(list(w) + [END], c) for w, c in word_cnt]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in state:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((a, b, n))
        state = [
            (merge_word(syms, a, b) if _contains_pair(syms, a, b) else syms, c)
            for syms, c in state
        ]
    return merges


def _contains_pair(syms: Sequence[str], a: str, b: str) -> bool:
    return any(
        syms[i] == a and syms[i + 1] == b for i in range(len(syms) - 1)
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    min_count: int = 2,
    driver_word_limit: int = 2_000_000,
) -> list[tuple[str, str, int]]:
    """Learn up to `n_merges` BPE merges from a (word, cnt) table.
    Returns [(a, b, pair_count)] in merge order — the tokenizer. Stops
    early when the best pair's count drops below `min_count` (nothing
    left worth merging). Deterministic: ties break by (a, b).

    Two regimes (the connected-components pattern, operators/dedup.py):
    if the distinct-word table fits under `driver_word_limit` rows it
    is collected ONCE and the merge loop runs on the driver — a word
    dict is a few hundred MB at web scale and the loop is pure dict
    arithmetic, which no cluster round-trip can beat. Above the limit
    (or with driver_word_limit=0) the fully distributed loop runs:
    per iteration one map-side-combined pair aggregation, a 1-row
    argmax, and an Arrow-batched rewrite of only the words containing
    the chosen pair."""
    if driver_word_limit:
        probe = words.limit(driver_word_limit + 1).count()
        if probe <= driver_word_limit:
            rows = words.select("word", "cnt").collect()
            return _bpe_train_driver(
                [(r["word"], int(r["cnt"])) for r in rows],
                n_merges,
                min_count,
            )
    state = _initial_state(words).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            _pair_counts(state)
            .orderBy(F.desc("n"), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] < min_count:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        # localCheckpoint cuts lineage so the plan stays flat across
        # hundreds of iterations (no nested-union blowup)
        state = _apply_merge(state, a, b).localCheckpoint(eager=True)
    return merges


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Merge table as a DataFrame: (rank, a, b, pair_count)."""
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "rank int, a string, b string, pair_count long",
    )


def encode_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply the learned merges to one word (driver-side helper for
    tests/inspection — bulk encoding belongs in a pandas UDF over a
    broadcast merge list)."""
    syms = list(word) + [END]
    for a, b, _ in merges:
        syms = merge_word(syms, a, b)
    return syms


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str, int]],
) -> DataFrame:
    """(id, n_bpe_tokens): encode every doc with the learned tokenizer
    — the real token counter for packing/cost estimation. The merge
    list rides to executors inside the Arrow UDF closure (it is a few
    KB); per-word encode results are memoized per batch, so the Python
    cost is O(distinct words per batch), not O(occurrences)."""
    import re

    pat = re.compile(_TOKEN_SPLIT)
    mlist = [(a, b) for a, b, _ in merges]

    @pandas_udf(T.LongType())
    def n_tokens(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def enc_len(word: str) -> int:
            got = cache.get(word)
            if got is None:
                syms = list(word) + [END]
                for a, b in mlist:
                    if len(syms) >= 2:
                        syms = merge_word(syms, a, b)
                got = len(syms)
                cache[word] = got
            return got

        def count(text) -> int:
            if text is None:
                return 0
            return sum(
                enc_len(w) for w in pat.split(text.lower()) if w != ""
            )

        return s.map(count)

    return df.select(F.col(id_col), n_tokens(F.col(text_col)).alias("n_bpe_tokens"))
