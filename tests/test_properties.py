"""Property-based tests (SURVEY.md §5.5/§5.6): random event interleavings
per key — invariant: final state equals the max-(warc_ts, op_seq)
non-deleted event per url, regardless of batch split. Plus the
vectorization guard and the byte-identical extraction invariant."""

from __future__ import annotations

import datetime as dt
import glob
import os
import subprocess

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiger_etl_spark.cdc.pipeline import apply_changes, create_pages_table
from tiger_etl_spark.functions.text import extract_text_py, extract_text_udf

UTC = dt.timezone.utc
BASE = dt.datetime(2025, 1, 1, tzinfo=UTC)

# small universes force heavy key collisions and ts ties
event_st = st.tuples(
    st.sampled_from(["I", "U", "D"]),
    st.sampled_from(["u0", "u1", "u2"]),        # url
    st.integers(min_value=0, max_value=5),      # ts offset seconds
    st.binary(min_size=0, max_size=12),         # payload
)


def expected_state(events):
    """events: list of (op, url, ts, seq, payload) — pure-Python LWW."""
    best = {}
    for op, url, ts, seq, payload in events:
        cur = best.get(url)
        if cur is None or (ts, seq) > (cur[1], cur[2]):
            best[url] = (op, ts, seq, payload)
    return {
        u: (ts, seq, payload)
        for u, (op, ts, seq, payload) in best.items()
        if op != "D"
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=24),
    split=st.integers(min_value=1, max_value=5),
)
def test_lww_invariant_any_interleaving(spark, tmp_path_factory, events, split):
    from tiger_etl_spark.lake import LakeTable

    rows = [
        (op, i + 1, url, BASE + dt.timedelta(seconds=ts), bytes(payload))
        for i, (op, url, ts, payload) in enumerate(events)
    ]
    table = LakeTable.create(
        str(tmp_path_factory.mktemp("prop") / "t"),
        "url string, warc_ts timestamp, html binary",
        key_col="url",
        num_buckets=2,
    )
    for start in range(0, len(rows), split):
        chunk = rows[start : start + split]
        df = spark.createDataFrame(
            chunk, "op string, op_seq long, url string, warc_ts timestamp, html binary"
        )
        table.merge(spark, df)
    got = {
        r["url"]: (
            r["warc_ts"].replace(tzinfo=UTC),
            bytes(r["html"]) if r["html"] is not None else None,
        )
        for r in table.scan(spark).collect()
    }
    want = {
        u: (ts, payload)
        for u, (ts, seq, payload) in expected_state(
            [(op, url, ts, seq, payload) for (op, seq, url, ts, payload) in rows]
        ).items()
    }
    assert got == want


def test_extraction_byte_identical(spark):
    """input_hint per-row invariant: engine text == oracle text, byte for
    byte, over adversarial html."""
    cases = [
        None,
        b"",
        b"plain no tags",
        b"<html><body>hello  world</body></html>",
        b"<a href='x'>link</a><b>bold</b>",
        b"<p>unterminated <tag",
        "<p>unicode é中文</p>".encode(),
        b"\xff\xfe invalid utf8 <b>x</b>",
        b"   <div>  lots   of \t whitespace </div>  ",
        b"<>empty tag<>",
        # Unicode whitespace (NBSP, thin space, ideographic space,
        # NEL, line/para separators): Python `\s` matches these; the
        # Arrow/RE2 fast path must agree via the enumerated class
        "<p>a\xa0b</p>".encode(),
        " x　<i>y</i> z\x85".encode(),
        "  lead and trail  ".encode(),
    ]
    df = spark.createDataFrame([(c,) for c in cases], "html binary")
    got = [r["t"] for r in df.select(extract_text_udf("html").alias("t")).collect()]
    want = [extract_text_py(c) for c in cases]
    assert got == want


def test_ws_class_matches_python_re():
    """The RE2 whitespace class used by the Arrow extraction fast path
    must cover EXACTLY the codepoints CPython `re` treats as `\\s` —
    brute-forced over the full Unicode range."""
    import re as _re

    import pyarrow as pa
    import pyarrow.compute as pc

    from tiger_etl_spark.functions.text import _WS_RE2

    py_ws = {c for c in range(0x110000) if _re.match(r"\s", chr(c))}
    # surrogates can't round-trip through Arrow strings; \s has none
    probe = [chr(c) for c in range(0x110000) if not 0xD800 <= c <= 0xDFFF]
    arr = pa.array(probe, type=pa.string())
    matched = pc.match_substring_regex(arr, _WS_RE2).to_pylist()
    re2_ws = {ord(ch) for ch, m in zip(probe, matched) if m}
    assert re2_ws == py_ws


def test_extract_arrow_kernel_parity_direct():
    """The pyarrow kernel (bypassing Spark) is byte-identical to the
    single-threaded oracle, including the invalid-UTF-8 fallback batch."""
    import pyarrow as pa

    from tiger_etl_spark.functions.text import (
        extract_text_arrow,
        extract_text_py,
    )

    good = [
        b"<p>a\xc2\xa0b</p>",
        None,
        b"",
        "x <i>y</i>　z".encode(),
        b"plain",
    ]
    bad = good + [b"\xff invalid \xfe<b>t</b>"]
    for batch in (good, bad):
        got = extract_text_arrow(pa.array(batch, type=pa.binary())).to_pylist()
        want = [extract_text_py(c) for c in batch]
        assert got == want


def test_no_row_at_a_time_udf_in_package():
    """Vectorization guard (SURVEY.md §5.6): the engine must not register
    row-at-a-time Python UDFs — pandas/Arrow UDFs only."""
    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tiger_etl_spark")
    out = subprocess.run(
        ["grep", "-rn", "--include=*.py", "-E", r"(F\.udf|@udf\(|functions\.udf\()", pkg],
        capture_output=True,
        text=True,
    )
    assert out.stdout == "", f"row-at-a-time UDFs found:\n{out.stdout}"


def test_quarantine_fixture_rates(tmp_path):
    """Generator produces the FIXTURES.md §2/§6 shape: dup/tie/late/
    invalid rates in the right ballpark."""
    from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files
    from tiger_etl_spark.cdc.oracle import is_valid, read_change_files

    ev = gen_change_events(seed=11, n=20000, n_hosts=80)
    write_change_files(ev, str(tmp_path / "c"), n_files=10)
    events = read_change_files(str(tmp_path / "c"))
    n = len(events)
    assert n > 20000  # duplicates carried into following files
    invalid = [e for e in events if not is_valid(e)]
    assert 0.0005 * 20000 < len(invalid) < 0.01 * 20000
    # ties: same (url, warc_ts) different op_seq
    seen, ties = {}, 0
    for e in events:
        k = (e["url"], e["warc_ts"])
        if k in seen and seen[k] != e["op_seq"]:
            ties += 1
        seen[k] = e["op_seq"]
    assert ties > 0


# ---------------------------------------------- pruning equivalence


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(event_st, min_size=1, max_size=20),
    split=st.integers(min_value=1, max_value=3),
    win=st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    compact_at=st.integers(min_value=0, max_value=3),
)
def test_pruned_scan_equals_filtered_full_scan(spark, tmp_path_factory, events, split, win, compact_at):
    """For ANY event interleaving, batch split, compaction point and
    time window: scan(ts_range=...) == scan().where(between) — file
    pruning may never change answers (incl. the stale-resurface case
    where a newer out-of-window version must still suppress an
    in-window older row)."""
    from pyspark.sql import functions as F

    from tiger_etl_spark.lake import LakeTable

    lo, hi = sorted([win[0], win[1]])
    lo_ts, hi_ts = (
        BASE + dt.timedelta(seconds=lo),
        BASE + dt.timedelta(seconds=hi),
    )
    t = LakeTable.create(
        str(tmp_path_factory.mktemp("pr") / "t"),
        "url string, warc_ts timestamp, text string",
        key_col="url",
        num_buckets=2,
    )
    rows = [
        (op, i + 1, url, BASE + dt.timedelta(seconds=ts), payload.hex())
        for i, (op, url, ts, payload) in enumerate(events)
    ]
    n_batches = min(split, len(rows))
    for bi in range(n_batches):
        chunk = rows[bi::n_batches]
        if not chunk:
            continue
        t.merge(
            spark,
            spark.createDataFrame(
                chunk,
                "op string, op_seq long, url string, warc_ts timestamp, text string",
            ),
        )
        if bi == compact_at:
            t.compact(spark)
    full = sorted(
        (r["url"], r["text"])
        for r in t.scan(spark)
        .where(F.col("warc_ts").between(lo_ts, hi_ts))
        .collect()
    )
    pruned = sorted(
        (r["url"], r["text"])
        for r in t.scan(spark, ts_range=(lo_ts, hi_ts)).collect()
    )
    assert pruned == full
