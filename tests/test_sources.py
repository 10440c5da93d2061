"""JSONL change-file source: wire-format decode parity (jsonl vs
parquet event streams), end-to-end stream apply, and oracle agreement."""

from __future__ import annotations

import pytest

from tiger_etl_spark.cdc import oracle
from tiger_etl_spark.cdc.datagen import gen_change_events, write_change_files
from tiger_etl_spark.cdc.pipeline import create_pages_table
from tiger_etl_spark.cdc.sources import read_change_batch
from tiger_etl_spark.cdc.streaming import run_stream
from tiger_etl_spark.lake import LakeTable

N_EVENTS = 2000
N_FILES = 6


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    ev = gen_change_events(seed=13, n=N_EVENTS, n_hosts=30)
    pq_dir = str(tmp_path_factory.mktemp("changes_pq"))
    jl_dir = str(tmp_path_factory.mktemp("changes_jl"))
    write_change_files(ev, pq_dir, n_files=N_FILES)
    write_change_files(ev, jl_dir, n_files=N_FILES, file_format="jsonl")
    return pq_dir, jl_dir


def test_jsonl_decode_matches_parquet(spark, dirs):
    """Same events, both wire formats → identical normalized rows
    (binary payloads byte-for-byte, timestamps to the microsecond)."""
    pq_dir, jl_dir = dirs
    cols = ["op", "op_seq", "url", "warc_ts", "body", "html", "lang",
            "content_len", "schema_id"]

    def norm(df):
        return sorted(
            (
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in r
                )
                for r in df.select(cols).collect()
            )
        )

    a = norm(read_change_batch(spark, pq_dir + "/*.parquet", "parquet"))
    b = norm(read_change_batch(spark, jl_dir + "/*.jsonl", "jsonl"))
    assert len(a) >= N_EVENTS  # replay duplicates ride along in both
    assert a == b


def test_jsonl_oracle_matches_parquet_oracle(dirs):
    pq_dir, jl_dir = dirs
    a = oracle.replay_dir(pq_dir)
    b = oracle.replay_dir(jl_dir)
    assert set(a) == set(b)
    for url in a:
        assert a[url] == b[url]


def test_jsonl_stream_end_to_end_parity(spark, tmp_path, dirs):
    _, jl_dir = dirs
    tp = str(tmp_path / "pages_jl")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        jl_dir,
        tp,
        str(tmp_path / "ckpt_jl"),
        max_files_per_trigger=2,
        file_format="jsonl",
    )
    assert res.batches_applied == 3
    expected = oracle.replay_dir(jl_dir)
    rows = {r["url"]: r for r in LakeTable.load(tp).scan(spark).collect()}
    assert set(rows) == set(expected)
    for url, e in expected.items():
        assert rows[url]["text"] == e["text"]
        got = rows[url]["html"]
        assert (bytes(got) if got is not None else None) == e["html"]


def test_bad_format_raises(spark, dirs):
    with pytest.raises(ValueError):
        read_change_batch(spark, dirs[0], "csv")


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    ev = gen_change_events(seed=13, n=N_EVENTS, n_hosts=30)
    d = str(tmp_path_factory.mktemp("changes_warc"))
    write_change_files(ev, d, n_files=N_FILES, file_format="warc")
    return d


def test_warc_decode_matches_parquet(spark, dirs, warc_dir):
    """WARC-style header-block records decode to the identical
    normalized rows as the parquet change files (payload bytes,
    microsecond timestamps, both schema eras)."""
    pq_dir, _ = dirs
    cols = ["op", "op_seq", "url", "warc_ts", "body", "html", "lang",
            "content_len", "schema_id"]

    def norm(df):
        return sorted(
            (
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in r
                )
                for r in df.select(cols).collect()
            )
        )

    a = norm(read_change_batch(spark, pq_dir + "/*.parquet", "parquet"))
    b = norm(read_change_batch(spark, warc_dir + "/*.warc", "warc"))
    assert a == b


def test_warc_stream_end_to_end_parity(spark, tmp_path, warc_dir):
    tp = str(tmp_path / "pages_warc")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        warc_dir,
        tp,
        str(tmp_path / "ckpt_warc"),
        max_files_per_trigger=2,
        file_format="warc",
    )
    assert res.batches_applied == 3
    expected = oracle.replay_dir(warc_dir)
    rows = {r["url"]: r for r in LakeTable.load(tp).scan(spark).collect()}
    assert set(rows) == set(expected)
    for url, e in expected.items():
        assert rows[url]["text"] == e["text"]
        got = rows[url]["html"]
        assert (bytes(got) if got is not None else None) == e["html"]


@pytest.fixture(scope="module")
def dbz_dir(tmp_path_factory):
    ev = gen_change_events(seed=13, n=N_EVENTS, n_hosts=30)
    d = str(tmp_path_factory.mktemp("changes_dbz"))
    write_change_files(ev, d, n_files=N_FILES, file_format="debezium")
    return d


def test_debezium_decode_matches_parquet(spark, dirs, dbz_dir):
    """Debezium before/after envelopes decode to the identical
    normalized rows as the parquet change files: c/u/d op codes mapped
    back, delete key images read from `before`, payload bytes and
    microsecond timestamps exact, invalid-fixture rows (unknown op,
    null url/ts) surviving verbatim for the quarantine path."""
    pq_dir, _ = dirs
    cols = ["op", "op_seq", "url", "warc_ts", "body", "html", "lang",
            "content_len", "schema_id"]

    def norm(df):
        return sorted(
            (
                tuple(
                    bytes(v) if isinstance(v, (bytes, bytearray)) else v
                    for v in r
                )
                for r in df.select(cols).collect()
            )
        )

    a = norm(read_change_batch(spark, pq_dir + "/*.parquet", "parquet"))
    b = norm(read_change_batch(spark, dbz_dir + "/*.debezium", "debezium"))
    assert a == b


def test_debezium_oracle_matches_parquet_oracle(dirs, dbz_dir):
    pq_dir, _ = dirs
    a = oracle.replay_dir(pq_dir)
    b = oracle.replay_dir(dbz_dir)
    assert set(a) == set(b)
    for url in a:
        assert a[url] == b[url]


def test_debezium_stream_end_to_end_parity(spark, tmp_path, dbz_dir):
    tp = str(tmp_path / "pages_dbz")
    create_pages_table(tp, num_buckets=4)
    res = run_stream(
        spark,
        dbz_dir,
        tp,
        str(tmp_path / "ckpt_dbz"),
        max_files_per_trigger=2,
        file_format="debezium",
    )
    assert res.batches_applied == 3
    expected = oracle.replay_dir(dbz_dir)
    rows = {r["url"]: r for r in LakeTable.load(tp).scan(spark).collect()}
    assert set(rows) == set(expected)
    for url, e in expected.items():
        assert rows[url]["text"] == e["text"]
        got = rows[url]["html"]
        assert (bytes(got) if got is not None else None) == e["html"]
