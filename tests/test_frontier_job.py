"""End-to-end smoke for jobs/crawl_frontier.py: lake table → alias
resolution → revisit priority → politeness waves → fetch plan."""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.pipeline import apply_changes, create_pages_table
from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA

_JOB = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "jobs",
    "crawl_frontier.py",
)


def _html(canonical: str | None) -> bytes:
    link = f'<link rel="canonical" href="{canonical}">' if canonical else ""
    return f"<html><head>{link}</head><body>hi</body></html>".encode()


def _seed_table(spark, tmp_path):
    """6 pages on 2 hosts; a→b→c canonical chain plus a 2-cycle."""
    t0 = datetime.datetime(2026, 1, 1)
    pages = [
        ("https://h1.x/a", _html("https://h1.x/b")),
        ("https://h1.x/b", _html("https://h1.x/c")),
        ("https://h1.x/c", _html(None)),
        ("https://h2.x/p", _html("https://h2.x/q")),  # 2-cycle
        ("https://h2.x/q", _html("https://h2.x/p")),
        ("https://h2.x/r", _html(None)),
    ]
    rows = [
        # full superset read schema: (op, op_seq, url, warc_ts, body,
        # html, lang, content_len, schema_id, batch_file)
        ("I", i + 1, url, t0 + datetime.timedelta(minutes=i), None, html,
         "en", len(html), 2, "f0")
        for i, (url, html) in enumerate(pages)
    ]
    ev = spark.createDataFrame(rows, EVENTS_READ_SCHEMA)
    table = create_pages_table(str(tmp_path / "pages"), num_buckets=4)
    apply_changes(spark, table, ev, batch_id=0)
    return table, rows


def test_frontier_cli_smoke(spark, tmp_path):
    table, rows = _seed_table(spark, tmp_path)
    # fetch history: /c changed every fetch, /r never
    t0 = datetime.datetime(2026, 2, 1)
    hist = [
        ("https://h1.x/c", t0 + datetime.timedelta(hours=i), f"v{i}".encode())
        for i in range(4)
    ] + [
        ("https://h2.x/r", t0 + datetime.timedelta(hours=i), b"same")
        for i in range(4)
    ]
    changes = str(tmp_path / "changes")
    spark.createDataFrame(
        hist, "url string, warc_ts timestamp, html binary"
    ).write.parquet(changes)

    out = str(tmp_path / "frontier")
    r = subprocess.run(
        [
            sys.executable, _JOB,
            "--table", table.path,
            "--changes", changes,
            "--out", out,
            "--max-wave", "10",
            "--local-cores", "2",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])

    plan = {
        row["fetch_url"]: row
        for row in spark.read.parquet(out).collect()
    }
    # a and b collapse into c; the cycle pair fetch themselves
    assert set(plan) == {
        "https://h1.x/c",
        "https://h2.x/p",
        "https://h2.x/q",
        "https://h2.x/r",
    }
    assert summary["n_fetch_urls"] == 4 and summary["n_hosts"] == 2
    c = plan["https://h1.x/c"]
    assert c["n_aliases"] == 3  # a, b and c itself
    # /c changed on every refetch -> top priority, wave 0 on its host
    assert c["priority"] == 1_000_000 and c["wave"] == 0
    # /r never changed -> priority 0
    assert plan["https://h2.x/r"]["priority"] == 0
    # each host's waves start at 0 and are dense
    for host in ("h1.x", "h2.x"):
        waves = sorted(
            row["wave"] for row in plan.values() if row["host"] == host
        )
        assert waves == list(range(len(waves)))
