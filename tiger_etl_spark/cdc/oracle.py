"""Single-threaded reference replay oracle (FIXTURES.md §5).

Semantics are the reference's mutation core re-stated: check-then-insert
dedup + keyed last-state-wins updates + keyed delete (SURVEY.md §2.3 J3,
§2.9) — a dict keyed by url, events applied in total `(warc_ts, op_seq)`
order, `D` removes the key. The engine's distributed MERGE must produce a
byte-for-byte identical final table.

The oracle reads the change *files* (not the generator arrays) so batch
splitting, duplicate injection, and schema-evolution mapping are all
exercised identically on both sides.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from tiger_etl_spark.functions.text import extract_text_py

VALID_OPS = {"I", "U", "D"}


def normalize_event(row: dict, schema_id: int) -> dict:
    """Schema-id mapping, oracle side: v1 `body`→`html`, lang=None,
    content_len int→long (Python ints are wide already)."""
    if schema_id == 1:
        html = row.get("body")
        lang = None
    else:
        html = row.get("html")
        lang = row.get("lang")
    return {
        "op": row["op"],
        "op_seq": row["op_seq"],
        "url": row["url"],
        "warc_ts": row["warc_ts"],
        "html": html,
        "lang": lang,
        "content_len": row.get("content_len"),
    }


def is_valid(e: dict) -> bool:
    """Validation rules (FIXTURES.md §6): non-empty url, positive op_seq,
    op ∈ {I,U,D}, non-null warc_ts. Mirrors the reference's Pydantic
    rejection semantics (sessions_management/validations.py:88-114)."""
    return (
        bool(e["url"])
        and e["op_seq"] is not None
        and e["op_seq"] > 0
        and e["op"] in VALID_OPS
        and e["warc_ts"] is not None
    )


def _read_jsonl_rows(path: str) -> list[dict]:
    """JSONL change lines → parquet-reader-shaped row dicts (base64 →
    bytes, epoch-us → tz-aware datetime) so `normalize_event` is
    format-agnostic."""
    import base64
    import json
    from datetime import datetime, timedelta, timezone

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    rows = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            us = rec.pop("warc_ts_us", None)
            rec["warc_ts"] = (
                epoch + timedelta(microseconds=us) if us is not None else None
            )
            for b64_key, bin_key in (("body_b64", "body"), ("html_b64", "html")):
                if b64_key in rec:
                    v = rec.pop(b64_key)
                    rec[bin_key] = (
                        base64.b64decode(v) if v is not None else None
                    )
            rows.append(rec)
    return rows


def _read_warc_rows(path: str) -> list[dict]:
    """WARC-style header-block records → parquet-reader-shaped row
    dicts (same conventions as `_read_jsonl_rows`): records split on
    the blank line, one `Name: value` header per field."""
    import base64
    from datetime import datetime, timedelta, timezone

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    rows = []
    with open(path, encoding="utf-8") as fh:
        content = fh.read()
    for block in content.split("\n\n"):
        if not block.strip():
            continue
        hdrs: dict[str, str] = {}
        for line in block.splitlines():
            if ": " in line:
                k, v = line.split(": ", 1)
                hdrs[k] = v
        rec: dict = {
            "op": hdrs.get("WARC-Type"),
            "op_seq": int(hdrs["WARC-Record-ID"]),
            "url": hdrs.get("WARC-Target-URI"),
            "schema_id": int(hdrs["WARC-Schema-Id"]),
            "batch_file": hdrs.get("WARC-Batch-File"),
            "warc_ts": (
                epoch + timedelta(microseconds=int(hdrs["WARC-Date-US"]))
                if "WARC-Date-US" in hdrs
                else None
            ),
            "content_len": (
                int(hdrs["Content-Length-Orig"])
                if "Content-Length-Orig" in hdrs
                else None
            ),
        }
        if "Content-Lang" in hdrs:
            rec["lang"] = hdrs["Content-Lang"]
        if "Body-B64" in hdrs:
            rec["body"] = base64.b64decode(hdrs["Body-B64"])
        if "Html-B64" in hdrs:
            rec["html"] = base64.b64decode(hdrs["Html-B64"])
        rows.append(rec)
    return rows


def _read_debezium_rows(path: str) -> list[dict]:
    """Debezium-envelope change lines → parquet-reader-shaped row
    dicts: row image from `after` (c/u) or `before` (d key image),
    op codes c/u/d mapped back to I/U/D (unknown codes pass through),
    event time from the image falling back to `source.ts_us`."""
    import base64
    import json
    from datetime import datetime, timedelta, timezone

    epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
    unmap = {"c": "I", "u": "U", "d": "D"}
    rows = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            if not line.strip():
                continue
            rec = json.loads(line)
            image = rec.get("after") or rec.get("before") or {}
            src = rec.get("source") or {}
            us = image.get("warc_ts_us")
            if us is None:
                us = src.get("ts_us")
            row: dict = {
                "op": unmap.get(rec.get("op"), rec.get("op")),
                "op_seq": src.get("lsn"),
                "url": image.get("url"),
                "schema_id": src.get("schema_id"),
                "batch_file": src.get("file"),
                "content_len": image.get("content_len"),
                "warc_ts": (
                    epoch + timedelta(microseconds=us) if us is not None else None
                ),
            }
            if "lang" in image:
                row["lang"] = image["lang"]
            for b64_key, bin_key in (("body_b64", "body"), ("html_b64", "html")):
                if b64_key in image:
                    v = image[b64_key]
                    row[bin_key] = base64.b64decode(v) if v is not None else None
            rows.append(row)
    return rows


def read_change_files(change_dir: str) -> list[dict]:
    events = []
    paths = sorted(
        glob.glob(os.path.join(change_dir, "*.parquet"))
        + glob.glob(os.path.join(change_dir, "*.jsonl"))
        + glob.glob(os.path.join(change_dir, "*.warc"))
        + glob.glob(os.path.join(change_dir, "*.debezium"))
    )
    for path in paths:
        if path.endswith(".jsonl"):
            rows = _read_jsonl_rows(path)
        elif path.endswith(".warc"):
            rows = _read_warc_rows(path)
        elif path.endswith(".debezium"):
            rows = _read_debezium_rows(path)
        else:
            rows = pq.read_table(path).to_pylist()
        for row in rows:
            events.append(normalize_event(row, row["schema_id"]))
    return events


def replay(events: list[dict]) -> dict[str, dict]:
    """Apply valid events in (warc_ts, op_seq) total order; return the
    final url→row state. Exact duplicates collapse (idempotent)."""
    valid = [e for e in events if is_valid(e)]
    valid.sort(key=lambda e: (e["warc_ts"], e["op_seq"]))
    state: dict[str, dict] = {}
    for e in valid:
        if e["op"] == "D":
            state.pop(e["url"], None)
        else:
            state[e["url"]] = {
                "url": e["url"],
                "warc_ts": e["warc_ts"],
                "html": e["html"],
                "text": extract_text_py(e["html"]),
                "lang": e["lang"],
                "content_len": e["content_len"],
            }
    return state


def replay_dir(change_dir: str) -> dict[str, dict]:
    return replay(read_change_files(change_dir))
