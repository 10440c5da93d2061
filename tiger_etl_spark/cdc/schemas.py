"""Schemas for the CDC engine.

The target table shape is mandated by BASELINE.json `input_hint`:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
Change events follow FIXTURES.md §2 with two schema versions (§3):

- schema_id=1: ``body:binary`` (pre-rename), ``content_len:int``, no ``lang``
- schema_id=2: ``html:binary``, ``lang:string``, ``content_len:long``

Reference analog: SQLAlchemy models + Alembic migrations
(system/system/models/*/model.py, alembic/versions/*) — fixed,
migration-versioned schemas. Here each version is a registry entry and
the mapping stage (cdc/schema_evolution.py) lifts old events to the live
schema before MERGE.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The live table schema (v2).
PAGES_FIELDS = [
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content_len", T.LongType(), True),
]
PAGES_SCHEMA = T.StructType(PAGES_FIELDS)

# Superset READ schema for the change-file directory: both physical
# column names (body|html) present; parquet fills absent columns with
# NULL and upcasts int32 content_len to long.
EVENTS_READ_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("body", T.BinaryType(), True),   # schema_id=1 name
        T.StructField("html", T.BinaryType(), True),   # schema_id=2 name
        T.StructField("lang", T.StringType(), True),
        T.StructField("content_len", T.LongType(), True),
        T.StructField("schema_id", T.IntegerType(), True),
        T.StructField("batch_file", T.StringType(), True),
    ]
)

# Normalized (post-mapping) event columns fed to the merge stage.
NORMALIZED_EVENT_COLUMNS = [
    "op",
    "op_seq",
    "url",
    "warc_ts",
    "html",
    "lang",
    "content_len",
    "schema_id",
    "batch_file",
]
