"""Schema-id mapping stage (SURVEY.md §1.3, §4 custom-work #3).

Reference analog: Alembic migrations (``alembic/versions/
3373e01d40b9_initial_migration.py``, ``310f4b46a4b2_add_all_remaining_
models.py`` — add tables/columns with paired downgrades). Here each
change event carries a ``schema_id`` and the mapping stage lifts every
event to the live table schema *before* MERGE: renames resolved
(``body``→``html``), added columns nulled (``lang``), widened types cast
(``content_len`` int→long, already widened by the superset read schema).

The registry is data, not code, so new schema versions are one dict entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.schemas import NORMALIZED_EVENT_COLUMNS

# per-schema-id lift rules into the live (v2) schema
SCHEMA_REGISTRY: dict[int, dict] = {
    1: {
        "renames": {"body": "html"},   # column renamed in v2
        "absent": ["lang"],            # column added in v2 → null for v1
        "casts": {"content_len": "long"},
    },
    2: {"renames": {}, "absent": [], "casts": {}},
}

LIVE_SCHEMA_ID = 2


def map_to_live_schema(df: DataFrame) -> DataFrame:
    """Vectorized, branch-per-schema-id via CASE expressions — one pass,
    no per-version shuffles or splits."""
    out = df
    for sid, rules in SCHEMA_REGISTRY.items():
        if sid == LIVE_SCHEMA_ID:
            continue
        is_v = F.col("schema_id") == sid
        for old, new in rules["renames"].items():
            out = out.withColumn(new, F.when(is_v, F.col(old)).otherwise(F.col(new)))
        for col in rules["absent"]:
            out = out.withColumn(
                col, F.when(is_v, F.lit(None)).otherwise(F.col(col))
            )
        for col, dtype in rules["casts"].items():
            out = out.withColumn(col, F.col(col).cast(dtype))
    return out.select(*[c for c in NORMALIZED_EVENT_COLUMNS if c in out.columns])
