"""Batch apply core — the engine's main operator (SURVEY.md §3 lifecycle).

One micro-batch of change events flows through:

1. validate → quarantine split           (Pydantic analog, §1.3)
2. schema-id mapping to the live schema  (Alembic analog, §4 #3)
3. LWW dedup per url                     (W3; skew-proof max_by)
4. html→text extraction on winners only  (F10 analog, vectorized pandas UDF)
5. MERGE INTO the lake table             (J3/J6; tombstoned deletes)
6. lineage + watermark accounting        (A4 analog; exactly-once props)

Extraction runs *after* dedup so losing events never pay the UDF.
The applied-batch id is committed atomically with the data files, so a
replay from checkpoint skips the batch entirely (and even a crash
between data-commit and checkpoint-commit is safe: re-applying is a
no-op under the LWW guard).
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.cdc.schema_evolution import map_to_live_schema
from tiger_etl_spark.cdc.schemas import PAGES_SCHEMA
from tiger_etl_spark.cdc.validate import split_valid
from tiger_etl_spark.functions.text import extract_text_udf
from tiger_etl_spark.lake import LakeTable

WATERMARK_HOURS_DEFAULT = 24


@dataclass
class LineageRecord:
    """Per-micro-batch bookkeeping (FIXTURES.md §4); reference analog:
    bulk-op summary stats (user_group_management.py:2366-2380)."""

    batch_id: int
    offset_start: str
    offset_end: str
    snapshot_id: int
    rows_in: int = 0
    rows_applied: int = 0
    rows_quarantined: int = 0
    rows_late: int = 0
    bytes_in: int = 0
    partition_counts: dict[str, int] = field(default_factory=dict)


def create_pages_table(
    path: str, num_buckets: int = 16, write_salts: int = 1
) -> LakeTable:
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in PAGES_SCHEMA.fields)
    return LakeTable.create(
        path,
        ddl,
        key_col="url",
        order_cols=("warc_ts",),
        num_buckets=num_buckets,
        props={"write_salts": str(write_salts)},
    )


def apply_changes(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    watermark_hours: int = WATERMARK_HOURS_DEFAULT,
    merge_mode: str = "mor",
) -> LineageRecord:
    """Apply one bounded batch of raw change events. `events` has the
    superset read schema (cdc.schemas.EVENTS_READ_SCHEMA)."""
    applied = table.props.get("applied_batches", {})
    if str(batch_id) in applied:
        # exactly-once: replayed batch (restart between data commit and
        # checkpoint commit) — skip without touching the table
        return LineageRecord(
            batch_id=batch_id,
            offset_start="",
            offset_end="",
            snapshot_id=table.manifest["snapshot_id"],
        )

    # single pass over the scan computes batch-level counters; cache the
    # (small) micro-batch so validate/dedup/merge don't re-read the source
    events = events.cache()
    try:
        valid, quarantined = split_valid(events)
        mapped = map_to_live_schema(valid)

        # watermark accounting: events older than (batch max ts − horizon)
        # are "late" — still applied (the LWW guard makes stale ones
        # no-ops), but counted to lineage per the late-data policy
        prev_wm = table.props.get("high_watermark")
        agg = events.agg(
            F.count("*").alias("rows_in"),
            F.sum(
                F.coalesce(F.length("html"), F.length("body"), F.lit(0))
                + F.coalesce(F.length("url"), F.lit(0))
            ).alias("bytes_in"),
            F.min("batch_file").alias("offset_start"),
            F.max("batch_file").alias("offset_end"),
            F.max("warc_ts").alias("max_ts"),
        ).collect()[0]
        n_quarantined = quarantined.count()

        # persist quarantine (dead-letter) before the merge commit
        if n_quarantined:
            qdir = os.path.join(table.path, "_quarantine", f"batch_id={batch_id}")
            quarantined.withColumn(
                "_invalid_reasons", F.array_join("_invalid_reasons", ",")
            ).write.mode("overwrite").parquet(qdir)

        high_wm = agg["max_ts"]
        if prev_wm is not None and (high_wm is None or str(high_wm) < prev_wm):
            high_wm = prev_wm  # watermark never regresses
        late_cutoff = F.lit(str(high_wm)).cast("timestamp") - F.expr(
            f"INTERVAL {watermark_hours} HOURS"
        )
        n_late = mapped.where(F.col("warc_ts") < late_cutoff).count() if high_wm else 0

        batch = mapped.withColumn("text", extract_text_udf(F.col("html"))).select(
            "op", "op_seq", "url", "warc_ts", "html", "text", "lang", "content_len"
        )
        stats = table.merge(
            spark,
            batch,
            mode=merge_mode,
            props_updates={
                "applied_batches": {**applied, str(batch_id): table.manifest["snapshot_id"] + 1},
                "high_watermark": str(high_wm) if high_wm else None,
            },
        )

        record = LineageRecord(
            batch_id=batch_id,
            offset_start=agg["offset_start"] or "",
            offset_end=agg["offset_end"] or "",
            snapshot_id=stats.snapshot_id,
            rows_in=agg["rows_in"],
            rows_applied=stats.rows_upserted,
            rows_quarantined=n_quarantined,
            rows_late=n_late,
            bytes_in=agg["bytes_in"] or 0,
            partition_counts=stats.partition_counts,
        )
        _write_lineage(spark, table, record)
        return record
    finally:
        events.unpersist()


def _write_lineage(spark: SparkSession, table: LakeTable, rec: LineageRecord) -> None:
    ldir = os.path.join(table.path, "_lineage", f"batch_id={rec.batch_id}")
    row = asdict(rec)
    row.pop("batch_id")
    spark.createDataFrame(
        [
            (
                row["offset_start"],
                row["offset_end"],
                row["snapshot_id"],
                row["rows_in"],
                row["rows_applied"],
                row["rows_quarantined"],
                row["rows_late"],
                row["bytes_in"],
                row["partition_counts"],
            )
        ],
        "offset_start string, offset_end string, snapshot_id long, rows_in long, "
        "rows_applied long, rows_quarantined long, rows_late long, bytes_in long, "
        "partition_counts map<string,long>",
    ).coalesce(1).write.mode("overwrite").parquet(ldir)


def read_lineage(spark: SparkSession, table: LakeTable) -> DataFrame:
    return spark.read.option("basePath", os.path.join(table.path, "_lineage")).parquet(
        os.path.join(table.path, "_lineage")
    )


def read_quarantine(spark: SparkSession, table: LakeTable) -> DataFrame:
    qdir = os.path.join(table.path, "_quarantine")
    return spark.read.option("basePath", qdir).parquet(qdir)
