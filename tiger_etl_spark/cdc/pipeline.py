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
from tiger_etl_spark.cdc.validate import with_validation
from tiger_etl_spark.functions.text import extract_text_pandas
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


def _fused_dedup_extract(table: LakeTable, mapped: DataFrame) -> DataFrame:
    """The hot path, one shuffle total (SURVEY.md §3 steps 3–5 fused):

      repartition by bucket → sortWithinPartitions(url, order desc)
      → mapInPandas: keep first row per url run (LWW winner; state
        carried across Arrow chunks) + extract text on winners only

    url determines bucket, so after the bucket shuffle every url's
    events are co-located; a partition-local sorted scan picks winners
    without the url-hash exchange a groupBy/window would add, and the
    result is already laid out for the bucket-partitioned write (merge
    writes with zero further shuffles). Losing events never pay the
    extraction UDF. All pandas ops are vectorized (no per-row Python).
    """
    import pandas as pd

    normalized = (
        mapped.withColumn("_op_seq", F.col("op_seq").cast("long"))
        .withColumn("_deleted", F.col("op") == "D")
        .withColumn("_bucket", table.bucket_expr())
    )
    parts = normalized.repartition(F.col("_bucket")).sortWithinPartitions(
        "url", F.col("warc_ts").desc(), F.col("_op_seq").desc()
    )

    out_cols = [
        "url", "warc_ts", "html", "text", "lang", "content_len",
        "_op_seq", "_deleted", "_bucket",
    ]

    def keep_first_extract(batches) -> "Iterator[pd.DataFrame]":
        prev_url = None  # last url seen in the previous chunk (same partition)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            first_of_run = pdf["url"].ne(pdf["url"].shift())
            keep = pdf[first_of_run]
            if prev_url is not None and len(keep) and keep.iloc[0]["url"] == prev_url:
                keep = keep.iloc[1:]
            prev_url = pdf["url"].iloc[-1]
            if len(keep) == 0:
                continue
            keep = keep.assign(text=extract_text_pandas(keep["html"]))
            yield keep[out_cols]

    schema = (
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, content_len long, _op_seq long, _deleted boolean, "
        "_bucket int"
    )
    return parts.mapInPandas(keep_first_extract, schema=schema)


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

    # cache the validated micro-batch once; every counter below comes out
    # of ONE aggregation pass over it (per-batch driver jobs are the fixed
    # cost that bounds streaming throughput)
    checked = with_validation(events).cache()
    try:
        is_valid = F.size("_invalid_reasons") == 0
        valid = checked.where(is_valid).drop("_invalid_reasons")
        quarantined = checked.where(~is_valid)
        mapped = map_to_live_schema(valid)

        # watermark accounting: events older than (batch max ts − horizon)
        # are "late" — still applied (the LWW guard makes stale ones
        # no-ops), but counted to lineage per the late-data policy
        prev_wm = table.props.get("high_watermark")
        agg = checked.agg(
            F.count("*").alias("rows_in"),
            F.sum(
                F.coalesce(F.length("html"), F.length("body"), F.lit(0))
                + F.coalesce(F.length("url"), F.lit(0))
            ).alias("bytes_in"),
            F.min("batch_file").alias("offset_start"),
            F.max("batch_file").alias("offset_end"),
            F.max("warc_ts").alias("max_ts"),
            F.sum((~is_valid).cast("long")).alias("n_quarantined"),
        ).collect()[0]
        n_quarantined = agg["n_quarantined"] or 0

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

        props_updates = {
            "applied_batches": {**applied, str(batch_id): table.manifest["snapshot_id"] + 1},
            "high_watermark": str(high_wm) if high_wm else None,
        }
        if merge_mode == "mor":
            batch = _fused_dedup_extract(table, mapped)
            stats = table.merge(
                spark, batch, mode="mor", props_updates=props_updates, prepared=True
            )
        else:
            from tiger_etl_spark.functions.text import extract_text_udf

            batch = mapped.withColumn(
                "text", extract_text_udf(F.col("html"))
            ).select(
                "op", "op_seq", "url", "warc_ts", "html", "text", "lang", "content_len"
            )
            stats = table.merge(
                spark, batch, mode=merge_mode, props_updates=props_updates
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
        _write_lineage(table, record)
        return record
    finally:
        checked.unpersist()


def _write_lineage(table: LakeTable, rec: LineageRecord) -> None:
    """One metadata row per batch — written driver-side with pyarrow (a
    Spark job for a single bookkeeping row costs seconds of scheduler
    latency per micro-batch; this is pure driver metadata, like the
    manifest itself). Layout stays hive-partitioned parquet so
    `read_lineage` is a normal Spark scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ldir = os.path.join(table.path, "_lineage", f"batch_id={rec.batch_id}")
    os.makedirs(ldir, exist_ok=True)
    row = asdict(rec)
    tbl = pa.table(
        {
            "offset_start": pa.array([row["offset_start"]], pa.string()),
            "offset_end": pa.array([row["offset_end"]], pa.string()),
            "snapshot_id": pa.array([row["snapshot_id"]], pa.int64()),
            "rows_in": pa.array([row["rows_in"]], pa.int64()),
            "rows_applied": pa.array([row["rows_applied"]], pa.int64()),
            "rows_quarantined": pa.array([row["rows_quarantined"]], pa.int64()),
            "rows_late": pa.array([row["rows_late"]], pa.int64()),
            "bytes_in": pa.array([row["bytes_in"]], pa.int64()),
            "partition_counts": pa.array(
                [list(row["partition_counts"].items())],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(ldir, "lineage.parquet"))


def read_lineage(spark: SparkSession, table: LakeTable) -> DataFrame:
    return spark.read.option("basePath", os.path.join(table.path, "_lineage")).parquet(
        os.path.join(table.path, "_lineage")
    )


def read_quarantine(spark: SparkSession, table: LakeTable) -> DataFrame:
    qdir = os.path.join(table.path, "_quarantine")
    return spark.read.option("basePath", qdir).parquet(qdir)
