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
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiger_etl_spark.cdc.schema_evolution import map_to_live_schema
from tiger_etl_spark.cdc.schemas import PAGES_SCHEMA
from tiger_etl_spark.cdc.validate import with_validation
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
    batch_seconds: float = 0.0
    partition_counts: dict[str, int] = field(default_factory=dict)


def create_pages_table(
    path: str,
    num_buckets: int = 16,
    write_salts: int = 1,
    enrich_ddl: str | None = None,
    compact_cluster_ts: str | None = None,
    stats_cols: str | None = None,
) -> LakeTable:
    """`enrich_ddl` appends derived columns (e.g. "quality double,
    n_tokens long") to the table schema; fill them at ingest via
    `apply_changes(enrichers=...)`. `compact_cluster_ts`
    ('year'|'month'|'day'|'hour') makes every compaction — including
    run_stream's periodic ones — time-cluster base files. `stats_cols`
    (comma-separated column names, typically the enriched ones) records
    per-file min/max bounds in the manifest at every commit so
    downstream exports can range-prune on them
    (`scan(col_ranges={"quality": (0.8, None)})`)."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in PAGES_SCHEMA.fields)
    if enrich_ddl:
        ddl = f"{ddl}, {enrich_ddl}"
    return LakeTable.create(
        path,
        ddl,
        key_col="url",
        order_cols=("warc_ts",),
        num_buckets=num_buckets,
        props={
            "write_salts": str(write_salts),
            **(
                {"compact_cluster_ts": compact_cluster_ts}
                if compact_cluster_ts
                else {}
            ),
            **({"stats_cols": stats_cols} if stats_cols else {}),
        },
    )


# The named enricher preset the spark-submit jobs expose (--enrich
# standard): derived columns a training-data pipeline filters/exports
# on, computed on LWW winners inside the fused ingest stage. Keeping it
# HERE (library, not job script) means ingest and quarantine REPLAY
# apply the identical expressions — a replay must enrich exactly like
# live ingest or repaired rows land with NULL derived columns.
STANDARD_ENRICH_DDL = (
    "n_chars long, n_tokens long, stopword_ratio double, "
    "detected_lang string, content_fp long"
)
STANDARD_STATS_COLS = "n_tokens"


def standard_enrichers() -> dict:
    from tiger_etl_spark.functions.text import (
        detect_lang,
        doc_fingerprint,
        quality_score_cols,
    )

    q = quality_score_cols(F.col("text"))
    return {
        "n_chars": q["n_chars"],
        "n_tokens": q["n_tokens"],
        "stopword_ratio": q["stopword_ratio"],
        "detected_lang": detect_lang(F.col("text")),
        "content_fp": doc_fingerprint(F.col("text")),
    }


# Head-metadata enricher preset (`--enrich meta`, composable with
# `standard` as `standard+meta`): the crawl-index fields every corpus
# export filters on (noindex pages are excluded from training sets; the
# canonical url feeds url-level dedup). Computing them ON THE WINNERS
# inside the fused merge stage means a later export never has to
# re-scan 100 TB of html for a boolean gate.
PAGE_META_ENRICH_DDL = (
    "title string, meta_description string, canonical_url string, "
    "robots string, noindex boolean, nofollow boolean"
)


def page_meta_enrichers() -> dict:
    from tiger_etl_spark.operators.weblinks import page_meta_cols

    return page_meta_cols(F.col("url"), F.col("html"))


# Main-content preset (`--enrich content`): boilerplate-stripped body
# text (jusText-style link-density rule over the raw html) stored next
# to the tag-strip `text` column — exports can train on `main_text`
# without ever re-touching html. Same fused winners-only stage.
CONTENT_ENRICH_DDL = (
    "main_text string, n_blocks_kept long, n_blocks_total long"
)


def content_enrichers() -> dict:
    from tiger_etl_spark.operators.weblinks import main_content_cols

    return main_content_cols(F.col("html"))


# name → (enricher factory, DDL) for every named preset the jobs accept;
# '+'-composed specs (e.g. 'standard+meta') merge dicts/DDLs in order.
# URL-gate preset (`--enrich urlgate`): the C4/RefinedWeb url-pattern
# keep decision + structural features stored at ingest (scan-stage
# codegen regexes over the winners — zero extra cost), so exports can
# drop search/auth/asset pages via a stored-column row gate
# (`--exclude` on url_ok) without re-parsing urls.
URLGATE_ENRICH_DDL = "url_ok boolean, url_path_depth long"


def urlgate_enrichers() -> dict:
    from tiger_etl_spark.operators.weblinks import url_quality_cols

    cols = url_quality_cols(F.col("url"))
    return {"url_ok": cols["url_ok"], "url_path_depth": cols["path_depth"]}


ENRICH_PRESETS: dict = {
    "standard": (standard_enrichers, STANDARD_ENRICH_DDL),
    "meta": (page_meta_enrichers, PAGE_META_ENRICH_DDL),
    "content": (content_enrichers, CONTENT_ENRICH_DDL),
    "urlgate": (urlgate_enrichers, URLGATE_ENRICH_DDL),
}


def resolve_enrich_spec(spec: str | None) -> tuple[dict | None, str | None]:
    """'standard+meta' → (merged enrichers dict, merged DDL); None → (None,
    None). Unknown names raise — a typo must not silently ingest without
    the columns the operator asked for."""
    if not spec:
        return None, None
    enrichers: dict = {}
    ddls: list[str] = []
    for name in spec.split("+"):
        name = name.strip()
        if name not in ENRICH_PRESETS:
            raise ValueError(
                f"unknown enrich preset {name!r}; known: "
                f"{sorted(ENRICH_PRESETS)}"
            )
        factory, ddl = ENRICH_PRESETS[name]
        enrichers.update(factory())
        ddls.append(ddl)
    return enrichers, ", ".join(ddls)


def _checked_dim(static_dim: tuple, stream_cols: list[str]) -> DataFrame:
    """Validate + sanitize the static dimension once per handle:
    `on` must be a column NAME (a Column-expression join would keep two
    copies of the key and crash the post-join projection); dim columns
    that shadow stream/internal columns are dropped (the stream's value
    wins — a dim that redefines `content_len` must not make the select
    ambiguous); duplicate join keys are rejected (they would multiply
    LWW winners and break the prepared-merge one-row-per-key contract).
    The duplicate check is one tiny action on the (small, broadcastable)
    dim — cached on the DataFrame handle so a streaming run pays it
    once, not per micro-batch."""
    dim_df, on = static_dim
    if not isinstance(on, str):
        raise ValueError(
            "static_dim join key must be a column name (string); a join "
            "expression would keep both key copies and break the "
            "post-join projection"
        )
    if not getattr(dim_df, "_tiger_dim_checked", False):
        dups = (
            dim_df.groupBy(on).count().where(F.col("count") > 1).limit(1).count()
        )
        if dups:
            raise ValueError(
                f"static_dim has duplicate join keys on {on!r}: a 1:N dim "
                "join would multiply LWW winners (one row per key is the "
                "merge contract). Deduplicate the dim first."
            )
        try:
            dim_df._tiger_dim_checked = True
        except AttributeError:
            pass
    shadowed = [c for c in dim_df.columns if c in stream_cols and c != on]
    return dim_df.drop(*shadowed) if shadowed else dim_df


def _fused_dedup_extract(
    table: LakeTable,
    mapped: DataFrame,
    enrichers: dict | None = None,
    static_dim: tuple[DataFrame, object] | None = None,
) -> DataFrame:
    """The hot path, one shuffle total (SURVEY.md §3 steps 3–5 fused):

      repartition(num_buckets, url)        — the ONLY exchange; partition
                                             id == bucket (bucket_expr)
      → groupBy(url).agg(max_by(...))      — LWW winner per url,
                                             partition-local: hash(url,
                                             B) already satisfies the
                                             clustered distribution, so
                                             Catalyst adds NO second
                                             exchange (max_by's struct
                                             buffer forces partial+final
                                             SortAggregate over a
                                             partition-local sort —
                                             pinned in test_plans.py)
      → extract_text_udf(html)             — winners only, scalar Arrow/
                                             pandas UDF: just the html
                                             column crosses the JVM↔
                                             Python boundary, not the row

    The result is still laid out one-partition-per-bucket, so the merge
    writes file-per-bucket with zero further shuffles. Losing events
    never pay the extraction UDF; no per-row Python anywhere.
    """
    normalized = mapped.select(
        "url",
        "warc_ts",
        "html",
        "lang",
        "content_len",
        F.col("op_seq").cast("long").alias("_op_seq"),
        (F.col("op") == "D").alias("_deleted"),
    )
    parts = normalized.repartition(table.num_buckets, F.col(table.key_col))
    payload = [c for c in normalized.columns if c != "url"]
    order = F.struct("warc_ts", "_op_seq")
    winners = (
        parts.groupBy("url")
        .agg(F.max_by(F.struct(*payload), order).alias("_w"))
        .select("url", "_w.*")
    )
    out = winners.select(
        "url",
        "warc_ts",
        "html",
        extract_text_udf(F.col("html")).alias("text"),
        "lang",
        "content_len",
        "_op_seq",
        "_deleted",
        table.bucket_expr().alias("_bucket"),
    )
    if static_dim is not None:
        # stream-static dimension enrichment: a BROADCAST left join with
        # a small dim table (host metadata, language families, domain
        # reputation) on the winners-only, bucket-aligned stage — the
        # broadcast preserves the partitioning, so the prepared merge
        # still writes with zero further shuffles and losers never pay
        # the join. Dim columns persist only if declared in the table
        # schema (enrich_ddl); others feed `enrichers` expressions and
        # are projected away below.
        out = out.join(F.broadcast(_checked_dim(static_dim, out.columns)), static_dim[1], "left")
    if enrichers:
        # derived columns materialized at ingest (quality scores, token
        # counts, fingerprints): computed on WINNERS only, inside the
        # same bucket-aligned stage — no extra shuffle, losers never
        # pay, and scans filter on the stored column instead of
        # recomputing (the CCNet/RefinedWeb "score at ingest" pattern)
        out = out.withColumns(dict(enrichers))
    if static_dim is not None:
        # project to the table's physical columns: un-declared dim
        # columns must not leak into data files
        fields = [
            f.name
            for f in mapped.sparkSession.createDataFrame(
                [], table.schema_ddl
            ).schema.fields
        ]
        have = set(out.columns)
        out = out.select(
            *[f for f in fields if f in have], "_op_seq", "_deleted", "_bucket"
        )
    return out


# Applied-batch bookkeeping is BOUNDED: Structured Streaming delivers
# micro-batch ids in increasing order per checkpoint and can only ever
# re-deliver batches at/after the last un-checkpointed one, so "id <=
# high-watermark" proves applied without keeping every id. The props
# carry the watermark plus a recent-ids window (snapshot-id correlation
# for replay diagnostics); without the trim a 10^10-event stream's
# manifest would grow by one entry per batch and be rewritten per
# commit — O(n^2) manifest I/O over the stream's life.
APPLIED_WINDOW = 64


def batch_applied(props: dict, batch_id: int) -> bool:
    if str(batch_id) in props.get("applied_batches", {}):
        return True
    hwm = props.get("applied_batch_hwm")
    return hwm is not None and batch_id <= int(hwm)


def applied_batches_update(
    props: dict, applied: dict, batch_id: int, snapshot_id: int
) -> dict:
    new = {**applied, str(batch_id): snapshot_id}
    hwm = max(
        int(props.get("applied_batch_hwm", -1)),
        max(int(k) for k in new),
    )
    trimmed = {k: v for k, v in new.items() if int(k) > hwm - APPLIED_WINDOW}
    return {"applied_batches": trimmed, "applied_batch_hwm": hwm}


def apply_changes(
    spark: SparkSession,
    table: LakeTable,
    events: DataFrame,
    batch_id: int,
    watermark_hours: int = WATERMARK_HOURS_DEFAULT,
    merge_mode: str = "mor",
    enrichers: dict | None = None,
    static_dim: tuple[DataFrame, object] | None = None,
) -> LineageRecord:
    """Apply one bounded batch of raw change events. `events` has the
    superset read schema (cdc.schemas.EVENTS_READ_SCHEMA).

    `enrichers`: name → Column over (url, warc_ts, html, text, lang,
    content_len), materialized into matching `enrich_ddl` table columns
    at ingest (winners only on the fused path). `static_dim`:
    (dim_df, on) — broadcast left-join a small static dimension onto
    the winners before enrichment (stream-static join; dim columns
    persist when declared in the table schema, and enrichers may
    reference them)."""
    applied = table.props.get("applied_batches", {})
    if batch_applied(table.props, batch_id):
        # exactly-once: replayed batch (restart between data commit and
        # checkpoint commit) — skip without touching the table
        return LineageRecord(
            batch_id=batch_id,
            offset_start="",
            offset_end="",
            snapshot_id=table.manifest["snapshot_id"],
        )

    timing = os.environ.get("SPARK_GRAFT_TIMING") == "1"
    marks: list[tuple[str, float]] = [("start", time.time())]

    def mark(name: str) -> None:
        if timing:
            marks.append((name, time.time()))

    # ONE Spark job per micro-batch: every lineage counter rides the
    # write job as an Observation (CollectMetrics on the scan side of the
    # shuffle) instead of its own aggregation pass — per-batch driver
    # jobs are the fixed cost that bounds streaming throughput and
    # scaling efficiency.
    from pyspark.sql import Observation

    checked = with_validation(events)
    is_valid = F.size("_invalid_reasons") == 0

    # late-data accounting per streaming semantics: an event is late if
    # it arrives behind the watermark established by PRIOR batches
    # (high_watermark − horizon). Late rows are still applied — the LWW
    # guard makes stale ones no-ops — but counted to lineage.
    prev_wm = table.props.get("high_watermark")
    if prev_wm is not None:
        late_pred = F.col("warc_ts") < (
            F.lit(prev_wm).cast("timestamp")
            - F.expr(f"INTERVAL {watermark_hours} HOURS")
        )
    else:
        late_pred = F.lit(False)

    def metric_cols() -> list:
        return [
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(
                F.coalesce(F.length("html"), F.length("body"), F.lit(0))
                + F.coalesce(F.length("url"), F.lit(0))
            ).alias("bytes_in"),
            F.min("batch_file").alias("offset_start"),
            F.max("batch_file").alias("offset_end"),
            # watermark advances on VALID rows only: one quarantined event
            # with a bogus far-future timestamp would otherwise poison the
            # never-regressing high_watermark and mark every later event
            # late (and mislead tombstone-horizon choices) forever
            F.max(F.when(is_valid, F.col("warc_ts"))).alias("max_ts"),
            F.sum((~is_valid).cast("long")).alias("n_quarantined"),
            F.sum((is_valid & late_pred).cast("long")).alias("n_late"),
        ]

    obs = Observation(f"lineage_b{batch_id}")
    unobserved = checked  # fallback plan without the CollectMetrics node
    checked = checked.observe(obs, *metric_cols())
    valid = checked.where(is_valid).drop("_invalid_reasons")
    mapped = map_to_live_schema(valid)

    record = LineageRecord(
        batch_id=batch_id, offset_start="", offset_end="", snapshot_id=0
    )

    # quarantine (dead-letter) split runs as a CONCURRENT Spark job while
    # the main merge-write job runs — serializing it after the merge
    # costs 0.3-2 s/batch (measured). Discipline: the thread is ALWAYS
    # joined before apply_changes returns or raises; an all-valid batch
    # leaves no (empty) dir behind; a failed merge removes the batch's
    # dead-letter dir so nothing stray outlives an uncommitted batch.
    import shutil
    import threading

    qdir = os.path.join(table.path, "_quarantine", f"batch_id={batch_id}")
    q_err: list[Exception] = []

    def write_quarantine() -> None:
        try:
            with_validation(events).where(~is_valid).withColumn(
                "_invalid_reasons", F.array_join("_invalid_reasons", ",")
            ).write.mode("overwrite").parquet(qdir)
        except Exception as e:  # surfaced at join time
            q_err.append(e)

    q_thread = threading.Thread(target=write_quarantine)
    q_thread.start()

    def commit_props() -> dict:
        """Runs after the write job, before the atomic commit: fold the
        observed metrics into the same commit as the data files, and
        join the quarantine job so a reader never sees a committed batch
        without its dead-letter rows."""
        try:
            m = obs.get
            if not m or not m.get("rows_in"):
                raise ValueError("empty/degenerate observation")
        except Exception:
            # When a batch dedupes/filters to ZERO write rows, AQE can
            # propagate the empty relation past the CollectMetrics node:
            # the observation then completes either with a schema-less
            # row py4j cannot deserialize, or with a default row
            # (count 0, null sums) that never saw the input — all-invalid
            # batches hit this. Recompute the identical aggregates
            # directly; for a genuinely empty batch the recompute is an
            # empty scan, so the extra pass is paid only in this rare
            # degenerate case.
            m = unobserved.agg(*metric_cols()).first().asDict()
        mark("observe")
        record.offset_start = m["offset_start"] or ""
        record.offset_end = m["offset_end"] or ""
        record.rows_in = m["rows_in"]
        record.rows_quarantined = m["n_quarantined"] or 0
        record.rows_late = m["n_late"] or 0
        record.bytes_in = m["bytes_in"] or 0
        q_thread.join()
        if q_err:
            raise q_err[0]
        if not record.rows_quarantined:
            shutil.rmtree(qdir, ignore_errors=True)
        mark("quarantine")
        high_wm = m["max_ts"]
        if prev_wm is not None and (high_wm is None or str(high_wm) < prev_wm):
            high_wm = prev_wm  # watermark never regresses
        return {
            **applied_batches_update(table.props, applied, batch_id,
                                     table.manifest["snapshot_id"] + 1),
            "high_watermark": str(high_wm) if high_wm else None,
        }

    try:
        if merge_mode == "mor" and table.merge_policy == "lww":
            batch = _fused_dedup_extract(table, mapped, enrichers, static_dim)
            stats = table.merge(
                spark, batch, mode="mor", prepared=True, props_updates_fn=commit_props
            )
            mark("merge")
        else:
            # partial-policy tables store raw events (no batch collapse;
            # see LakeTable.merge) — the fused winners-only path does
            # not apply, so every event pays extraction
            from tiger_etl_spark.functions.text import extract_text_udf

            batch = mapped.withColumn(
                "text", extract_text_udf(F.col("html"))
            ).select(
                "op", "op_seq", "url", "warc_ts", "html", "text", "lang", "content_len"
            )
            if static_dim is not None:
                # same stream-static enrichment as the fused path —
                # silently dropping the flag on cow/partial tables would
                # null declared dim columns (or crash enrichers that
                # reference dim fields) with no signal to the operator
                batch = batch.join(
                    F.broadcast(_checked_dim(static_dim, batch.columns)),
                    static_dim[1],
                    "left",
                )
            if enrichers:
                batch = batch.withColumns(dict(enrichers))
            if static_dim is not None:
                fields = [
                    f.name
                    for f in spark.createDataFrame([], table.schema_ddl).schema.fields
                ]
                have = set(batch.columns)
                batch = batch.select(
                    "op", "op_seq", *[f for f in fields if f in have]
                )
            stats = table.merge(
                spark, batch, mode=merge_mode, props_updates_fn=commit_props
            )
    except BaseException:
        # failed (uncommitted) batch: no thread outlives this call, no
        # dead-letter rows remain for a batch that never committed
        q_thread.join()
        shutil.rmtree(qdir, ignore_errors=True)
        raise

    record.snapshot_id = stats.snapshot_id
    record.rows_applied = stats.rows_upserted
    record.partition_counts = stats.partition_counts
    record.batch_seconds = round(time.time() - marks[0][1], 3)
    _write_lineage(table, record)
    mark("lineage")
    if timing:
        deltas = {
            marks[i][0]: round(marks[i][1] - marks[i - 1][1], 3)
            for i in range(1, len(marks))
        }
        print(
            f"TIMING batch={batch_id} t={time.time() % 100000:.1f} {deltas}",
            flush=True,
        )
    return record


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
            "batch_seconds": pa.array([row["batch_seconds"]], pa.float64()),
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
    """Dead-letter rows. Batches with nothing invalid write no
    quarantine dir at all (the common case), so absence = empty."""
    qdir = os.path.join(table.path, "_quarantine")
    if not os.path.isdir(qdir):
        from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA

        return spark.createDataFrame([], EVENTS_READ_SCHEMA).withColumns(
            {
                "_invalid_reasons": F.lit(None).cast("string"),
                "batch_id": F.lit(None).cast("long"),
            }
        )
    return spark.read.option("basePath", qdir).parquet(qdir)


def replay_quarantine(
    spark: SparkSession,
    table: LakeTable,
    fixer=None,
    enrichers: dict | None = None,
    static_dim: tuple[DataFrame, object] | None = None,
) -> dict:
    """Reprocess dead-letter rows (the recovery half of the quarantine
    split — the reference raises per-row and drops the request,
    validations.py:49-430; a pipeline must instead repair and re-ingest).

    Per quarantined batch dir: read the original wire-schema rows, apply
    the optional `fixer(df) -> df` repair transform, re-validate, run
    now-valid rows through the same fused dedup→extract→MERGE hot path
    as live ingest, and rewrite the dir with only the rows that are
    STILL invalid (removing it when none are). Deliberately does NOT
    touch the applied-batch ledger — those ids belong to the stream's
    exactly-once bookkeeping, and a replayed merge is idempotent under
    the LWW guard anyway, which also makes this call crash-safe: a crash
    between merge-commit and dir-rewrite just re-merges no-op winners on
    the next call. An administrative operation (one merge commit per
    dead-letter batch), not a hot-path one.
    """
    import glob
    import shutil

    from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA

    qroot = os.path.join(table.path, "_quarantine")
    read_schema = T.StructType(
        list(EVENTS_READ_SCHEMA.fields)
        + [T.StructField("_invalid_reasons", T.StringType(), True)]
    )
    out = {"batches": 0, "rows_applied": 0, "rows_still_invalid": 0}
    # crash recovery for the rewrite swap below: an aside dir whose
    # batch dir is missing means we died between the two renames —
    # restore it (the conservative superset; re-replaying it is
    # idempotent). An aside WITH a live batch dir is post-swap debris.
    for aside in glob.glob(os.path.join(qroot, ".replaced-batch_id=*")):
        bname = os.path.basename(aside)[len(".replaced-"):].rsplit("-", 1)[0]
        target = os.path.join(qroot, bname)
        if os.path.exists(target):
            shutil.rmtree(aside, ignore_errors=True)
        else:
            os.rename(aside, target)
    for qdir in sorted(glob.glob(os.path.join(qroot, "batch_id=*"))):
        df = spark.read.schema(read_schema).parquet(qdir).drop("_invalid_reasons")
        if fixer is not None:
            df = fixer(df)
        checked = with_validation(df)
        is_valid = F.size("_invalid_reasons") == 0
        counts = checked.select(
            F.sum(is_valid.cast("long")).alias("ok"),
            F.sum((~is_valid).cast("long")).alias("bad"),
        ).first()
        n_ok, n_bad = counts["ok"] or 0, counts["bad"] or 0
        if n_ok:
            mapped = map_to_live_schema(checked.where(is_valid).drop("_invalid_reasons"))
            if table.merge_policy == "lww":
                # pass static_dim exactly as live ingest did — a replay
                # that enriched differently would null dim columns
                batch = _fused_dedup_extract(table, mapped, enrichers, static_dim)
                table.merge(spark, batch, mode="mor", prepared=True)
            else:
                # partial-policy tables store raw events (see apply_changes)
                batch = mapped.withColumn(
                    "text", extract_text_udf(F.col("html"))
                ).select(
                    "op", "op_seq", "url", "warc_ts",
                    "html", "text", "lang", "content_len",
                )
                if static_dim is not None:
                    batch = batch.join(
                        F.broadcast(_checked_dim(static_dim, batch.columns)),
                        static_dim[1],
                        "left",
                    )
                if enrichers:
                    batch = batch.withColumns(dict(enrichers))
                if static_dim is not None:
                    fields = [
                        f.name
                        for f in spark.createDataFrame(
                            [], table.schema_ddl
                        ).schema.fields
                    ]
                    have = set(batch.columns)
                    batch = batch.select(
                        "op", "op_seq", *[f for f in fields if f in have]
                    )
                table.merge(spark, batch, mode="mor")
        if n_bad:
            still = checked.where(~is_valid).withColumn(
                "_invalid_reasons", F.array_join("_invalid_reasons", ",")
            )
            # tmp name must sit OUTSIDE the `batch_id=*` glob namespace
            # (and be dot-hidden from partition discovery): a crash
            # between write and rename must never leave a phantom dir a
            # later replay or read_quarantine would treat as a batch
            import uuid as _uuid

            tmp = os.path.join(qroot, f".replay-tmp-{_uuid.uuid4().hex}")
            still.write.mode("overwrite").parquet(tmp)
            # swap via aside-rename, not rmtree-then-rename: a crash
            # between an rmtree and the rename would leave the
            # still-invalid rows only in the dot-hidden tmp dir, where
            # read_quarantine and later replays never look — silent row
            # loss. With the aside swap every crash point leaves the
            # rows visible under either the old or the new dir.
            aside = os.path.join(
                qroot,
                f".replaced-{os.path.basename(qdir)}-{_uuid.uuid4().hex}",
            )
            os.rename(qdir, aside)
            os.rename(tmp, qdir)
            shutil.rmtree(aside, ignore_errors=True)
        else:
            shutil.rmtree(qdir, ignore_errors=True)
        out["batches"] += 1
        out["rows_applied"] += n_ok
        out["rows_still_invalid"] += n_bad
    return out


def read_audit_rejects(spark: SparkSession, table: LakeTable) -> DataFrame:
    """All audit-rejected batches' raw wire rows, with their batch id."""
    import glob as _glob

    from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA

    root = os.path.join(table.path, "_audit_rejects")
    dirs = sorted(_glob.glob(os.path.join(root, "batch_id=*")))
    if not dirs:
        return spark.createDataFrame([], EVENTS_READ_SCHEMA).withColumn(
            "_reject_batch_id", F.lit(None).cast("long")
        )
    parts = []
    for d in dirs:
        bid = int(os.path.basename(d).split("=", 1)[1])
        parts.append(
            spark.read.schema(EVENTS_READ_SCHEMA)
            .parquet(d)
            .withColumn("_reject_batch_id", F.lit(bid).cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replay_audit_rejects(
    spark: SparkSession,
    table: LakeTable,
    fixer=None,
    audit=None,
    enrichers: dict | None = None,
    static_dim: tuple[DataFrame, object] | None = None,
) -> dict:
    """Repair-and-reingest for WHOLE batches the Write-Audit-Publish
    gate dead-lettered (`run_stream(audit_policy='quarantine')`): the
    per-batch analog of `replay_quarantine`'s per-row recovery.

    Per reject dir: read the raw wire rows, apply the optional
    `fixer(df) -> df` repair, re-validate (rows the fixer could not
    save are routed into the normal per-row quarantine dead-letter for
    this batch when the repair publishes — `replay_quarantine` is their
    recovery loop), then merge through the SAME fused hot path — STAGED,
    and re-judged
    by `audit` (an AuditSpec, typically the same spec the stream ran):
    a repair that still fails the gate aborts trace-free and keeps the
    reject dir for another round. On publish the dir is removed and the
    batch's `audit_rejected` prop entry cleared (it stays in the
    applied ledger — the stream must keep skipping it).

    Crash-safe by idempotence: a crash between publish and dir removal
    re-replays a merge whose rows are LWW no-ops, the audit passes on
    the already-repaired state, and the dir is removed then.
    """
    import glob as _glob
    import shutil as _shutil

    from tiger_etl_spark.cdc.schemas import EVENTS_READ_SCHEMA
    from tiger_etl_spark.lake.wap import abort_staged, manifest_rows

    root = os.path.join(table.path, "_audit_rejects")
    out = {
        "batches": 0,
        "published": 0,
        "still_failing": 0,
        "rows_applied": 0,
        "rows_dropped_invalid": 0,
    }
    for rdir in sorted(_glob.glob(os.path.join(root, "batch_id=*"))):
        bid = int(os.path.basename(rdir).split("=", 1)[1])
        df = spark.read.schema(EVENTS_READ_SCHEMA).parquet(rdir)
        if fixer is not None:
            df = fixer(df)
        checked = with_validation(df)
        is_valid = F.size("_invalid_reasons") == 0
        counts = checked.select(
            F.sum(is_valid.cast("long")).alias("ok"),
            F.sum((~is_valid).cast("long")).alias("bad"),
        ).first()
        n_ok, n_bad = counts["ok"] or 0, counts["bad"] or 0
        out["batches"] += 1
        out["rows_dropped_invalid"] += n_bad
        if not n_ok:
            continue
        mapped = map_to_live_schema(
            checked.where(is_valid).drop("_invalid_reasons")
        )
        base_rows = manifest_rows(table)
        pre_paths = {f["path"] for f in table.manifest["files"]}
        table._defer_pointer = True
        try:
            if table.merge_policy == "lww":
                batch = _fused_dedup_extract(table, mapped, enrichers, static_dim)
                table.merge(spark, batch, mode="mor", prepared=True)
            else:
                from tiger_etl_spark.functions.text import extract_text_udf

                batch = mapped.withColumn(
                    "text", extract_text_udf(F.col("html"))
                ).select(
                    "op", "op_seq", "url", "warc_ts", "html", "text",
                    "lang", "content_len",
                )
                table.merge(spark, batch, mode="mor")
            res = None
            if audit is not None:
                # same delta scope as the streaming gate: judge only the
                # files this replay staged — O(batch), tombstones out
                new_files = [
                    f
                    for f in table.manifest["files"]
                    if f["path"] not in pre_paths
                ]
                delta = table._read_files(spark, new_files).where(
                    ~F.col("_deleted")
                )
                res = audit.evaluate(
                    spark,
                    delta,
                    base_rows=base_rows,
                    staged_rows=manifest_rows(table),
                )
        finally:
            table._defer_pointer = False
        if res is not None and not res.passed:
            abort_staged(table)
            out["still_failing"] += 1
            continue
        LakeTable._write_pointer(table.path, table.manifest["version"])
        out["published"] += 1
        out["rows_applied"] += n_ok
        if n_bad:
            # preserve the rows the fixer could not save: they re-enter
            # the per-row dead-letter (their original stream-time copy
            # was subsumed into this reject dir when the batch bounced)
            checked.where(~is_valid).withColumn(
                "_invalid_reasons", F.array_join("_invalid_reasons", ",")
            ).write.mode("overwrite").parquet(
                os.path.join(table.path, "_quarantine", f"batch_id={bid}")
            )
        _shutil.rmtree(rdir, ignore_errors=True)
        rejected = dict(table.props.get("audit_rejected", {}))
        if rejected.pop(str(bid), None) is not None:
            table.update_props({"audit_rejected": rejected})
    return out
