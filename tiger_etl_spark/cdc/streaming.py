"""Structured Streaming wrapper (SURVEY.md §7 stage 4).

`readStream` over the change-file directory (binlog/WAL-tail analog:
files land in offset order, `maxFilesPerTrigger` bounds each micro-batch
— the reference's bulk-op cap of 100 rows,
user_group_management.py:1406-1407, lifted to batch granularity) →
event-time watermark → `foreachBatch` → batch apply core → lake MERGE.

Exactly-once: the file source + checkpoint give replayable offsets; the
applied-batch bookkeeping committed atomically with each MERGE makes
replays no-ops; the LWW guard makes even uncheckpointed double-applies
harmless. Restart-from-checkpoint tests in tests/test_streaming.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from tiger_etl_spark.cdc.pipeline import (
    APPLIED_WINDOW,
    WATERMARK_HOURS_DEFAULT,
    LineageRecord,
    apply_changes,
    applied_batches_update,
    batch_applied,
)
from tiger_etl_spark.cdc.sources import read_change_stream
from tiger_etl_spark.lake import LakeTable


@dataclass
class StreamResult:
    lineage: list[LineageRecord] = field(default_factory=list)
    batches_applied: int = 0
    batches_skipped: int = 0
    batches_rejected: int = 0
    audit_failures: list[tuple[int, list[str]]] = field(default_factory=list)


class AuditRejected(RuntimeError):
    """Raised (audit_policy='halt') when a micro-batch fails the audit
    gate: the staged snapshot was aborted, the checkpoint did NOT
    advance, and a restart re-delivers the same batch — fail-closed."""

    def __init__(self, batch_id: int, failures: list[str]):
        super().__init__(
            f"batch {batch_id} failed audit: {', '.join(failures)}"
        )
        self.batch_id = batch_id
        self.failures = failures


def _audit_rejected(props: dict, batch_id: int) -> bool:
    return str(batch_id) in props.get("audit_rejected", {})


def run_stream(
    spark: SparkSession,
    change_dir: str,
    table_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
    watermark_hours: int = WATERMARK_HOURS_DEFAULT,
    merge_mode: str = "mor",
    compact_every: int = 0,
    maintain_every: int = 0,
    available_now: bool = True,
    file_format: str = "parquet",
    views: list | None = None,
    enrichers: dict | None = None,
    static_dim=None,
    history_path: str | None = None,
    audit=None,
    audit_policy: str = "halt",
) -> StreamResult:
    """Process all currently-available change files (availableNow
    trigger: drains the backlog in bounded micro-batches, then stops —
    the batch-oriented CDC tail). Resumable: same checkpoint_dir resumes
    from recorded offsets. `file_format`: "parquet", "jsonl" or "warc"
    (cdc/sources.py) — identical normalized columns either way.

    `compact_every` / `maintain_every`: run `table.compact` (always) or
    `table.maintain` (threshold-gated compaction + snapshot expiry)
    after every N applied batches — maintenance interleaved mid-stream
    rather than as a separate job; per-batch wall time must stay flat
    across these (pinned by test_streaming + the soak bench).

    `views`: IncrementalCountView instances refreshed after every batch
    commit (continuous materialized views on the ingest path — each
    refresh scans only the buckets the batch touched, via the manifest
    diff; a refresh crash never corrupts the table, the next one
    catches up). `enrichers`: see `apply_changes`.

    `history_path`: an SCD2 history table (cdc/history.py:
    create_history_table) maintained from the SAME micro-batches — each
    batch folds to version fragments under its own applied-batch
    ledger, so a crash between the main merge and the history merge
    replays into a per-table no-op/apply pair and both converge.

    `audit`: a ``lake.wap.AuditSpec`` — the Write-Audit-Publish gate per
    micro-batch: the merge lands on a STAGED snapshot (pointer not
    flipped), the check set runs in one aggregation pass over the
    batch's STAGED DELTA FILES (the manifest diff — O(batch) per
    micro-batch, never a table scan; under cow, the touched buckets'
    post-image; tombstones excluded), and only a passing batch is
    published. A failing batch is
    aborted trace-free, then per `audit_policy`:
    - 'halt' (default, fail-closed): raise AuditRejected; the checkpoint
      did not advance, so a restart re-delivers the batch — an operator
      must fix or drop it.
    - 'quarantine': dead-letter the RAW batch under
      `<table>/_audit_rejects/batch_id=N/` (reasons in `_reasons.json`),
      mark the batch applied in the ledger (so replay skips it, and the
      SCD2 history/views never see it), and continue the stream.
    Audit cost is one extra job per batch — enable it when a bad publish
    is costlier than that scan (it usually is)."""
    result = StreamResult()

    source = read_change_stream(
        spark, change_dir, file_format, max_files_per_trigger
    ).withWatermark("warc_ts", f"{watermark_hours} hours")

    # one manifest load per stream, not per batch: merge() keeps the
    # in-memory handle at the committed snapshot, so re-parsing the
    # (file-list-sized) manifest JSON every trigger is pure fixed cost.
    # Invalidated on failure — the retry reloads from disk.
    cache: dict[str, LakeTable] = {}

    def maintain_history(batch_df, batch_id: int) -> None:
        if history_path is None:
            return
        from tiger_etl_spark.cdc.history import apply_scd2_changes

        hist = cache.pop("history", None) or LakeTable.load(history_path)
        # idempotent under ITS OWN ledger — a replay that the main table
        # skips may still need applying here (crash between the two
        # merges), and vice versa
        apply_scd2_changes(spark, hist, batch_df, batch_id)
        cache["history"] = hist

    def handle(batch_df, batch_id: int):
        table = cache.pop("table", None) or LakeTable.load(table_path)
        if batch_applied(table.props, batch_id):
            # replayed batch (crash landed between merge commit and
            # checkpoint commit). The data is in; the views may not be —
            # the same crash window can precede their refresh — so
            # refresh (idempotent, no-op when current) runs here too.
            # An audit-REJECTED batch is in the ledger but its data was
            # never published — history/views must not see it either.
            result.batches_skipped += 1
            if not _audit_rejected(table.props, batch_id):
                for v in views or ():
                    v.refresh(spark, table)
                maintain_history(batch_df, batch_id)
            cache["table"] = table
            return

        if audit is not None:
            from pyspark.sql import functions as F

            from tiger_etl_spark.lake.wap import abort_staged, manifest_rows

            base_rows = manifest_rows(table)
            pre_paths = {f["path"] for f in table.manifest["files"]}
            table._defer_pointer = True
            try:
                rec = apply_changes(
                    spark,
                    table,
                    batch_df,
                    batch_id,
                    watermark_hours=watermark_hours,
                    merge_mode=merge_mode,
                    enrichers=enrichers,
                    static_dim=static_dim,
                )
                # DELTA-scoped audit: judge only the files THIS batch
                # staged (manifest diff — known without any listing), so
                # the gate costs O(batch) per micro-batch, never a full
                # table scan. Tombstones carry null payloads by design
                # and are excluded from the fraction checks.
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
            if not res.passed:
                import json as _json
                import os as _os
                import shutil as _shutil

                abort_staged(table)
                # the staged commit's per-row dead-letter split is
                # subsumed by the whole-batch reject copy below
                _shutil.rmtree(
                    _os.path.join(
                        table.path, "_quarantine", f"batch_id={batch_id}"
                    ),
                    ignore_errors=True,
                )
                result.batches_rejected += 1
                result.audit_failures.append((batch_id, res.failures))
                if audit_policy == "halt":
                    raise AuditRejected(batch_id, res.failures)
                # quarantine policy: dead-letter the raw batch, then mark
                # it applied (props-only commit) so replay and later
                # maintenance skip it — the stream keeps going
                rdir = _os.path.join(
                    table.path, "_audit_rejects", f"batch_id={batch_id}"
                )
                batch_df.write.mode("overwrite").parquet(rdir)
                with open(_os.path.join(rdir, "_reasons.json"), "w") as fh:
                    fh.write(
                        _json.dumps(
                            {"failures": res.failures, "metrics": res.metrics}
                        )
                    )
                hwm = int(table.props.get("applied_batch_hwm", -1))
                rejected = {
                    k: v
                    for k, v in {
                        **table.props.get("audit_rejected", {}),
                        str(batch_id): ",".join(res.failures),
                    }.items()
                    if int(k) > max(hwm, batch_id) - APPLIED_WINDOW
                }
                table.update_props(
                    {
                        **applied_batches_update(
                            table.props,
                            table.props.get("applied_batches", {}),
                            batch_id,
                            table.manifest["snapshot_id"],
                        ),
                        "audit_rejected": rejected,
                    }
                )
                cache["table"] = table
                return
            # audit passed: publish = the atomic pointer flip. A crash
            # BEFORE this line leaves the staged manifest inert and the
            # checkpoint unadvanced — the replay simply re-stages.
            LakeTable._write_pointer(table.path, table.manifest["version"])
        else:
            rec = apply_changes(
                spark,
                table,
                batch_df,
                batch_id,
                watermark_hours=watermark_hours,
                merge_mode=merge_mode,
                enrichers=enrichers,
                static_dim=static_dim,
            )
        result.lineage.append(rec)
        result.batches_applied += 1
        if compact_every and (result.batches_applied % compact_every == 0):
            table.compact(spark)
        if maintain_every and (
            result.batches_applied % maintain_every == 0
        ):
            # full maintenance mid-stream (the operational mode of a
            # long-lived tail): threshold-gated compaction + snapshot
            # expiry. Both commit through the same snapshot machinery,
            # so a concurrent reader never sees a partial rewrite and
            # the exactly-once ledger is untouched.
            table.maintain(spark)
        for v in views or ():
            v.refresh(spark, table)
        maintain_history(batch_df, batch_id)
        cache["table"] = table

    writer = (
        source.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("cdc_apply")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.processAllAvailable()
        q.stop()
    return result
