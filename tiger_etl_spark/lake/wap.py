"""Write-Audit-Publish (WAP) for CDC ingest.

The table-level quarantine gate: a change batch is MERGEd onto a STAGED
snapshot (manifest written, ``meta/_current`` pointer untouched — the
``LakeTransaction`` staging protocol, lake/txn.py), audited against
declarative data-quality checks evaluated on the staged state, and only
then published by the atomic pointer flip. A failing audit aborts: the
staged manifest is deleted and readers never observed anything. This is
the Iceberg WAP workflow (branch → audit → fast-forward) re-expressed
over this lake's versioned-manifest + pointer design.

Reference analog: the closest surface is ``execute_transaction``'s
all-or-nothing batching (pg_db.py:440-475) — the reference validates
rows BEFORE insert (per-row validators); WAP validates the RESULTING
TABLE STATE before readers can see it, which is the only form that can
catch whole-batch pathologies (a truncating replay, a null-flood from an
upstream schema break, a fan-out bug doubling the row count).

Scale notes: every declarative check is folded into ONE narrow
aggregation pass over the staged scan (a single job, partial-aggregated,
no shuffle beyond the final 1-row reduce); the row-delta check compares
manifest row counts on both sides and reads no data at all. Audit cost
is therefore at most one scan of the table regardless of how many
checks are registered.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.lake.table import LakeTable, MergeStats
from tiger_etl_spark.lake.txn import LakeTransaction


@dataclass
class AuditResult:
    passed: bool
    failures: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


class WapCommit:
    """One staged commit on one table: ``merge`` → ``audit`` →
    ``publish`` | ``abort``. The staged snapshot is visible ONLY through
    this handle (``staged_scan``); fresh ``LakeTable.load`` readers keep
    the published snapshot until ``publish`` flips the pointer.

    Crash behavior is inherited from LakeTransaction: crash before
    ``publish`` leaves the pointer untouched (staged manifest inert,
    overwritten by the next commit); ``publish`` writes the intent file
    first, so a crash mid-publish is rolled forward by
    ``LakeTransaction.recover``.
    """

    def __init__(self, table: LakeTable, txn_dir: str):
        self.table = table
        self.base_version = table.manifest["version"]
        self.base_rows = sum(f["rows"] for f in table.manifest["files"])
        self.txn = LakeTransaction(txn_dir)
        self.checks: list[tuple[str, F.Column]] = []
        self.bounds: list[tuple[str, str, float]] = []

    # ------------------------------------------------------------ write
    def merge(self, spark: SparkSession, batch: DataFrame, **kw) -> MergeStats:
        return self.txn.merge(self.table, spark, batch, **kw)

    def delete_where(self, spark: SparkSession, predicate, op_seq: int):
        return self.txn.delete_where(self.table, spark, predicate, op_seq)

    def staged_scan(self, spark: SparkSession) -> DataFrame:
        """The post-merge table state the audit judges (and what readers
        WILL see after publish)."""
        return self.table.scan(spark)

    # ------------------------------------------------------------ audit
    def check_max_null_frac(self, col: str, max_frac: float) -> "WapCommit":
        """Fail if > max_frac of staged rows have NULL in `col` — the
        upstream-schema-break detector."""
        name = f"null_frac({col})<={max_frac}"
        self.checks.append(
            (name, F.avg(F.col(col).isNull().cast("double")))
        )
        self.bounds.append((name, "max", float(max_frac)))
        return self

    def check_max_violation_frac(
        self, name: str, predicate, max_frac: float
    ) -> "WapCommit":
        """Fail if > max_frac of staged rows violate `predicate` (a
        boolean Column over the table schema). NULL predicate results
        count as violations."""
        label = f"violation_frac({name})<={max_frac}"
        ok = F.coalesce(predicate.cast("boolean"), F.lit(False))
        self.checks.append((label, F.avg((~ok).cast("double"))))
        self.bounds.append((label, "max", float(max_frac)))
        return self

    def check_rows_delta_frac(self, max_frac: float) -> "WapCommit":
        """Fail if the staged snapshot's STORED row count (manifest file
        entries — raw rows including tombstones, the same accounting on
        both sides) moved more than max_frac relative to the published
        snapshot — catches truncating replays and fan-out bugs with ZERO
        data read: both counts come from manifests."""
        self._delta_bound = float(max_frac)
        return self

    _delta_bound: float | None = None

    def audit(self, spark: SparkSession) -> AuditResult:
        """Evaluate every registered check in ONE aggregation job over
        the staged scan (plus the manifest-only row-delta check, which
        reads no data)."""
        failures, metrics = [], {}
        if self._delta_bound is not None:
            staged_rows = sum(
                f["rows"] for f in self.table.manifest["files"]
            )
            base = float(self.base_rows)
            delta = abs(staged_rows - base) / base if base > 0 else 0.0
            name = f"rows_delta_frac<={self._delta_bound}"
            metrics[name] = delta
            if delta > self._delta_bound:
                failures.append(name)
        if self.checks:
            aggs = [
                c.alias(f"_m{i}") for i, (_, c) in enumerate(self.checks)
            ]
            row = self.staged_scan(spark).agg(*aggs).first()
            for i, (name, _) in enumerate(self.checks):
                val = row[f"_m{i}"]
                bound = self.bounds[i][2]
                metrics[name] = float(val) if val is not None else 0.0
                if val is not None and float(val) > bound:
                    failures.append(name)
        return AuditResult(passed=not failures, failures=failures, metrics=metrics)

    # ---------------------------------------------------------- lifecycle
    def publish(self) -> int:
        """Atomic pointer flip (via the transaction's intent-logged
        commit point). Returns the published version."""
        self.txn.commit()
        return self.table.manifest["version"]

    def abort(self) -> int:
        """Discard the staged snapshot; readers never saw it. Returns
        the still-published version."""
        self.txn.abort()
        return self.table.manifest["version"]

    def run(self, spark: SparkSession) -> AuditResult:
        """audit → publish-or-abort in one call (the streaming
        foreachBatch shape: stage the micro-batch merge, then
        ``wap.run(spark)``)."""
        result = self.audit(spark)
        if result.passed:
            self.publish()
        else:
            self.abort()
        return result
