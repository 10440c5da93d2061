"""Downstream replica maintenance off the change data feed.

The reference ships data *out* of Postgres with per-table full reads
(`PostgresDB.read`, pg_db.py); at lake scale a downstream copy (a
serving replica, a cross-region mirror, a redacted export) must follow
INCREMENTS. `sync_to` tails the source's snapshot lineage through
`LakeTable.changes_between` (net-effect I/U/D per key between two
versions — a bucket-aligned full-outer join, no event log replay) and
applies each increment as one MERGE into the replica.

Exactly-once bookkeeping mirrors the ingest pipeline's: the last
synced SOURCE version rides the replica's own atomic commit
(`merge(props_updates=...)`), so a crash between diff and commit
re-syncs the same interval — and re-merging the same interval is
idempotent (same keys, same LWW order, same winners). `op_seq` for
the synthetic change events is the source version being applied:
monotone across syncs, constant within one, so replays can never
reorder against later syncs.

Caveat (documented, inherent to net-effect feeds): a delete whose
tombstone was garbage-collected on the source (`compact(
tombstone_horizon=...)`) before the replica ever saw it cannot be
emitted; run `sync_to` at least as often as tombstones are retained.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.lake.table import LakeTable

_PROP = "replica_src_version"


def sync_to(spark: SparkSession, source: LakeTable, replica: LakeTable) -> dict:
    """Bring `replica` up to `source`'s current snapshot. Returns sync
    stats; no-op (and no commit) when already current."""
    v_from = int(replica.props.get(_PROP, 0))
    v_to = int(source.manifest["version"])
    if v_to == v_from:
        return {
            "src_version_from": v_from,
            "src_version_to": v_to,
            "synced": False,
        }
    if v_to < v_from:
        raise ValueError(
            f"replica is ahead of source ({v_from} > {v_to}) — "
            "was the source table recreated?"
        )
    ch = source.changes_between(spark, v_from, v_to)
    key = source.key_col
    payload = [c for c in ch.columns if c not in ("_change_op", key)]
    batch = ch.select(
        F.col("_change_op").alias("op"),
        F.lit(v_to).cast("long").alias("op_seq"),
        F.col(key),
        *[F.col(c) for c in payload],
    )
    stats = replica.merge(spark, batch, props_updates={_PROP: v_to})
    return {
        "src_version_from": v_from,
        "src_version_to": v_to,
        "synced": True,
        "rows_upserted": stats.rows_upserted,
        "rows_deleted": stats.rows_deleted,
    }


def create_replica(source: LakeTable, path: str) -> LakeTable:
    """An empty replica with the source's schema/key/bucketing — same
    bucket count and hash, so future co-located bucket joins and
    `audit.bucket_checksums` drill-downs line up file-for-file.

    The replica is ALWAYS whole-row LWW, even for a `partial`-policy
    source: CDF rows are full current states (column resolution already
    happened on the source), so a column-coalescing apply would wrongly
    resurrect old values where the source holds an explicit NULL."""
    return LakeTable.create(
        path,
        source.schema_ddl,
        key_col=source.key_col,
        order_cols=tuple(source.manifest["order_cols"]),
        num_buckets=source.num_buckets,
        merge_policy="lww",
    )
