"""spark-submit entrypoint for lake-table maintenance.

Run on a schedule beside the ingest job (the Iceberg maintenance-job
pattern — compaction, snapshot expiry, optional bucket evolution live
in their own job so the hot ingest path never pays for them):

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/tiger_etl_spark.zip \
        jobs/maintenance.py \
        --table hdfs://…/pages \
        --max-delta-files-per-bucket 8 --keep-snapshots 5 \
        --cluster-ts day [--rebucket 8192]

Local smoke:

    python jobs/maintenance.py --table /tmp/pages --local-cores 8

Prints one JSON line with what was done (compacted? files expired?
rebucketed?) for the scheduler's logs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs: repo root on sys.path (cluster runs get the package via
# --py-files, which spark-submit adds to the path itself)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_ROOT, "tiger_etl_spark")):
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="lake table path")
    ap.add_argument("--max-delta-files-per-bucket", type=int, default=8)
    ap.add_argument("--keep-snapshots", type=int, default=5)
    ap.add_argument(
        "--cluster-ts",
        choices=["year", "month", "day", "hour"],
        default=None,
        help="time-cluster base files at compaction (bucket+window layout)",
    )
    ap.add_argument(
        "--cluster-cols",
        default=None,
        help="comma list: sort compacted buckets by these columns "
        "(tight per-file stats_cols bounds)",
    )
    ap.add_argument(
        "--zorder-cols",
        default=None,
        help="comma list: Z-order compacted buckets across these "
        "columns (multi-dimensional pruning)",
    )
    ap.add_argument(
        "--max-records-per-file",
        type=int,
        default=None,
        help="split compacted files at this row count (enables "
        "cluster/zorder pruning granularity)",
    )
    ap.add_argument(
        "--rebucket",
        type=int,
        default=None,
        help="evolve the table to this bucket count (full rewrite) first",
    )
    ap.add_argument(
        "--vacuum-hours",
        type=float,
        default=None,
        help="also remove crash orphans older than this many hours",
    )
    ap.add_argument(
        "--describe",
        action="store_true",
        help="print the manifest-only table summary and exit (no Spark)",
    )
    ap.add_argument(
        "--rollback-to",
        type=int,
        default=None,
        help="FIRST roll the table back to this snapshot version "
        "(history rolls forward; skips all other maintenance)",
    )
    ap.add_argument(
        "--replay-quarantine",
        action="store_true",
        help="re-validate and re-ingest dead-letter rows before "
        "maintenance (rows still invalid stay quarantined)",
    )
    ap.add_argument(
        "--verify-checksum",
        action="store_true",
        help="prove any compaction content-preserving: order-insensitive "
        "scan checksum before vs after the rewrite; a mismatch rolls "
        "back to the pre-compaction snapshot and preserves all "
        "manifests (costs two scans)",
    )
    ap.add_argument(
        "--replay-audit-rejects",
        action="store_true",
        help="re-merge whole batches the WAP gate dead-lettered "
        "(audit_policy=quarantine), staged and re-judged by --audit; "
        "batches that still fail the gate stay rejected",
    )
    ap.add_argument(
        "--audit",
        default=None,
        help="audit spec for --replay-audit-rejects (same grammar as "
        "cdc_ingest --audit; typically the SAME spec the stream ran). "
        "Omitted = repaired batches publish unaudited.",
    )
    ap.add_argument(
        "--enrich",
        default=None,
        help="enricher preset spec ('standard', 'meta', 'content', or a "
        "'+' combination) to apply during --replay-quarantine / "
        "--replay-audit-rejects (MUST match what ingest used, or "
        "repaired rows land with NULL derived columns)",
    )
    ap.add_argument(
        "--dim-table",
        default=None,
        help="static dimension (parquet) for --replay-quarantine "
        "(MUST match what ingest used)",
    )
    ap.add_argument("--dim-on", default="lang", help="join column for --dim-table")
    ap.add_argument("--local-cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tiger_etl_spark.lake import LakeTable

    if args.describe:  # pure manifest math — skip Spark startup entirely
        print(json.dumps(LakeTable.load(args.table).describe()))
        return
    if args.rollback_to is not None:
        # rollback is an emergency operation AND pure manifest math: run
        # it alone (no other maintenance racing the operator's intent)
        # and without paying Spark/JVM startup
        table = LakeTable.load(args.table)
        out = {"table": args.table, "version_before": table.manifest["version"]}
        table.rollback(args.rollback_to)
        out["rolled_back_to"] = args.rollback_to
        out["version_after"] = table.manifest["version"]
        print(json.dumps(out))
        return

    if args.local_cores is not None:
        from tiger_etl_spark.session import get_spark

        spark = get_spark("lake-maintenance", cores=args.local_cores)
    else:  # cluster: master/executors come from spark-submit
        spark = SparkSession.builder.appName("lake-maintenance").getOrCreate()
    table = LakeTable.load(args.table)
    out: dict = {"table": args.table, "version_before": table.manifest["version"]}
    if args.replay_quarantine:
        from tiger_etl_spark.cdc.pipeline import (
            replay_quarantine,
            resolve_enrich_spec,
        )

        out["quarantine_replay"] = replay_quarantine(
            spark,
            table,
            enrichers=resolve_enrich_spec(args.enrich)[0],
            static_dim=(
                (spark.read.parquet(args.dim_table), args.dim_on)
                if args.dim_table
                else None
            ),
        )
    if args.replay_audit_rejects:
        from tiger_etl_spark.cdc.pipeline import (
            replay_audit_rejects,
            resolve_enrich_spec,
        )

        audit = None
        if args.audit:
            from tiger_etl_spark.lake.wap import parse_audit_spec

            audit = parse_audit_spec(args.audit)
        out["audit_reject_replay"] = replay_audit_rejects(
            spark,
            table,
            audit=audit,
            enrichers=resolve_enrich_spec(args.enrich)[0],
            static_dim=(
                (spark.read.parquet(args.dim_table), args.dim_on)
                if args.dim_table
                else None
            ),
        )
    if args.rebucket is not None and args.rebucket != table.num_buckets:
        stats = table.rebucket(spark, args.rebucket)
        out["rebucketed_to"] = args.rebucket
        out["rebucket_files_written"] = stats.files_added
    out.update(
        table.maintain(
            spark,
            max_delta_files_per_bucket=args.max_delta_files_per_bucket,
            keep_snapshots=args.keep_snapshots,
            cluster_ts=args.cluster_ts,
            cluster_cols=(
                args.cluster_cols.split(",") if args.cluster_cols else None
            ),
            zorder_cols=(
                args.zorder_cols.split(",") if args.zorder_cols else None
            ),
            max_records_per_file=args.max_records_per_file,
            verify=args.verify_checksum,
        )
    )
    if args.vacuum_hours is not None:
        out.update(table.vacuum(max_age_hours=args.vacuum_hours))
    out["version_after"] = table.manifest["version"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
