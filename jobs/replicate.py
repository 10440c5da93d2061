"""spark-submit entrypoint for CDF replica sync.

Run on a schedule (or after each ingest window) to keep a downstream
copy — a serving replica, a cross-region mirror — following the source
table by increments:

    spark-submit --py-files dist/tiger_etl_spark.zip jobs/replicate.py \
        --source hdfs://…/pages --replica hdfs://…/pages_mirror \
        [--verify]

Creates the replica (same schema/key/bucketing) on first run. With
--verify, computes the order-insensitive content checksum of both
sides after the sync and fails loudly on divergence (the audit-table
pattern; costs two scans). Prints one JSON line for scheduler logs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_ROOT, "tiger_etl_spark")):
    sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--replica", required=True)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--local-cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from tiger_etl_spark.cdc.replicate import create_replica, sync_to
    from tiger_etl_spark.lake import LakeTable

    if args.local_cores is not None:
        from tiger_etl_spark.session import get_spark

        spark = get_spark("replica-sync", cores=args.local_cores)
    else:
        spark = SparkSession.builder.appName("replica-sync").getOrCreate()

    source = LakeTable.load(args.source)
    if LakeTable.exists(args.replica):
        replica = LakeTable.load(args.replica)
    else:
        replica = create_replica(source, args.replica)
    out = sync_to(spark, source, replica)
    if args.verify:
        from tiger_etl_spark.operators.audit import table_checksum

        def summary(t):
            row = table_checksum(t.scan(spark)).collect()[0]
            return (row["n_rows"], row["checksum"])

        s, r = summary(source), summary(replica)
        out["verified"] = s == r
        out["source_checksum"], out["replica_checksum"] = s, r
        if s != r:
            print(json.dumps(out))
            raise SystemExit(f"replica diverged: source={s} replica={r}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
