"""spark-submit entrypoint for crawl-frontier planning.

Turns the lake's current state into the next crawl's fetch plan — the
upstream half of the CDC loop (the reference has no analog; this is the
piece that PRODUCES the change stream the ingest job tails):

1. canonical/redirect alias resolution: pages declaring rel=canonical
   form alias edges; chains collapse to their terminal target by
   distributed pointer doubling (operators/frontier.py), so the plan
   fetches one url per logical document. Unresolved chains (cycles /
   over-long) fall back to fetching the page itself.
2. revisit priority: if a change-stream directory is given, the per-url
   content-change rate over past fetches (integer ppm) ranks urls that
   change often ahead of static ones.
3. politeness waves: per-host ranking caps how many fetches any single
   host receives per crawl round (`--max-wave`), keeping the plan
   polite while fully parallel across hosts.

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/tiger_etl_spark.zip \
        jobs/crawl_frontier.py \
        --table hdfs://…/pages --changes hdfs://…/binlog \
        --out hdfs://…/frontier --max-wave 1000

Local smoke:

    python jobs/crawl_frontier.py --table /tmp/pages --out /tmp/frontier \
        --local-cores 8

Prints one JSON line for the scheduler's logs.
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
    ap.add_argument("--table", required=True, help="pages lake table path")
    ap.add_argument("--out", required=True, help="frontier output dir")
    ap.add_argument(
        "--changes",
        default=None,
        help="change-stream dir (parquet) for revisit-priority history",
    )
    ap.add_argument("--max-wave", type=int, default=1000)
    ap.add_argument("--max-hops", type=int, default=16)
    ap.add_argument("--local-cores", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tiger_etl_spark.lake import LakeTable
    from tiger_etl_spark.operators import frontier, weblinks
    from tiger_etl_spark.session import get_spark

    if args.local_cores:
        spark = get_spark("crawl-frontier", cores=args.local_cores)
    else:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("crawl-frontier").getOrCreate()

    table = LakeTable.load(args.table)
    pages = table.scan(spark).select("url", "html")

    # 1. alias edges from declared canonicals (self-references dropped)
    meta = weblinks.extract_page_meta(pages)
    edges = (
        meta.where(
            F.col("canonical_url").isNotNull()
            & (F.col("canonical_url") != F.col("url"))
        ).select(F.col("url").alias("src"), F.col("canonical_url").alias("dst"))
    )
    chains = frontier.resolve_alias_chains(edges, max_hops=args.max_hops)
    targets = (
        pages.select("url")
        .join(chains, pages["url"] == chains["src"], "left")
        .select(
            F.col("url"),
            # unresolved/no-edge urls fetch themselves
            F.coalesce("final", "url").alias("fetch_url"),
            F.coalesce("unresolved", F.lit(False)).alias("alias_unresolved"),
        )
    )
    fetch = targets.groupBy("fetch_url").agg(
        F.count(F.lit(1)).alias("n_aliases"),
        F.max(F.col("alias_unresolved").cast("int")).cast("boolean").alias(
            "any_unresolved"
        ),
    )

    # 2. revisit priority off the raw fetch history (the binlog itself:
    # one event per past fetch; content hash marks real changes)
    if args.changes:
        obs = spark.read.parquet(args.changes).select(
            "url",
            F.col("warc_ts").cast("timestamp_ltz").alias("ts"),
            F.xxhash64(F.coalesce(F.col("html"), F.lit(b""))).alias("h"),
        )
        pri = frontier.revisit_priority(obs, "url", "ts", "h").select(
            F.col("key").alias("fetch_url"),
            F.col("change_rate_ppm"),
        )
        fetch = fetch.join(pri, "fetch_url", "left").withColumn(
            "priority", F.coalesce("change_rate_ppm", F.lit(0).cast("long"))
        ).drop("change_rate_ppm")
    else:
        fetch = fetch.withColumn("priority", F.lit(0).cast("long"))

    # 3. per-host politeness waves over the deduped fetch list
    plan = (
        frontier.politeness_waves(
            fetch.withColumn("host", weblinks.host_of(F.col("fetch_url"))),
            "host",
            "fetch_url",
            "priority",
            max_wave=args.max_wave,
        )
        .withColumnRenamed("url", "fetch_url")
        # carry the alias rollup into the plan (politeness_waves projects
        # only its scheduling columns)
        .join(
            fetch.select("fetch_url", "n_aliases", "any_unresolved"),
            "fetch_url",
        )
    )

    plan.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    summary = {
        "n_fetch_urls": out.count(),
        "n_hosts": out.select("host").distinct().count(),
        "max_wave": out.agg(F.max("wave")).first()[0],
        "out": args.out,
    }
    print(json.dumps(summary), flush=True)
    if args.local_cores:
        spark.stop()


if __name__ == "__main__":
    main()
