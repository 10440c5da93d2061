"""Training-corpus export — the sink end of the pipeline.

A CDC lake table of web pages becomes a train-ready dataset in one
job: manifest-pruned quality filtering → dedup keep-list → deterministic
train/val/test split → per-split context-window packing → sharded
parquet/jsonl output with a provenance manifest.

Reference analog: the reference's export surface is row-at-a-time REST
reads (``user_management.py:544-547`` pagination); a training pipeline
exports whole corpora, so the analog here is a distributed job.

Scale shape:
- The quality filter rides ``LakeTable.scan(col_ranges=...)`` — files
  whose recorded per-file bounds cannot qualify are never read
  (lake/pruning.py), so a ``quality >= 0.9`` export of a 100 TB table
  reads only qualifying files.
- Split assignment and shard membership are pure hash projections of
  the row key (`sampling.hash_split`, ``pmod(hash(key), shards)``) —
  no shuffle for the split, one bucket-aligned shuffle for sharding,
  and the same row lands in the same split/shard on any cluster size
  or rerun (replay-stable exports).
- Packing bins come from the two-phase distributed prefix sum
  (`scan_ops.pack_by_budget`) — no single-task global window.
- Per-split row/byte counts ride the write job as an ``Observation``
  (no second pass); the manifest records the source snapshot version,
  so any export is exactly reproducible from table history.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators.sampling import split_assign
from tiger_etl_spark.operators.scan_ops import pack_by_budget

_SHARD_COL = "shard"  # no leading underscore: partition DIRS named "_x=…" are
# hidden to Hadoop's file listing and would vanish from reads


def export_training_shards(
    spark: SparkSession,
    table: LakeTable,
    out_dir: str,
    col_ranges: dict | None = None,
    keep_list: DataFrame | None = None,
    split_weights: dict[str, float] | None = None,
    pack_budget: int | None = None,
    size_col: str = "content_len",
    num_shards: int = 8,
    fmt: str = "parquet",
    columns: list[str] | None = None,
    row_filter: Column | None = None,
    shuffle_salt: str | None = None,
) -> dict:
    """Export the table's current state as a sharded training dataset.

    - `col_ranges`: {col: (lo, hi)} closed-interval filters over
      `stats_cols`-tracked columns — pruned at the file manifest before
      any data is read, then applied row-level.
    - `keep_list`: a DataFrame with (key_col, `keep` boolean) — the
      output of a dedup decision (e.g. `doc_dedup_keep_list` shape);
      rows whose key maps to keep=false are dropped. Keys absent from
      the list are kept (the list only names judged rows).
    - `split_weights`: {"train": 0.98, "val": 0.01, ...} → deterministic
      md5-bucket split; output lands under `split=<name>/` dirs. None →
      one unsplit dataset under `split=all/`.
    - `pack_budget`: token/char budget per context-window bin; adds a
      `bin_id` column assigned per split in (key) order via the
      distributed prefix sum. None → no packing column.
    - `num_shards`: files per split; shard membership is
      `pmod(hash(key), num_shards)` — stable across reruns and cluster
      sizes, and the bucket-aligned repartition writes one file per
      shard with no stragglers.
    - `fmt`: 'parquet' or 'jsonl' (newline-delimited JSON, the common
      interchange for text corpora; binary columns are dropped there).
    - `columns`: projection for the export (default: all non-internal).
    - `shuffle_salt`: globally shuffle the corpus for training (the
      `sampling.shuffle_assign` permutation): shard membership AND the
      row order inside every shard file come from a salted md5 of the
      key — a full pseudo-random permutation with no global sort (the
      in-shard order is a sortWithinPartitions on the already-sharded
      exchange). A different salt is a fresh epoch-level permutation;
      the same salt reproduces the same file order on any cluster size.

    Returns (and writes to `<out_dir>/_manifest.json`) the export
    manifest: source table path + snapshot version, config, and
    per-split row/byte counts observed during the write."""
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"unknown format {fmt!r}")
    key = table.key_col
    df = table.scan(spark, col_ranges=col_ranges)
    if row_filter is not None:
        # applied BEFORE the projection so the gate may reference stored
        # columns that are not exported (e.g. an ingest-enriched
        # `noindex` boolean) — a pure scan-stage filter, no extra pass
        df = df.where(row_filter)
    if columns:
        missing = set([key]) - set(columns)
        df = df.select(*sorted(set(columns) | missing))
    if keep_list is not None:
        dropped = keep_list.where(~F.col("keep")).select(key)
        df = df.join(dropped, key, "left_anti")
    weights = split_weights or {"all": 1.0}
    df = df.withColumn("split", split_assign(F.col(key), weights))

    if pack_budget is not None and size_col not in df.columns:
        raise ValueError(
            f"pack_budget needs size column {size_col!r} in the export "
            f"projection (have: {df.columns})"
        )
    if pack_budget is not None:
        # pack each split independently (a bin must never span splits);
        # splits are few and disjoint, so this is ≤3 passes over
        # disjoint subsets, each a two-phase scan — still no global
        # single-task window anywhere
        parts = []
        for name in weights:
            part = df.where(F.col("split") == name)
            parts.append(
                pack_by_budget(part, [key], size_col, pack_budget)
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)

    # deterministic shard membership: pmod(hash(key), shards) — and the
    # repartition by the same expression lands shard i in partition i
    # (bucket_expr alignment), so partitionBy writes one file per shard.
    # Under shuffle_salt the shard comes from the salted md5 instead, so
    # shard membership itself re-randomizes per epoch.
    if shuffle_salt is None:
        df = df.withColumn(
            _SHARD_COL,
            F.pmod(F.hash(F.col(key)), F.lit(num_shards)).cast("int"),
        )
    else:
        skey = F.md5(
            F.concat(F.col(key).cast("string"), F.lit(":" + shuffle_salt))
        )
        df = df.withColumn("_skey", skey).withColumn(
            _SHARD_COL,
            (
                F.conv(F.substring("_skey", 1, 3), 16, 10).cast("int")
                % num_shards
            ).cast("int"),
        )
    obs = Observation("export")

    def metric_cols() -> list:
        out = [F.count(F.lit(1)).alias("rows")]
        for name in weights:
            out.append(
                F.sum((F.col("split") == name).cast("long")).alias(f"rows_{name}")
            )
        if size_col in df.columns:
            out.append(F.sum(F.col(size_col)).alias("size_units"))
        return out

    unobserved = df  # fallback plan without the CollectMetrics node
    df = df.observe(obs, *metric_cols())

    out = df.repartition(len(weights) * num_shards, F.col("split"), F.col(_SHARD_COL))
    if shuffle_salt is not None:
        # permuted in-file order: sort the already-sharded partitions by
        # the salted key (bounded per-partition sort, no global order),
        # then drop the key — the projection preserves partition order
        out = out.sortWithinPartitions("split", _SHARD_COL, "_skey").drop(
            "_skey"
        )
    writer_df = out
    if fmt == "jsonl":
        bin_cols = [f.name for f in out.schema.fields
                    if f.dataType.simpleString() == "binary"]
        writer_df = out.drop(*bin_cols)
    writer = writer_df.write.mode("overwrite").partitionBy("split", _SHARD_COL)
    if fmt == "parquet":
        writer.parquet(out_dir)
    else:
        writer.option("compression", "gzip").json(out_dir)

    try:
        m = dict(obs.get)
        if not m.get("rows"):
            raise ValueError("empty/degenerate observation")
    except Exception:
        # same AQE empty-relation degeneracy as cdc/pipeline.py: the
        # observation can complete schema-less or with a default row.
        # RECOMPUTE the aggregates (never just zero them — a manifest
        # contradicting billions of written rows is worse than a second
        # pass; for a genuinely empty export this recompute is free).
        m = unobserved.agg(*metric_cols()).first().asDict()

    manifest = {
        "source_table": table.path,
        "source_version": table.manifest["version"],
        "source_snapshot_id": table.manifest["snapshot_id"],
        "created_at": time.time(),
        "format": fmt,
        "num_shards": num_shards,
        "col_ranges": {
            c: [lo, hi] for c, (lo, hi) in (col_ranges or {}).items()
        },
        **(
            {"row_filter": str(row_filter._jc)}
            if row_filter is not None
            else {}
        ),
        "split_weights": weights,
        "shuffle_salt": shuffle_salt,
        "pack_budget": pack_budget,
        "size_col": size_col,
        "rows": int(m.get("rows") or 0),
        "splits": {
            name: int(m.get(f"rows_{name}") or 0) for name in weights
        },
        **(
            {"size_units_total": int(m["size_units"])}
            if m.get("size_units") is not None
            else {}
        ),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest
