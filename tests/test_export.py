"""Training-corpus export (operators/export.py + jobs/export_corpus.py):
stats-pruned quality filter, dedup keep-list, deterministic split,
per-split packing, hash-stable shards, provenance manifest."""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F

from tiger_etl_spark.lake import LakeTable
from tiger_etl_spark.operators.export import export_training_shards
from tiger_etl_spark.operators.sampling import split_assign

UTC = dt.timezone.utc


def ts(i: int) -> dt.datetime:
    return dt.datetime(2025, 7, 1, tzinfo=UTC) + dt.timedelta(seconds=i)


def _table(spark, tmp_path, n=60):
    t = LakeTable.create(
        str(tmp_path / "t"),
        "url string, warc_ts timestamp, text string, quality double, n_tokens long",
        "url",
        num_buckets=4,
        props={"stats_cols": "quality"},
    )
    rows = [
        (
            "I", i + 1, f"http://h{i % 7}/p{i}", ts(i),
            f"doc body {i % 5}", round((i % 10) / 10.0, 1), 50 + (i % 40),
        )
        for i in range(n)
    ]
    t.merge(
        spark,
        spark.createDataFrame(
            rows,
            "op string, op_seq long, url string, warc_ts timestamp, "
            "text string, quality double, n_tokens long",
        ),
    )
    return t


def test_export_quality_filter_split_and_manifest(spark, tmp_path):
    t = _table(spark, tmp_path)
    out = str(tmp_path / "corpus")
    man = export_training_shards(
        spark,
        t,
        out,
        col_ranges={"quality": (0.5, None)},
        split_weights={"train": 0.8, "val": 0.2},
        num_shards=2,
    )
    expected = t.scan(spark).where("quality >= 0.5")
    n_expected = expected.count()
    assert man["rows"] == n_expected
    assert man["splits"]["train"] + man["splits"]["val"] == n_expected
    assert man["source_version"] == t.manifest["version"]
    # the written dataset reads back complete, with split/shard dirs
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == n_expected
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val",
    }
    assert back.where("quality < 0.5").count() == 0
    # split assignment matches the deterministic hash rule exactly
    rule = expected.withColumn(
        "split", split_assign(F.col("url"), {"train": 0.8, "val": 0.2})
    ).select("url", "split")
    got = back.select("url", "split")
    assert rule.exceptAll(got).count() == 0 and got.exceptAll(rule).count() == 0
    # manifest written to disk too
    disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert disk["rows"] == n_expected


def test_export_is_rerun_stable(spark, tmp_path):
    """Same snapshot → identical shard membership (hash, not task order)."""
    t = _table(spark, tmp_path)
    outs = []
    for i in range(2):
        out = str(tmp_path / f"c{i}")
        export_training_shards(spark, t, out, num_shards=3)
        outs.append(
            spark.read.option("basePath", out).parquet(out)
            .select("url", "shard").toPandas()
            .sort_values("url").reset_index(drop=True)
        )
    assert outs[0].equals(outs[1])


def test_export_keep_list_drops_marked_rows(spark, tmp_path):
    t = _table(spark, tmp_path)
    keys = [r["url"] for r in t.scan(spark).select("url").limit(5).collect()]
    keep = spark.createDataFrame(
        [(k, False) for k in keys[:3]] + [(keys[3], True)],
        "url string, keep boolean",
    )
    out = str(tmp_path / "corpus")
    man = export_training_shards(spark, t, out, keep_list=keep, num_shards=2)
    back = spark.read.option("basePath", out).parquet(out)
    assert man["rows"] == 60 - 3
    assert back.where(F.col("url").isin(keys[:3])).count() == 0
    assert back.where(F.col("url") == keys[3]).count() == 1


def test_export_packing_respects_budget_per_split(spark, tmp_path):
    t = _table(spark, tmp_path)
    out = str(tmp_path / "corpus")
    budget = 200
    export_training_shards(
        spark,
        t,
        out,
        split_weights={"train": 0.7, "val": 0.3},
        pack_budget=budget,
        size_col="n_tokens",
        num_shards=2,
    )
    back = spark.read.option("basePath", out).parquet(out)
    assert "bin_id" in back.columns
    # offset-based packing: within each split, cumulative size in key
    # order maps every row's bin to floor(exclusive_sum / budget)
    import pandas as pd  # noqa: F401

    pdf = back.select("split", "url", "n_tokens", "bin_id").toPandas()
    for split, g in pdf.groupby("split"):
        g = g.sort_values("url").reset_index(drop=True)
        excl = g["n_tokens"].cumsum().shift(1).fillna(0)
        assert (g["bin_id"] == (excl // budget)).all(), split
    # bins never span splits: (split, bin) combinations are disjoint by
    # construction — check bin 0 exists in both splits independently
    assert pdf.groupby("split")["bin_id"].min().max() == 0


def test_export_jsonl_and_empty_export(spark, tmp_path):
    t = _table(spark, tmp_path)
    out = str(tmp_path / "corpus")
    man = export_training_shards(spark, t, out, fmt="jsonl", num_shards=2)
    back = spark.read.option("basePath", out).json(out)
    assert back.count() == man["rows"] == 60
    # nothing qualifies → structurally valid empty export, zero counts
    out2 = str(tmp_path / "empty")
    man2 = export_training_shards(
        spark, t, out2, col_ranges={"quality": (99.0, None)}, num_shards=2
    )
    assert man2["rows"] == 0 and man2["splits"] == {"all": 0}


def test_export_cli_smoke(spark, tmp_path):
    """Drive the spark-submit entrypoint end-to-end in-process."""
    import subprocess
    import sys

    t = _table(spark, tmp_path)
    out = str(tmp_path / "corpus")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "jobs",
                "export_corpus.py",
            ),
            "--table", t.path, "--out", out,
            "--min-quality", "0.5",
            "--split", "train=0.9,val=0.1",
            "--dedup-exact",
            "--shards", "2",
            "--local-cores", "2",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.loads(r.stdout.strip().splitlines()[-1])
    # exactly 5 distinct texts exist in the quality band, and dedup
    # winners are chosen WITHIN the band — a below-threshold winner
    # must never shadow its qualifying duplicates out of the corpus
    back = spark.read.option("basePath", out).parquet(out)
    assert back.count() == man["rows"] == 5
    assert back.select("text").distinct().count() == 5


def test_export_stable_across_parallelism(spark, tmp_path):
    """The shard/split-membership claim: hash projections of the key,
    so a different shuffle-partition count (a different 'cluster size')
    produces the identical dataset layout."""
    t = _table(spark, tmp_path)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        frames = []
        for i, parts in enumerate(["3", "13"]):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            out = str(tmp_path / f"p{i}")
            export_training_shards(
                spark, t, out,
                split_weights={"train": 0.8, "val": 0.2},
                pack_budget=300, size_col="n_tokens", num_shards=4,
            )
            frames.append(
                spark.read.option("basePath", out).parquet(out)
                .select("url", "split", "shard", "bin_id").toPandas()
                .sort_values("url").reset_index(drop=True)
            )
        assert frames[0].equals(frames[1])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_export_row_filter_excludes_noindex(spark, tmp_path):
    """row_filter gates the export on stored columns that are not even
    exported (the --exclude-noindex path over the `meta` ingest
    preset): noindex=true rows vanish, NULLs are kept, and the manifest
    records the gate."""
    t = LakeTable.create(
        str(tmp_path / "t_ni"),
        "url string, warc_ts timestamp, text string, noindex boolean",
        "url",
        num_buckets=4,
    )
    rows = [
        ("I", i + 1, f"http://h/p{i}", ts(i), f"body {i}",
         True if i % 3 == 0 else (None if i % 3 == 1 else False))
        for i in range(30)
    ]
    t.merge(
        spark,
        spark.createDataFrame(
            rows,
            "op string, op_seq long, url string, warc_ts timestamp, "
            "text string, noindex boolean",
        ),
    )
    out = str(tmp_path / "out_ni")
    man = export_training_shards(
        spark,
        t,
        out,
        num_shards=2,
        columns=["url", "text"],  # noindex NOT exported
        row_filter=~F.coalesce(F.col("noindex"), F.lit(False)),
    )
    got = spark.read.parquet(out)
    urls = {r["url"] for r in got.select("url").collect()}
    assert urls == {f"http://h/p{i}" for i in range(30) if i % 3 != 0}
    assert man["rows"] == 20
    assert "noindex" in man["row_filter"]
    assert "noindex" not in got.columns


def test_export_shuffled_shards(spark, tmp_path):
    """shuffle_salt: in-file row order is the salted-md5 permutation —
    deterministic under rerun, different under a different salt, and
    shard membership matches the salted key (never the unsalted hash)."""
    import hashlib

    t = _table(spark, tmp_path, n=80)
    out1 = str(tmp_path / "ep0")
    m = export_training_shards(
        spark, t, out1, num_shards=4, shuffle_salt="ep0"
    )
    assert m["shuffle_salt"] == "ep0"
    assert m["rows"] == 80

    def skey(url: str, salt: str) -> str:
        return hashlib.md5(f"{url}:{salt}".encode()).hexdigest()

    all_urls = []
    for shard in range(4):
        part = spark.read.parquet(
            os.path.join(out1, "split=all", f"shard={shard}")
        )
        urls = [r["url"] for r in part.collect()]
        all_urls.extend(urls)
        # in-file order IS the permutation order
        assert urls == sorted(urls, key=lambda u: (skey(u, "ep0"), u))
        # membership from the salted key's first 3 nibbles
        for u in urls:
            assert int(skey(u, "ep0")[:3], 16) % 4 == shard
    assert len(all_urls) == 80

    # rerun with the same salt: byte-identical order
    out2 = str(tmp_path / "ep0b")
    export_training_shards(spark, t, out2, num_shards=4, shuffle_salt="ep0")
    for shard in range(4):
        a = [r["url"] for r in spark.read.parquet(
            os.path.join(out1, "split=all", f"shard={shard}")).collect()]
        b = [r["url"] for r in spark.read.parquet(
            os.path.join(out2, "split=all", f"shard={shard}")).collect()]
        assert a == b

    # a different salt reshuffles membership and order
    out3 = str(tmp_path / "ep1")
    export_training_shards(spark, t, out3, num_shards=4, shuffle_salt="ep1")
    same = 0
    for shard in range(4):
        a = [r["url"] for r in spark.read.parquet(
            os.path.join(out1, "split=all", f"shard={shard}")).collect()]
        b = [r["url"] for r in spark.read.parquet(
            os.path.join(out3, "split=all", f"shard={shard}")).collect()]
        if a == b:
            same += 1
    assert same == 0
