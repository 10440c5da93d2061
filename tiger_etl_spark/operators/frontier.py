"""Crawl-frontier operators: the upstream of a web-scale CDC ingest.

A Common-Crawl-style change stream is PRODUCED by a crawler; these
operators compute what such a crawler needs from the lake's own state:

- `resolve_alias_chains` — redirect / rel=canonical chains a→b→c
  collapsed to a→c by distributed pointer doubling (O(log max_hops)
  keyed self-joins, never a per-hop driver loop), with cycle and
  over-length detection. Reference analog: the URL-normalization the
  reference applies one row at a time in its CRUD layer
  (system/system/database_functions/sessions_management/validations.py
  normalizes single values); here the whole link graph resolves at once.
- `revisit_priority` — per-key change-rate estimation over an
  observation history (the classic recrawl-scheduling signal: pages
  that changed often get refetched sooner). Integer-ppm rates only —
  engine-exact, no float division anywhere.
- `politeness_waves` — per-host fetch scheduling: rank URLs within
  each host by priority and emit the crawl wave (one fetch per host
  per wave), so a frontier of any size serializes politely per host
  while staying embarrassingly parallel across hosts.

Scale notes (100 TB frontier = O(10^10) urls):
- pointer doubling shuffles on the chain-target key; `rounds =
  ceil(log2(max_hops)) + 1` keyed joins total, independent of chain
  count. No driver-side state beyond the loop counter.
- revisit_priority is one keyed window (lag) + one hash agg — both
  partition by the key, no global sort.
- politeness_waves is one window partitioned by host: hosts are the
  natural parallelism unit; a hot host (millions of urls) is bounded by
  `max_wave` truncation before the sort materializes the long tail.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_alias_chains(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 32,
) -> DataFrame:
    """Collapse alias chains to their terminal target.

    `edges` holds one directed alias edge per row (redirect source →
    target, or page → its declared canonical). A node with no outgoing
    edge is terminal. Returns one row per distinct `src`:

      (src, final, depth, unresolved)

    - resolved rows: `final` = terminal url, `depth` = exact hop count
      (≤ max_hops), `unresolved` = false.
    - rows whose chain exceeds `max_hops` or enters a cycle: `final` and
      `depth` are NULL, `unresolved` = true. (A crawler treats both the
      same way: the alias graph is broken — fetch the source itself.)

    Multiple outgoing edges per src (conflicting declarations) are
    collapsed to the lexicographically smallest dst first, so the
    result is deterministic.

    Pointer doubling: each round joins the pointer table with itself on
    (my current target == your source), so the distance covered doubles
    every round — `ceil(log2(max_hops)) + 1` shuffles total instead of
    one per hop. Depths add exactly (each edge is counted once along
    the path), so `depth` is the true hop count, not a bound.
    """
    e = (
        edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
        .groupBy("_src")
        .agg(F.min("_dst").alias("_dst"))
    )
    ptr = e.select(
        F.col("_src").alias("src"),
        F.col("_dst").alias("cur"),
        F.lit(1).cast("long").alias("depth"),
    )
    rounds = max(1, int(math.ceil(math.log2(max(2, max_hops)))) + 1)
    for _ in range(rounds):
        jump = ptr.select(
            F.col("src").alias("_j_src"),
            F.col("cur").alias("_j_cur"),
            F.col("depth").alias("_j_depth"),
        )
        ptr = (
            ptr.join(jump, ptr["cur"] == jump["_j_src"], "left")
            .select(
                "src",
                F.coalesce("_j_cur", "cur").alias("cur"),
                (
                    F.col("depth") + F.coalesce("_j_depth", F.lit(0))
                ).alias("depth"),
            )
            # depth cap: cycles would otherwise double forever; anything
            # past max_hops is already unresolved, freeze it there
            .withColumn(
                "depth",
                F.least(F.col("depth"), F.lit(max_hops + 1).cast("long")),
            )
        )
    # a row is unresolved if it ran past the hop budget OR its final
    # pointer still has an outgoing edge (mid-cycle parking spot)
    has_out = e.select(F.col("_src").alias("cur"), F.lit(True).alias("_more"))
    out = ptr.join(has_out, "cur", "left").select(
        "src",
        "cur",
        "depth",
        (
            (F.col("depth") > max_hops) | F.coalesce("_more", F.lit(False))
        ).alias("unresolved"),
    )
    return out.select(
        "src",
        F.when(~F.col("unresolved"), F.col("cur")).alias("final"),
        F.when(~F.col("unresolved"), F.col("depth")).alias("depth"),
        "unresolved",
    )


def revisit_priority(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    content_col: str,
) -> DataFrame:
    """Recrawl scheduling signal: per-key change rate over an
    observation history.

    `obs` holds one row per (key, fetch): `ts_col` the observation
    time, `content_col` anything whose inequality across consecutive
    observations means "the page changed" (a content hash at scale).

    Returns per key: n_obs, n_changes (consecutive-pair inequality
    count), span_us (first→last observation, integer microseconds) and
    change_rate_ppm = n_changes * 1e6 DIV (n_obs - 1) — pure integer
    arithmetic, engine-exact. Keys seen once have rate 0 (no evidence).

    One keyed window (lag over ts) + one hash agg; both shuffle on the
    key only.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(content_col))
    prev = F.lag(F.col(content_col)).over(w)
    marked = obs.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.when(prev.isNull(), F.lit(0))
        .when(F.col(content_col) != prev, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_chg"),
    )
    agg = marked.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("_chg").alias("n_changes"),
        (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
    )
    return agg.select(
        F.col("key"),
        "n_obs",
        "n_changes",
        "span_us",
        F.when(
            F.col("n_obs") > 1,
            F.expr("n_changes * 1000000L div (n_obs - 1)"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("change_rate_ppm"),
    )


def politeness_waves(
    urls: DataFrame,
    host_col: str,
    url_col: str,
    priority_col,
    max_wave: int | None = None,
) -> DataFrame:
    """Per-host fetch scheduling: rank each host's URLs by (priority
    desc, url) and emit `wave` = rank − 1. A crawler that fetches one
    wave at a time touches every host at most once per wave — the
    politeness constraint — while the frontier stays fully parallel
    across hosts. `max_wave` truncates hot hosts (the skew bound): a
    host with millions of URLs contributes only its top max_wave+1.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(url_col)
    )
    ranked = urls.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(priority_col).alias("priority"),
        (F.row_number().over(w) - 1).cast("long").alias("wave"),
    )
    if max_wave is not None:
        ranked = ranked.where(F.col("wave") <= max_wave)
    return ranked
