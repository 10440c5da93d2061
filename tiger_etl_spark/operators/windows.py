"""Window / ranking operators (SURVEY.md §2.5).

W2 (most-recent-per-key) and W3 (LWW dedup) use `max_by` aggregation
rather than a row_number window wherever only the winning row is needed:
max over a struct is associative → map-side partial combine → no
single-task hot key, no sort. The window form is kept for rank-range
semantics (zset, pagination) where full ranking is the point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, key_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """W2/W3 — the winning (max-order) row per key. Reference analog:
    Python sort desc + take-first per user (``sessions_management.py:
    274-276,631-632``); CDC analog: LWW dedup on (warc_ts, op_seq)."""
    others = [c for c in df.columns if c not in key_cols]
    return (
        df.groupBy(*key_cols)
        .agg(F.max_by(F.struct(*others), F.struct(*order_cols)).alias("_w"))
        .select(*key_cols, "_w.*")
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessionization (the reference's sessions_management
    analog, model.py:196-200 duration + login/logout pairing,
    generalized): a new session starts when the gap to the previous
    event of the same key exceeds `gap_seconds`. Output: one row per
    session with `session_idx` (0-based per key), start/end timestamps
    and event count.

    This is a genuinely order-dependent computation, so it uses a
    per-key window (lag + running sum) — partitioned by key, which is
    exactly the keyed distribution a cluster shuffle provides; there is
    no global window. For the streaming variant with state + timeouts
    see cdc/sessionize.py."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    # Compare gaps in integer MICROseconds (unix_micros), never seconds:
    # unix_timestamp() truncates to seconds, which can split sessions
    # differently from a fractional-epoch oracle for gaps within 1s of
    # the threshold. Integer-microsecond arithmetic is engine-exact.
    gap_micros = int(gap_seconds * 1_000_000)  # fractional gaps preserved
    is_new = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > gap_micros)
    ).cast("long")
    with_idx = df.withColumn(
        "_session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )
    return (
        with_idx.groupBy(*key_cols, "_session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumnRenamed("_session_idx", "session_idx")
    )


def rolling_stats(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    preceding: int = 2,
) -> DataFrame:
    """Per-key running aggregates: cumulative sum plus a moving average
    over the current row and the ``preceding`` rows before it, in
    ``order_cols`` order (must be a total order per key for
    deterministic output).

    Reference analog: the sessions layer computes per-user running
    tallies in Python loops after fetching the user's history
    (``sessions_management.py:274-276`` sort + iterate); here it is one
    window partitioned by key — the shuffle distributes keys across the
    cluster and each frame is evaluated incrementally in a single pass,
    so there is no global sort and no per-key history materialization
    beyond the frame. Unlike `latest_per_key`, running output per row
    is genuinely order-dependent, so a window (not max_by) is the right
    tool; partitioning by key keeps it skew-safe for bounded per-key
    cardinality (users, sessions — not domains)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-preceding, Window.currentRow)
    return df.withColumn(
        "cum_sum", F.sum(value_col).over(cum)
    ).withColumn("moving_avg", F.avg(value_col).over(mov))


def relevance_score(col: Column, term: str, exact: int = 10, prefix: int = 5, contains: int = 2) -> Column:
    """W1 — reference scoring: exact=10 / prefix=5 / contains=2
    (``user_group_management.py:611-630``)."""
    lc = F.lower(col)
    t = term.lower()
    return (
        F.when(lc == t, exact)
        .when(lc.startswith(t), prefix)
        .when(lc.contains(t), contains)
        .otherwise(0)
    )


def relevance_top_n(
    df: DataFrame,
    col: str,
    term: str,
    n: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """W1 — score + global top-N (``user_group_management.py:571-577``).
    TakeOrderedAndProject: per-partition heaps, no full sort."""
    scored = df.withColumn("score", relevance_score(F.col(col), term))
    order = [F.col("score").desc()] + [F.col(c) for c in (tiebreak or [])]
    return scored.where(F.col("score") > 0).orderBy(*order).limit(n)


def topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_on: Column | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Per-key top-K by a total order — the per-domain quota cap of
    C4/RefinedWeb-style corpus curation (keep at most K pages per
    domain, best-first), and the grouped generalization of W1's global
    top-N.

    Skew-robust two-phase plan: a single `row_number` window
    partitioned only by key would move EVERY row of a hot key (a
    domain with 10^8 pages) into one task. Instead rows are salted
    into `n_salts` sub-partitions per key (`salt_on` supplies the
    entropy, e.g. the document id), ranked locally — each (key, salt)
    window holds ~1/n_salts of a hot key — and the ≤ n_salts·K
    survivors per key are re-ranked in a second window over a frame
    that is at most n_salts·K rows regardless of corpus size. Output
    carries a 1-based `rank` per key; `order_cols` must be a total
    order (add an id tiebreak) for deterministic results.
    """
    from pyspark.sql import Window

    if salt_on is None:
        salt_on = F.xxhash64(*[F.col(c) for c in df.columns])
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_on), F.lit(int(n_salts))).cast("int")
    )
    w_local = Window.partitionBy(*key_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_r", F.row_number().over(w_local))
        .where(F.col("_r") <= k)
        .drop("_r")
    )
    w_key = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("rank", F.row_number().over(w_key))
        .where(F.col("rank") <= k)
        .drop("_salt")
    )
