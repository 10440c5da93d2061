"""Generic table operators — the reference's CRUD/query surface
(SURVEY.md §2.1–§2.4, §2.6–§2.7) re-expressed as DataFrame transforms.

The reference materializes full tables into Python and filters/sorts/
slices client-side (``pg_db.py:244-309``, ``user_management.py:532-547``);
here every operator is a declarative plan so Catalyst pushes predicates
and prunes columns into the parquet scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def conditions_predicate(conditions: dict) -> Column:
    """P1 — equality-conjunction predicate from a dict
    (``pg_db.py:290-292``); pushed down by Catalyst."""
    return reduce(
        lambda a, b: a & b, [F.col(k) == F.lit(v) for k, v in conditions.items()]
    )


def scan(
    df: DataFrame,
    conditions: dict | None = None,
    columns: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """S1 — `PostgresDB.read` analog (``pg_db.py:244-309``): scan with
    optional equality predicate, projection (P2 — the reference always
    SELECT *'d; here pruning reaches the reader), and limit (O1)."""
    out = df
    if conditions:
        out = out.where(conditions_predicate(conditions))
    if columns:
        out = out.select(*columns)
    if limit is not None:
        out = out.limit(limit)
    return out


def exists(df: DataFrame, conditions: dict) -> bool:
    """P7/O4 — existence probe (`user_exists`, ``user_management.py:
    610-658``) via limit-1 scan, never a full count."""
    return bool(df.where(conditions_predicate(conditions)).limit(1).take(1))


def semi_join(df: DataFrame, keys: DataFrame, on: str | list) -> DataFrame:
    """J4 (existing half) — ids that exist in the target
    (``user_management.py:442-482``)."""
    return df.join(keys, on=on, how="left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on: str | list) -> DataFrame:
    """J3/J4 — dedup/uniqueness probe: rows whose natural key is absent
    from the target (``sessions_management.py:157-159``,
    ``user_management.py:189-195``). In the CDC engine this is the
    NOT-MATCHED branch of MERGE."""
    return df.join(keys, on=on, how="left_anti")


def search_contains(df: DataFrame, cols: list[str], term: str) -> DataFrame:
    """P4 — case-insensitive substring search over several columns
    (``user_management.py:552-577``), server-side instead of the
    reference's client-side loop."""
    t = term.lower()
    pred = reduce(
        lambda a, b: a | b, [F.lower(F.col(c)).contains(t) for c in cols]
    )
    return df.where(pred)


def time_range(df: DataFrame, ts_col: str, start, end) -> DataFrame:
    """P5 — inclusive time-range filter; null-ts rows dropped
    (``sessions_management.py:650-682``). At scale this prunes
    partitions/files via min-max stats."""
    return df.where(F.col(ts_col).isNotNull() & F.col(ts_col).between(start, end))


def paginate(
    df: DataFrame, order_cols: list[str], limit: int, offset: int = 0
) -> DataFrame:
    """O1/O2 — pagination. The reference slices a full client-side fetch
    (``user_management.py:544-547``); here ORDER BY + OFFSET/LIMIT plans
    a single TakeOrderedAndProject(offset+limit) — per-partition heaps of
    offset+limit rows, NO global sort and NO single-task window (a
    ``row_number`` over an unpartitioned Window would move every row to
    one task; pinned in tests/test_plans.py). For deep pages at scale,
    prefer keyset pagination (WHERE key > last_seen ORDER BY key LIMIT n)."""
    return df.orderBy(*[F.col(c) for c in order_cols]).offset(offset).limit(limit)


def top_k(df: DataFrame, order_exprs: list[Column], k: int) -> DataFrame:
    """O3 — ORDER BY … LIMIT k (Spark plans TakeOrderedAndProject —
    per-partition heaps, no global sort)."""
    return df.orderBy(*order_exprs).limit(k)


def redact(df: DataFrame, cols: list[str]) -> DataFrame:
    """P3 — drop sensitive columns (``auth.py:62,90`` drops passwd)."""
    return df.drop(*cols)


def id_partition(
    df: DataFrame, ids: DataFrame, on: str
) -> tuple[DataFrame, DataFrame]:
    """J4 — split requested ids into (existing, missing) via semi + anti
    (``user_management.py:458-465``; §2.7 set-difference analog)."""
    return (
        ids.join(df, on=on, how="left_semi"),
        ids.join(df, on=on, how="left_anti"),
    )


def zset_range(
    df: DataFrame,
    score_col: str,
    start: int,
    stop: int,
    desc: bool = False,
    tiebreak: list[str] | None = None,
    with_rank: bool = False,
) -> DataFrame:
    """S7 — Redis ZRANGE analog (``redis_db.py:78-132``): rank-range over
    a score ordering, inclusive 0-based [start, stop].

    Scale shape: top-(stop+1) first via TakeOrderedAndProject
    (per-partition heaps bounded by stop+1 — never a global sort), THEN
    rank the ≤ stop+1 surviving rows with a window. The window runs on a
    single task by construction, but over at most stop+1 rows — the
    Redis-rank contract itself bounds it. Pinned in tests/test_plans.py."""
    order = [F.col(score_col).desc() if desc else F.col(score_col).asc()] + [
        F.col(c) for c in (tiebreak or [])
    ]
    top = df.orderBy(*order).limit(stop + 1)
    w = Window.orderBy(*order)
    ranked = top.withColumn("_rank", F.row_number().over(w)).where(
        F.col("_rank") >= start + 1
    )
    if with_rank:
        return ranked.withColumnRenamed("_rank", "rank")
    return ranked.drop("_rank")
