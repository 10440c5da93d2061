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
