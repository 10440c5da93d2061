"""Distributed prefix sum (two-phase scan) + sequence packing.

An unpartitioned ``Window.orderBy(...).rowsBetween(unboundedPreceding)``
moves EVERY row to one task — the same scale-killer VERDICT flagged for
pagination. This module implements the textbook two-phase parallel scan
with DataFrames instead:

1. **Range-partition** by the order key (one shuffle; Spark samples key
   ranges, so partitions are balanced and globally ordered).
2. **Local scan**: a window partitioned by ``spark_partition_id()`` —
   P independent tasks, each a linear in-memory running sum.
3. **Offsets**: the P per-partition totals (a P-row DataFrame) get
   their own exclusive prefix sum — the only serial window runs over P
   rows, not N — and are broadcast-joined back.

Total cost: two even shuffles + one broadcast of P rows; no task ever
holds more than one partition. Works for any associative value.

Sequence packing (``pack_by_budget``) builds on it: the standard
LLM-training step of grouping documents into fixed-token-budget bins
(contiguous greedy packing in a deterministic key order, the scheme
used by most public data pipelines for context-window packing). The
bin id is a pure function of the exclusive running token count, so the
result is reproducible run-to-run and expressible in ANSI SQL for the
oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_scan_pid"
_LOCAL = "_scan_local"
_OFF = "_scan_offset"


def running_total(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_total",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of `value_col` in `order_cols` order, without
    a single-task global window (see module docstring). `exclusive`
    gives the sum of all STRICTLY preceding rows (0 for the first).
    `order_cols` must be a total order (ties make "preceding" ambiguous
    across partition boundaries)."""
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
    tagged = ranged.withColumn(_PID, F.spark_partition_id())

    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    local = tagged.withColumn(
        _LOCAL, F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )

    totals = tagged.groupBy(_PID).agg(F.sum(value_col).alias("_tot"))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        _OFF, F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select(_PID, _OFF)

    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_OFF))
        .drop(_PID, _LOCAL, _OFF)
    )


def pack_by_budget(
    df: DataFrame,
    order_cols: list[str],
    size_col: str,
    budget: int,
    bin_col: str = "bin_id",
    oversize: str = "own_bin",
) -> DataFrame:
    """Assign each row a packing-bin id: rows are laid out end-to-end in
    `order_cols` order and a new bin starts every `budget` size units —
    ``bin = floor(exclusive_running_size / budget)`` (offset-based
    packing: deterministic, one pass, SQL-expressible; a best-fit packer
    would need a serial state machine). Rows larger than `budget`
    (`oversize='own_bin'`) still land in the bin their offset starts in,
    matching the SQL definition; 'error' raises on encounter at plan
    time is impossible, so it filters them to a `_oversize` marker
    column instead."""
    if oversize not in ("own_bin", "flag"):
        raise ValueError("oversize must be 'own_bin' or 'flag'")
    out = running_total(
        df, order_cols, size_col, out_col="_excl", exclusive=True
    ).withColumn(
        bin_col, F.floor(F.col("_excl") / F.lit(int(budget))).cast("long")
    )
    if oversize == "flag":
        out = out.withColumn("_oversize", F.col(size_col) > budget)
    return out.drop("_excl")
