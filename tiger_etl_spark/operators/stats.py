"""Distribution statistics — grouped quantiles and z-score outliers.

Reference analog: the reporting layer exposes only counts and min/max
(`/root/reference/system/system/database_functions/user_group_management/user_group_management.py`
count endpoints, pg_db.py:574-584 docstring analytics); a corpus-scale
ingest engine needs the distributional counterparts — per-group
percentiles for length/quality cutoff selection (C4/Gopher-style
document filtering picks thresholds off these) and z-score outlier
detection for anomalous batches.

Scale shape:
- `group_quantiles(approx=True)` (the 100 TB default) uses
  ``approx_percentile`` — a mergeable KLL-style sketch, so the
  aggregation combines map-side and the shuffle carries one sketch per
  (group, partition), never raw values. Exact mode (kept for oracle
  parity, same column names) uses ``percentile``, which materializes
  each group's values on its reducer — fine for bounded groups
  (languages, months), not for unbounded ones; the docstrings on both
  query entry points say which is which.
- `zscore_outliers` is two jobs: one associative avg/stddev aggregate
  (map-side partial) over the grouping key, then the tiny per-group
  moment table is broadcast back onto the fact table — no second
  shuffle of the data, the filter runs inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    probs: list[float],
    approx: bool = False,
    scale: int = 6,
) -> DataFrame:
    """One row per group with a ``q<pct>`` double column per requested
    probability (linear interpolation — SQL ``percentile_cont``
    semantics), plus ``n_rows``. ``approx=True`` swaps the exact sort
    per group for the mergeable sketch (see module docstring)."""
    if not probs:
        raise ValueError("no probabilities requested")
    fn = F.approx_percentile if approx else F.percentile
    aggs = [F.count(value_col).alias("n_rows")]
    for p in probs:
        name = f"q{str(p).replace('0.', '').ljust(2, '0')}"
        aggs.append(F.round(fn(F.col(value_col), F.lit(p)), scale).alias(name))
    return df.groupBy(*key_cols).agg(*aggs)


def zscore_outliers(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    threshold: float = 3.0,
    min_group: int = 2,
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample standard
    deviations from their group mean. Output = the input columns plus
    ``group_mean``, ``group_std`` and ``z`` (all doubles, unrounded —
    round at the query boundary). Groups smaller than ``min_group`` (or
    with zero variance) yield no outliers rather than NaN/inf rows."""
    moments = df.groupBy(*key_cols).agg(
        F.avg(value_col).alias("group_mean"),
        F.stddev_samp(value_col).alias("group_std"),
        F.count(value_col).alias("_n"),
    )
    joined = df.join(F.broadcast(moments), key_cols, "inner")
    z = (F.col(value_col) - F.col("group_mean")) / F.col("group_std")
    return (
        joined.where(
            (F.col("_n") >= min_group)
            & F.col("group_std").isNotNull()
            & (F.col("group_std") > 0)
        )
        .withColumn("z", z)
        .where(F.abs(F.col("z")) > threshold)
        .drop("_n")
    )
