"""Event-time windowed aggregation with watermarked late-data handling.

Reference analog: the session-activity time bucketing intent
(hypertable 1-day chunks,
``system/system/models/sessions_management/model.py:321-329``) and the
inactivity-cutoff scan
(``sessions_management.py:739-770``) — re-expressed as Spark event-time
windows. The watermark plays the cutoff's role declaratively: rows older
than (max event time − delay) are dropped from the aggregation state
instead of being swept by a maintenance query (SURVEY.md §2.9).

Batch and streaming share the same `F.window` expression, so the batch
twin doubles as the correctness oracle for the streaming path: state
management (and late-row dropping) is the ONLY difference.

Scale: a watermarked streaming agg holds state only for open windows —
size ∝ (keys × windows within the watermark horizon), independent of
stream length. The batch twin is a plain hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _windowed(df: DataFrame, ts_col: str, key_col: str, duration: str,
              slide: str | None) -> DataFrame:
    win = F.window(F.col(ts_col), duration, slide) if slide else F.window(
        F.col(ts_col), duration
    )
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def windowed_counts_batch(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    duration: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, when `slide` is given) event-time window
    counts per key over a bounded DataFrame."""
    return _windowed(df, ts_col, key_col, duration, slide)


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup: emit the first occurrence of each key,
    suppress re-deliveries arriving within the watermark horizon
    (`dropDuplicatesWithinWatermark`) — the at-source companion to the
    sink-side idempotent MERGE (a WAL tail that re-delivers a segment
    inside the horizon is absorbed here without a lake commit).

    State is bounded by the watermark: a key's dedup record is dropped
    once event time passes it, so duplicates separated by more than the
    horizon re-emit — exactly-once END-TO-END still rests on the LWW
    merge guard (lake/table.py), which is idempotent at any distance.
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def windowed_counts_stream(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """The streaming variant: watermarked tumbling-window counts.

    Rows later than the watermark are dropped from the aggregation
    (bounded state); in append output mode a window's final count is
    emitted once the watermark passes its end. Use with
    ``writeStream.outputMode("append"|"update")``.
    """
    return _windowed(
        stream_df.withWatermark(ts_col, watermark),
        ts_col,
        key_col,
        duration,
        None,
    )
