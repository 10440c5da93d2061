"""Watermarked stream-stream interval join.

Reference analog: the activity-follows-login correlation the reference
does with two sequential keyed reads
(`sessions_management.py:391-409` reads the session row, then updates
it from the activity request) — at stream scale that is a JOIN of two
live change streams, not a read-modify-write. Structured Streaming's
stream-stream inner join keeps BOTH sides' unmatched rows in state
until the watermark proves no counterpart can still arrive; the
interval bound on event time is what makes that state finite
(state ∝ keys arriving within the interval + watermark horizon,
independent of stream length).

Batch/stream duality like `cdc/windowed.py`: `interval_join` builds
the identical join condition for two static DataFrames, and the
streaming wrapper only adds watermarks — so the batch twin is the
correctness oracle for the streaming plan (checked in
tests/test_streamjoin.py). The join itself is a plain key-equality +
time-bound conjunction, so Catalyst plans the key shuffle and AQE
handles skew exactly as in batch; nothing here is custom state code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cond(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
) -> Column:
    """key equality + `right_ts ∈ [left_ts - lower, left_ts + upper]`
    (interval strings like '0 seconds', '15 minutes')."""
    c = None
    for k in on:
        eq = left[k] == right[k]
        c = eq if c is None else (c & eq)
    lo = right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lower}")
    hi = right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}")
    return (c & lo & hi) if c is not None else (lo & hi)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    how: str = "inner",
) -> DataFrame:
    """Batch twin: equi-key interval join of two static DataFrames.
    Columns from both sides survive; disambiguate ts columns by name
    before calling if they collide."""
    return left.join(
        right, _cond(left, right, on, left_ts, right_ts, lower, upper), how
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "15 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Streaming version: both inputs must be streaming DataFrames;
    each gets an event-time watermark of `watermark`, which (with the
    interval bound) lets Spark expire join state — required for
    correctness of outer modes and for bounded state in all modes."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(
        rw, _cond(lw, rw, on, left_ts, right_ts, lower, upper), how
    )
