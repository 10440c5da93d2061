"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (SURVEY.md §2.10 / the brief's "custom
stateful operators" surface).

The batch equivalent (operators/windows.py: sessionize) answers the same
question over bounded data; this operator maintains per-key session
state across micro-batches with an event-time timeout, so sessions close
either when a newer event exceeds the gap or when the watermark passes
the session's expiry — the standard streaming-session shape.

State per key: (session_start_ms, session_end_ms, n_events). All work is
Arrow-batched pandas; rows of one key arrive grouped; output rows are
COMPLETED sessions only (append mode)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_ms long, end_ms long, n long"


def _sessionize_fn(gap_seconds: int):
    gap_ms = gap_seconds * 1000

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        done: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                done.append(tuple(state.get))
                state.remove()
        else:
            if state.exists:
                start_ms, end_ms, n = state.get
            else:
                start_ms, end_ms, n = None, None, 0
            ts_ms = (
                pd.concat(list(pdfs))["ts"]
                .sort_values()
                .astype("int64")
                .floordiv(1_000_000)  # ns → ms
                .tolist()
            )
            for t in ts_ms:
                if start_ms is None:
                    start_ms, end_ms, n = t, t, 1
                elif t - end_ms > gap_ms:
                    done.append((start_ms, end_ms, n))
                    start_ms, end_ms, n = t, t, 1
                else:
                    end_ms, n = max(end_ms, t), n + 1
            # close the open session when event time passes end + gap;
            # if the watermark is already past that point (all its
            # events were late), the session is complete NOW — a
            # timeout in the past is invalid
            expiry = end_ms + gap_ms
            if expiry <= state.getCurrentWatermarkMs():
                done.append((start_ms, end_ms, n))
                if state.exists:
                    state.remove()
            else:
                state.update((start_ms, end_ms, n))
                state.setTimeoutTimestamp(expiry)

        if done:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(done),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in done
                    ],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in done],
                    "n_events": [n for _, _, n in done],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """`events` is a STREAMING DataFrame with (user_id long, ts
    timestamp). Returns the stream of completed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
