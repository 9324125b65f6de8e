"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

``streaming/windowed.py`` covers what built-in watermarked windows can
express; gap sessionization cannot be a fixed window (a session's extent
depends on the data), so it needs arbitrary per-key state — exactly the
``applyInPandasWithState`` escape hatch.  Semantics mirror the batch
operator ``operators/events.py:sessionize``: a session is a maximal run of
one user's events where consecutive gaps are ≤ ``gap_minutes``.

State machine per user key:

- state = the OPEN session ``(start_us, last_us, n_events)`` (epoch µs);
- each micro-batch merges its (sorted) events: a gap > ``gap_minutes``
  closes the current session (emitted) and opens a new one;
- an event-time timeout fires when the watermark passes
  ``last + gap`` — the open session can no longer grow, so it is emitted
  and the state removed.  Late events beyond the watermark are dropped by
  the watermark itself, matching the append-mode contract.

Scale shape: state is O(active users), keyed and shuffled once on the user
key; each micro-batch touches only keys present in the batch plus timers
the watermark fired.  This is the 10^12-event formulation — no global sort,
no unbounded buffering.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F

__all__ = ["sessionize_stream"]

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000


def _session_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * _US

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            # watermark passed last+gap: the open session is final
            closed.append(state.get)
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                # pandas datetime64[ns] → epoch µs (integer floor division)
                ts_us.extend(
                    int(v) // 1000 for v in pdf["ts"].astype("int64")
                )
            ts_us.sort()
            if state.exists:
                start, last, n = state.get
            else:
                first = ts_us.pop(0)
                start, last, n = first, first, 1
            for t in ts_us:
                if t - last > gap_us:
                    closed.append((start, last, n))
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            state.update((start, last, n))
            # fire once the watermark proves no event can extend the session;
            # clamp above the current watermark (Spark rejects timeouts at or
            # below it — a session already past-due fires next micro-batch)
            timeout_ms = max(
                (last + gap_us) // 1000, state.getCurrentWatermarkMs() + 1
            )
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s * 1000, unit="ns") for s, _l, _n in closed
                    ],
                    "session_end": [
                        pd.Timestamp(l * 1000, unit="ns") for _s, l, _n in closed
                    ],
                    "n_events": [n for _s, _l, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap sessionization: emits each session exactly once, when
    the event-time watermark guarantees it closed.  Input needs
    ``(user_col, ts_col timestamp)``; NULL timestamps are dropped (same rule
    as the batch operator)."""
    stream = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
        .withWatermark("ts", watermark)
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
