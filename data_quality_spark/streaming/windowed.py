"""Watermarked windowed streaming aggregates.

Beyond the batch-parity ``gate_stream`` (foreachBatch), this is the native
Structured-Streaming shape for continuous quality metrics: event-time
windows + a watermark bounding how late data may arrive before its window
is finalized and state is evicted — the mechanism that keeps state size
bounded on an unbounded stream (no reference analog; the reference is
batch-only, SURVEY §2.9).

Scale notes: state lives in the state store keyed by (window, group); the
watermark is the eviction contract — without it a 10^12-event stream grows
state forever.  Output mode ``append`` emits each window exactly once, when
the watermark passes its end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_counts"]


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-(event-time window, group) counts with late-data handling.

    Works on both streaming and batch DataFrames (batch ignores the
    watermark) — the differential test runs the same expression both ways
    and asserts identical results after an availableNow drain.
    """
    src = stream.withWatermark(ts_col, watermark) if stream.isStreaming else stream
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(group_col),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "n_events",
        )
    )
