"""Event sessionization + session statistics (window-function operators).

The reference has no OVER clauses (SURVEY §2.5); these are the
training-pipeline additions for behavioral/event tables: gap-based
sessionization (the standard lag → new-session flag → running-sum pattern)
and per-session rollups.  All expressions are timezone-free (timestamp
differences against INTERVAL literals), so results are identical under any
Spark session timezone and match the DuckDB oracle exactly.

Scale shape: ONE shuffle on the user key; both window passes and the
session rollup share that partitioning (Catalyst reuses the exchange), and
at 10^12 events the per-user partitions are what AQE's skew handling splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "user_session_counts"]


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append ``session_idx`` (1-based per user): a new session starts when
    the gap to the previous event exceeds ``gap_minutes``.

    Rows with a NULL timestamp are dropped first — an event that cannot be
    placed in time belongs to no session, and without the filter Spark's
    NULLS FIRST vs DuckDB's NULLS LAST window ordering would make the two
    engines disagree.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.make_dt_interval(mins=F.lit(gap_minutes))
    new_session = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.filter(F.col(ts_col).isNotNull()).withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: event count and duration in seconds (exact
    integer timestamp arithmetic)."""
    dur = (
        F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))
    ) / F.lit(1_000_000)
    return (
        sessions.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dur.cast("double").alias("duration_s"),
        )
    )


def user_session_counts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session count + event count (the compact verification
    relation: exact integers only)."""
    s = sessionize(df, user_col, ts_col, gap_minutes)
    # no orderBy: keeps the operator at exactly one shuffle (the user key);
    # callers that need sorted output sort the small result themselves
    return s.groupBy(user_col).agg(
        F.max("session_idx").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
