"""Streaming exact deduplication with bounded state.

Batch dedup (``operators/dedup.py``) sees the whole corpus; a stream
cannot, so the state contract IS the operator: keys are remembered only
while the watermark says a duplicate may still arrive, then evicted —
``dropDuplicatesWithinWatermark`` (the Spark 3.5+ primitive built for
exactly this).  Without the watermark bound, a 10^12-event stream grows
the dedup state forever; with it, state is O(keys per watermark window).

No reference analog (the reference is batch-only, SURVEY §2.9); this is
the streaming face of the dedup ladder, proven against the batch operator
by the stream-vs-batch differential test (duplicates arriving in LATER
micro-batches, within the watermark, must still dedup — cross-batch state
is the thing under test).

The stateless quality filters (``quality_filters.gopher_flags``, the rule
compiler's per-row predicates) need no streaming variant at all: they are
pure projections, legal on streaming DataFrames unchanged — covered by the
same test module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["dedup_stream"]


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First event per key wins; duplicates arriving within ``watermark``
    of event time are dropped, later ones may reappear (the documented
    state/correctness trade every streaming dedup makes).

    Works on batch frames too (falls back to plain ``dropDuplicates`` so
    the differential test can run one expression both ways).
    """
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
