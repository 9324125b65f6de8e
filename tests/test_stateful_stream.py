"""applyInPandasWithState sessionization: streaming sessions must match the
batch operator exactly for every session the watermark closed, across
micro-batch boundaries (state carried between batches, timers fired by the
advancing watermark)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest


def _write_slice(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        # µs timestamps: Spark's TimestampType physical encoding
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    )
    pq.write_table(table, path)


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    from data_quality_spark.operators.events import sessionize
    from data_quality_spark.streaming.stateful import sessionize_stream
    from pyspark.sql import functions as F

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    m = timedelta(minutes=1)
    # file 1: session A for users 1, 2, 3 (events within the 30-min gap)
    slice1 = [(u, t0 + i * m) for u in (1, 2, 3) for i in range(3)]
    # file 2 (2 h later): new sessions for users 2, 3 — closes their session
    # A by gap inside the batch AND advances the watermark
    slice2 = [(u, t0 + timedelta(hours=2) + i * m) for u in (2, 3) for i in range(2)]
    # file 3 (4 h later): user 1 again — by now the watermark (from file 2)
    # is far past user 1's session-A timeout, so the timer fires
    slice3 = [(1, t0 + timedelta(hours=4))]

    src = tmp_path / "events"
    src.mkdir()
    for i, s in enumerate([slice1, slice2, slice3], start=1):
        _write_slice(str(src / f"part-{i:03d}.parquet"), s)

    batch_df = spark.createDataFrame(
        slice1 + slice2 + slice3, "user_id long, ts timestamp"
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in (
            sessionize(batch_df)
            .groupBy("user_id", "session_idx")
            .agg(
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out_dir = str(tmp_path / "sessions")
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    # every emitted session is bit-exact against the batch operator
    assert got <= want, got - want
    # the three session-A closures MUST have been emitted: users 2 and 3 by
    # the in-batch gap, user 1 by the event-time timer across batches
    emitted_users = {u for (u, s, e, n) in got if s == t0}
    assert emitted_users == {1, 2, 3}
    # availableNow's final flush fires the remaining timers too: everything
    # closes except user 1's trailing session (watermark == its last event,
    # so it could still grow) — 5 of the 6 batch sessions
    assert len(got) == 5
    missing = want - got
    assert {u for (u, _s, _e, _n) in missing} == {1}
    assert all(n == 1 for (_u, _s, _e, n) in missing)
    # exactly-once: no duplicate emissions
    assert len(got) == spark.read.parquet(out_dir).count()
