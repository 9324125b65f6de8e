"""Voice-activity summary and silence-split segmentation as operators.

Two shapes over the same ``functions.vad`` kernel:

- ``clip_vad``      — one row per clip: speech_ratio, run-length stats.
  Feeds drop rules the whole-clip ``silence_frac`` cannot express (a clip
  that is 50% silence in one contiguous block vs speech with natural gaps).
- ``clip_segments`` — one row per *active segment* (variable fan-out): the
  chunking step that turns raw clips into per-utterance training rows.

Both are single ``mapInArrow`` passes: zero-copy Arrow buffer → numpy,
payload dropped at the boundary, no shuffle — pure maps that scale with
input splits at 10^12 rows exactly like ``pipeline.featurize``.  The
segment fan-out multiplies row count but each output row is ~50 bytes of
scalars (the audio bytes never leave the stage), so the downstream exchange
is tiny regardless of corpus size.

Reference analog: no audio path in the reference; nearest shape is its
row-level predicate rules (``/root/reference/src/data_quality/
checkpoints.py:178-296``) — these operators mint the rows those predicates
then judge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["clip_vad", "clip_segments", "speaking_rate",
           "extract_segments", "trim_silence", "VAD_FIELDS"]

VAD_FIELDS = [
    ("n_frames", T.IntegerType(), "int32"),
    ("speech_ratio", T.DoubleType(), "float64"),
    ("speech_ms", T.IntegerType(), "int32"),
    ("n_segments", T.IntegerType(), "int32"),
    ("longest_speech_ms", T.IntegerType(), "int32"),
    ("longest_silence_ms", T.IntegerType(), "int32"),
    ("leading_silence_ms", T.IntegerType(), "int32"),
    ("trailing_silence_ms", T.IntegerType(), "int32"),
]


def clip_vad(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_frames, speech_ratio, n_segments, longest_speech_ms,
    longest_silence_ms, leading_silence_ms, trailing_silence_ms); ``ok`` is
    False when the clip fails to decode (stats then describe a zero-length
    signal: all-silence, zero frames)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, dt, False) for name, dt, _ in VAD_FIELDS]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.vad import vad_stats

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {name: [] for name, _, _ in VAD_FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                stats = vad_stats(q.astype(np.float32) / np.float32(32767.0), srs[i] or 0)
                oks.append(ok)
                for name, _, _ in VAD_FIELDS:
                    cols[name].append(stats[name])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=getattr(pa, pat)())
                   for name, _, pat in VAD_FIELDS],
                names=["clip_id", "ok"] + [n for n, _, _ in VAD_FIELDS],
            )

    return df.mapInArrow(run, out_schema)


def clip_segments(df: DataFrame, counter=None) -> DataFrame:
    """One row per silence-split active segment: (clip_id, seg_idx,
    start_ms, end_ms, dur_ms, rms_db).  Clips with no activity (or that
    fail to decode) contribute zero rows — the chunker's contract is
    'emit only usable training segments'."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("start_ms", T.IntegerType(), False),
        T.StructField("end_ms", T.IntegerType(), False),
        T.StructField("dur_ms", T.IntegerType(), False),
        T.StructField("rms_db", T.DoubleType(), False),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.vad import vad_segments

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in
                   ("clip_id", "seg_idx", "start_ms", "end_ms", "dur_ms",
                    "rms_db")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    continue
                for seg in vad_segments(q.astype(np.float32) / np.float32(32767.0),
                                        srs[i] or 0):
                    out["clip_id"].append(ids[i])
                    out["seg_idx"].append(seg["seg_idx"])
                    out["start_ms"].append(seg["start_ms"])
                    out["end_ms"].append(seg["end_ms"])
                    out["dur_ms"].append(seg["dur_ms"])
                    out["rms_db"].append(seg["rms_db"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["clip_id"], type=pa.string()),
                 pa.array(out["seg_idx"], type=pa.int32()),
                 pa.array(out["start_ms"], type=pa.int32()),
                 pa.array(out["end_ms"], type=pa.int32()),
                 pa.array(out["dur_ms"], type=pa.int32()),
                 pa.array(out["rms_db"], type=pa.float64())],
                names=list(out),
            )

    return df.mapInArrow(run, out_schema)


def speaking_rate(
    df: DataFrame,
    *,
    min_cps: float = 4.0,
    max_cps: float = 30.0,
    min_speech_ms: int = 200,
    counter=None,
) -> DataFrame:
    """Transcript↔audio alignment sanity: characters per *speech* second.

    The gate's ``length_ratio`` rule divides transcript length by clip
    DURATION — a clip that is half silence passes with a transcript twice
    too long.  This operator divides by the VAD's speech time instead, so
    a misaligned transcript cannot hide behind pauses.

    One ``mapInArrow`` pass (decode → VAD speech_ms; non-whitespace char
    count via vectorized Arrow compute on the transcript column — no
    per-row Python string work), then a JVM projection for the rate and
    flag.  NO join, NO shuffle: at 10^12 rows the clip_vad-then-join
    formulation would shuffle ~50 TB of scalar rows; this ships nothing.

    Flags (first match wins):
      undecodable | silent_with_text | speech_without_text | empty |
      insufficient_speech (< min_speech_ms of speech: rate unreliable) |
      too_fast | too_slow | ok
    """
    from pyspark.sql import functions as F

    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("speech_ms", T.IntegerType(), False),
        T.StructField("chars", T.IntegerType(), False),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.audio import _decode_i16
        from ..functions.vad import vad_stats

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            txt = pc.fill_null(batch.column(col_idx["transcript"]), "")
            chars = pc.utf8_length(
                pc.replace_substring_regex(txt, pattern="[ \\t\\n\\r]+",
                                           replacement=""))
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            sp_ms: list[int] = []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                st = vad_stats(
                    q.astype(np.float32) / np.float32(32767.0), srs[i] or 0)
                oks.append(ok)
                sp_ms.append(st["speech_ms"])
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(oks, type=pa.bool_()),
                 pa.array(sp_ms, type=pa.int32()),
                 chars.cast(pa.int32())],
                names=["clip_id", "ok", "speech_ms", "chars"],
            )

    base = df.mapInArrow(run, out_schema)
    speech_s = F.col("speech_ms").cast("double") / 1000.0
    cps = F.when(F.col("speech_ms") > 0,
                 F.col("chars").cast("double") / speech_s)
    flag = (
        F.when(~F.col("ok"), "undecodable")
        .when((F.col("speech_ms") == 0) & (F.col("chars") > 0),
              "silent_with_text")
        .when((F.col("speech_ms") > 0) & (F.col("chars") == 0),
              "speech_without_text")
        .when((F.col("speech_ms") == 0) & (F.col("chars") == 0), "empty")
        .when(F.col("speech_ms") < min_speech_ms, "insufficient_speech")
        .when(F.col("cps") > max_cps, "too_fast")
        .when(F.col("cps") < min_cps, "too_slow")
        .otherwise("ok")
    )
    return base.withColumn("cps", cps).withColumn("flag", flag)


def extract_segments(
    df: DataFrame, *, min_dur_ms: int = 0, carry_cols: tuple[str, ...] = (),
    counter=None,
) -> DataFrame:
    """The materialized chunker: one OUTPUT CLIP per active segment, with
    the segment's own pcm16 payload sliced out of the decoded waveform on
    exact frame-grid sample bounds (never the rounded ms fields).

    ``clip_segments`` is the audit relation (metadata only, payload never
    leaves the stage); this is the PRODUCT relation — the rows a training
    pipeline actually ingests.  Variable fan-out map, one decode per
    input clip, no shuffle; segments shorter than ``min_dur_ms`` are
    dropped (clicks and stray frames are not training data).  Output
    payloads are always pcm16 little-endian regardless of input codec,
    so downstream stages never re-dispatch on codec.

    ``carry_cols`` names input columns to repeat onto every segment row
    (e.g. ``("ingest_day",)`` so the segment product can be written
    partitioned without a join back to the source clip).
    """
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    base_fields = [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("seg_idx", T.IntegerType(), False),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("start_ms", T.IntegerType(), False),
        T.StructField("dur_ms", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("rms_db", T.DoubleType(), False),
    ]
    out_schema = T.StructType(
        base_fields + [df.schema[c] for c in carry_cols]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.vad import vad_segments

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            carry_vals = {
                c: batch.column(col_idx[c]).to_pylist() for c in carry_cols
            }
            carry_types = {c: batch.column(col_idx[c]).type for c in carry_cols}
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("clip_id", "seg_idx", "sr_hz",
                                   "start_ms", "dur_ms", "bytes", "rms_db")}
            carried: dict[str, list] = {c: [] for c in carry_cols}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    continue
                sr = srs[i] or 0
                for seg in vad_segments(
                        q.astype(np.float32) / np.float32(32767.0), sr):
                    if seg["dur_ms"] < min_dur_ms:
                        continue
                    sl = np.ascontiguousarray(
                        q[seg["start_sample"]:seg["end_sample"]], dtype="<i2")
                    out["clip_id"].append(ids[i])
                    out["seg_idx"].append(seg["seg_idx"])
                    out["sr_hz"].append(sr)
                    out["start_ms"].append(seg["start_ms"])
                    out["dur_ms"].append(seg["dur_ms"])
                    out["bytes"].append(sl.tobytes())
                    out["rms_db"].append(seg["rms_db"])
                    for c in carry_cols:
                        carried[c].append(carry_vals[c][i])
            yield pa.RecordBatch.from_arrays(
                [pa.array(out["clip_id"], type=pa.string()),
                 pa.array(out["seg_idx"], type=pa.int32()),
                 pa.array(out["sr_hz"], type=pa.int32()),
                 pa.array(out["start_ms"], type=pa.int32()),
                 pa.array(out["dur_ms"], type=pa.int32()),
                 pa.array(out["bytes"], type=pa.binary()),
                 pa.array(out["rms_db"], type=pa.float64())]
                + [pa.array(carried[c], type=carry_types[c])
                   for c in carry_cols],
                names=list(out) + list(carry_cols),
            )

    return df.mapInArrow(run, out_schema)


def trim_silence(df: DataFrame, counter=None) -> DataFrame:
    """Leading/trailing-silence trim — the standard training-prep
    transform ``extract_segments`` is the per-utterance version of: ONE
    span [first active segment's start, last active segment's end] is
    sliced out of the decoded waveform (interior pauses are KEPT — this
    is a trim, not a chunker), emitted as pcm16 regardless of input
    codec.

    One decode per clip, variable nothing — exactly one output row per
    input row, zero shuffles.  Rows with no usable activity (undecodable,
    sr ≤ 0, or no active VAD segment) pass through with ``trimmed=False``
    and an empty payload (``n_out = 0``): the gate's silence rule owns
    those clips, and a training manifest should never carry them.

    Bounds are the VAD's exact frame-grid sample indices (never the
    rounded ms fields), so the pure-Python twin re-derives the slice
    byte-for-byte.
    """
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType([
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("trimmed", T.BooleanType(), False),
        T.StructField("sr_hz", T.IntegerType(), False),
        T.StructField("n_in", T.IntegerType(), False),
        T.StructField("n_out", T.IntegerType(), False),
        T.StructField("lead_ms", T.IntegerType(), False),
        T.StructField("tail_ms", T.IntegerType(), False),
        T.StructField("bytes", T.BinaryType(), True),
    ])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.vad import vad_segments

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            out = {k: [] for k in ("ok", "trimmed", "sr_hz", "n_in",
                                   "n_out", "lead_ms", "tail_ms",
                                   "bytes")}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                sr = srs[i] or 0
                segs = (list(vad_segments(
                    q.astype(np.float32) / np.float32(32767.0), sr))
                    if ok and sr > 0 else [])
                n_in = int(q.size)
                if segs:
                    s0 = int(segs[0]["start_sample"])
                    s1 = int(segs[-1]["end_sample"])
                    sl = np.ascontiguousarray(q[s0:s1], dtype="<i2")
                    out["trimmed"].append(True)
                    out["n_out"].append(int(sl.size))
                    out["lead_ms"].append(
                        int(round(s0 * 1000 / sr)) if sr else 0)
                    out["tail_ms"].append(
                        int(round((n_in - s1) * 1000 / sr)) if sr else 0)
                    out["bytes"].append(sl.tobytes())
                else:
                    out["trimmed"].append(False)
                    out["n_out"].append(0)
                    out["lead_ms"].append(0)
                    out["tail_ms"].append(0)
                    out["bytes"].append(b"")
                out["ok"].append(ok)
                out["sr_hz"].append(sr)
                out["n_in"].append(n_in)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(out["ok"], type=pa.bool_()),
                 pa.array(out["trimmed"], type=pa.bool_()),
                 pa.array(out["sr_hz"], type=pa.int32()),
                 pa.array(out["n_in"], type=pa.int32()),
                 pa.array(out["n_out"], type=pa.int32()),
                 pa.array(out["lead_ms"], type=pa.int32()),
                 pa.array(out["tail_ms"], type=pa.int32()),
                 pa.array(out["bytes"], type=pa.binary())],
                names=["clip_id", "ok", "trimmed", "sr_hz", "n_in",
                       "n_out", "lead_ms", "tail_ms", "bytes"],
            )

    return df.mapInArrow(run, out_schema)
