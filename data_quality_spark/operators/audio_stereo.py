"""Channel-layout (stereo) audit as a relational operator.

Scraped stereo uploads carry a defect family mono pipelines mangle
silently: *dual mono* (identical channels — double the bytes, zero
extra information, and a 2x storage/compute tax at corpus scale), a
*dead channel* (one-sided cable / broken capture: digital silence on
exactly one side), *phase inversion* (R = -L; the clip cancels to
silence under the (L+R)/2 mono downmix every ASR front-end applies —
the resulting "silent" training example is pure poison), and gross
*power imbalance*.  ``functions.stereo`` computes EXACT integer sample
statistics per clip; the flags here are Catalyst expressions over those
integers, so no float ever decides the dual-mono / inversion /
dead-channel laws and the decisions are bit-stable across engines and
batch layouts.  ``corr`` / ``balance_db`` / ``rms_db_*`` ride along as
derived doubles (one shared formula over exact ints — bit-identical by
construction).

Execution shape: ONE ``mapInArrow`` pass, payload dropped at the
boundary, zero shuffles — scales with input splits.  The issue relation
is the audit law: ONE fused aggregate over the flags.

Reference analog: none (audio is beyond the reference); the shape is
the per-row rule scan (checks.py) applied to kernel-computed metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.stereo import DERIVED_FIELDS, IMBALANCE_DB, SUM_FIELDS

__all__ = ["clip_stereo", "stereo_flags", "stereo_issues", "downmix_mono"]


def clip_stereo(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, codec, n_ch, exact integer channel sums, derived
    doubles) via one Arrow pass.  ``n_ch`` is 0 for undecodable /
    non-PCM16-WAV payloads, 1 for mono WAVs (channel analysis is n/a,
    not a defect), 2 for stereo."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("codec", T.StringType(), True),
            T.StructField("n_ch", T.IntegerType(), False),
        ]
        + [T.StructField(name, T.LongType(), True) for name in SUM_FIELDS]
        + [T.StructField(name, T.DoubleType(), True)
           for name in DERIVED_FIELDS]
    )
    names = ["clip_id", "codec", "n_ch"] + SUM_FIELDS + DERIVED_FIELDS

    def run(batches):
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.stereo import (
            decode_wav_frames,
            derive_stereo,
            stereo_sums,
        )

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {name: [] for name in names[2:]}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    if codecs[i] in ("pcm16", "mulaw"):
                        # headerless house codecs are mono by contract
                        _decode_i16(buf, codecs[i], srs[i])
                        frames, n_ch = None, 1
                    else:
                        frames, n_ch, _sr = decode_wav_frames(buf)
                except (ValueError, TypeError):
                    frames, n_ch = None, 0
                if n_ch == 2 and frames is not None:
                    s = stereo_sums(frames)
                    d = derive_stereo(s["n_samples"], s["sum_l"],
                                      s["sum_r"], s["ss_l"], s["ss_r"],
                                      s["s_lr"])
                else:
                    s = {name: None for name in SUM_FIELDS}
                    d = {name: None for name in DERIVED_FIELDS}
                cols["n_ch"].append(n_ch)
                for name in SUM_FIELDS:
                    cols[name].append(s[name])
                for name in DERIVED_FIELDS:
                    cols[name].append(d[name])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(codecs, type=pa.string()),
                    pa.array(cols["n_ch"], type=pa.int32()),
                ]
                + [pa.array(cols[name], type=pa.int64())
                   for name in SUM_FIELDS]
                + [pa.array(cols[name], type=pa.float64())
                   for name in DERIVED_FIELDS],
                names=names,
            )

    return df.mapInArrow(run, out_schema)


def stereo_flags(df: DataFrame, counter=None) -> DataFrame:
    """``clip_stereo`` + the decision columns (exact integer laws):

    - ``dual_mono``      n_diff == 0 on a non-silent clip
    - ``phase_inverted`` n_anti == 0 on a non-silent clip
    - ``dead_channel``   exactly one channel all digital zeros
      (``dead_side`` says which); both-silent is the silence audit's
      job, not a channel defect
    - ``imbalanced``     both channels live and |balance_db| >=
      IMBALANCE_DB (the one float threshold; balance_db itself is
      bit-stable, derived from exact integer power sums)
    """
    ev = (F.col("n_ch") == 2) & (F.col("n_samples") > 0)
    live_l = F.col("nz_l") > 0
    live_r = F.col("nz_r") > 0
    dead = ev & (live_l != live_r)
    return (
        clip_stereo(df, counter=counter)
        .withColumn(
            "dual_mono",
            F.coalesce(ev & (F.col("n_diff") == 0) & live_l, F.lit(False)),
        )
        .withColumn(
            "phase_inverted",
            F.coalesce(ev & (F.col("n_anti") == 0) & live_l, F.lit(False)),
        )
        .withColumn("dead_channel", F.coalesce(dead, F.lit(False)))
        .withColumn(
            "dead_side",
            F.when(dead, F.when(live_r, F.lit("L")).otherwise(F.lit("R"))),
        )
        .withColumn(
            "imbalanced",
            F.coalesce(
                ev & live_l & live_r
                & (F.abs(F.col("balance_db")) >= F.lit(IMBALANCE_DB)),
                F.lit(False),
            ),
        )
    )


def downmix_mono(df: DataFrame, counter=None) -> DataFrame:
    """Repair-aware channel normalization: every clip out as mono pcm16.

    The ingest step in front of the (mono) gate.  A naive (L+R)/2 downmix
    destroys exactly the clips this module flags — a phase-inverted pair
    cancels to silence, a dead channel halves the level for nothing — so
    the mixdown is decided per clip by the SAME exact integer laws the
    audit uses:

    - ``undecodable``       not 16-bit PCM at all → NULL payload
    - ``mono_passthrough``  already mono (pcm16 / mulaw / 1-ch wav):
      re-emitted as pcm16 (µ-law expands through the integer formula)
    - ``take_live``         one channel digital silence → keep the live one
    - ``take_left_inverted`` R == -L sample-exact → keep L (mid would be 0)
    - ``take_left_dual``    R == L sample-exact → keep L (mid == L anyway,
      minus the shift's floor; taking L is exact)
    - ``mid``               healthy stereo → (L+R) >> 1 in int32 (exact
      arithmetic-shift floor — deterministic, no float, no clipping since
      a mean of two int16 fits int16)

    Emitted ``sr_hz`` / ``dur_ms`` are TRUTHFUL: the container's actual
    rate and the sample-count-implied duration (round-half-up in exact
    integers: ``(2*n*1000 + sr) // (2*sr)``), not the declared metadata —
    normalization is where lying metadata gets corrected.  One
    ``mapInArrow`` pass, one output row per input row, zero shuffles.
    """
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), True),
            T.StructField("sr_hz", T.IntegerType(), True),
            T.StructField("dur_ms", T.IntegerType(), True),
            T.StructField("codec", T.StringType(), True),
            T.StructField("transcript", T.StringType(), True),
            T.StructField("n_ch", T.IntegerType(), False),
            T.StructField("downmix_mode", T.StringType(), False),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.stereo import decode_wav_frames

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            trans = batch.column(col_idx["transcript"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            o_bytes: list = []
            o_sr: list = []
            o_dur: list = []
            o_codec: list = []
            o_nch: list = []
            o_mode: list = []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                mono: np.ndarray | None = None
                sr = None
                try:
                    if codecs[i] in ("pcm16", "mulaw"):
                        mono = _decode_i16(buf, codecs[i], srs[i])
                        n_ch, mode, sr = 1, "mono_passthrough", srs[i]
                    else:
                        frames, n_ch, sr = decode_wav_frames(buf)
                        if n_ch == 1:
                            mono, mode = frames[:, 0], "mono_passthrough"
                        else:
                            left = frames[:, 0]
                            right = frames[:, 1]
                            a = left.astype(np.int64)
                            b = right.astype(np.int64)
                            live_l = bool(np.any(a))
                            live_r = bool(np.any(b))
                            if live_l != live_r:
                                mono = left if live_l else right
                                mode = "take_live"
                            elif live_l and not np.any(a != -b):
                                mono, mode = left, "take_left_inverted"
                            elif live_l and not np.any(a != b):
                                mono, mode = left, "take_left_dual"
                            else:
                                mono = (
                                    (left.astype(np.int32)
                                     + right.astype(np.int32)) >> 1
                                ).astype(np.int16)
                                mode = "mid"
                except (ValueError, TypeError):
                    n_ch, mode, mono, sr = 0, "undecodable", None, None
                if mono is not None and sr and sr > 0:
                    n = int(len(mono))
                    o_bytes.append(
                        mono.astype("<i2", copy=False).tobytes()
                    )
                    o_sr.append(int(sr))
                    o_dur.append((2 * n * 1000 + sr) // (2 * sr))
                    o_codec.append("pcm16")
                else:
                    o_bytes.append(None)
                    o_sr.append(None)
                    o_dur.append(None)
                    o_codec.append(None)
                    if mode != "undecodable":
                        mode = "undecodable"
                        n_ch = 0
                o_nch.append(n_ch)
                o_mode.append(mode)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(o_bytes, type=pa.binary()),
                    pa.array(o_sr, type=pa.int32()),
                    pa.array(o_dur, type=pa.int32()),
                    pa.array(o_codec, type=pa.string()),
                    pa.array(trans, type=pa.string()),
                    pa.array(o_nch, type=pa.int32()),
                    pa.array(o_mode, type=pa.string()),
                ],
                names=["clip_id", "bytes", "sr_hz", "dur_ms", "codec",
                       "transcript", "n_ch", "downmix_mode"],
            )

    return df.mapInArrow(run, out_schema)


def stereo_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("dead_channel"), 1)).alias("n:dead_channel"),
        F.count(F.when(F.col("phase_inverted"), 1))
        .alias("n:phase_inverted"),
        F.count(F.when(F.col("dual_mono"), 1)).alias("n:dual_mono"),
        F.count(F.when(F.col("imbalanced"), 1)).alias("n:imbalanced"),
        F.count(F.when(F.col("n_ch") == 1, 1)).alias("n:not_stereo"),
        F.count(F.when(F.col("n_ch") == 0, 1)).alias("n:undecodable"),
    )
    rules = [
        ("dead_channel", "critical", "bytes",
         "digital silence on exactly one channel"),
        ("phase_inverted", "critical", "bytes",
         "R = -L sample-exact; cancels under mono downmix"),
        ("dual_mono", "warning", "bytes",
         "identical channels; stereo bytes, mono information"),
        ("imbalanced", "warning", "bytes",
         f"|L/R power ratio| >= {IMBALANCE_DB:g} dB"),
        ("not_stereo", "info", "bytes",
         "mono container; channel analysis n/a"),
        ("undecodable", "critical", "bytes",
         "payload is not a 1/2-channel 16-bit PCM RIFF/WAVE"),
    ]
    structs = []
    for name, sev, column, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit(column).alias("column"),
            F.lit(name).alias("issue_type"),
            cnt.alias("count"),
            total.alias("total"),
            F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
            .cast("double").alias("percent"),
            F.when(cnt > 0, F.lit(sev)).otherwise(F.lit("info"))
            .alias("severity"),
            F.lit(desc).alias("description"),
        ))
    return wide.select(F.explode(F.array(*structs)).alias("i")).select("i.*")
