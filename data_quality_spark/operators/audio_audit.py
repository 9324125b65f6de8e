"""Fused audio audit: every per-clip signal metric from ONE decode.

``clip_stats`` / ``clip_dropout`` / ``clip_vad`` / ``clip_snr`` /
``clip_lufs`` each decode the payload themselves — right for à-la-carte
use, 5× the decode cost when a health check wants all of them.  At
100 TB decode IS the dominant cost (BENCH.md: ~115-180 µs/clip vs
~7 µs for the downstream kernels), so the audit shape is: decode once,
run every kernel on the shared buffers, emit one wide scalar row.

``audit_issues`` then folds the wide relation into the reference's
issue schema (table, column, issue_type, count, total, percent,
severity, description — ``/root/reference/src/data_quality/
null_scan.py``'s report shape) with ONE fused aggregate: 12 flag counts
+ the total in a single partial/final pair, stack to rows after.
The mains-hum comb scan is fused in too (its long-frame FFT adds
~208 µs/clip against ~1.7 ms of existing audit kernels, measured —
BENCH.md "hum fusion"), as is the blind-reverb decay scan (frame
energies + a Python segment walk, negligible next to the FFT work);
``operators.audio_hum`` / ``operators.audio_reverb`` stay the
à-la-carte scans with the full per-clip metrics.

Because every kernel here is the same function the à-la-carte
operators run (each hash-verified by its own differential oracle), the
audit's floats are bit-identical to theirs; the differential surface of
the audit oracle is the flag ladder and the fused aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .audio_dropout import DC_DEN, DC_NUM, STUCK_MIN_DEFAULT
from ..functions.quantization import MIN_NONZERO_DEFAULT, UPCONVERT_TZ_BITS
from ..functions.reverb import (
    MIN_DECAYS as REVERB_MIN_DECAYS,
    RT60_FLAG_MAX,
    RT60_FLAG_MIN,
)
from ..functions.spectral import HUM_MIN_CONTRAST, HUM_MIN_FRAC
from ..synth import GateThresholds as TH

__all__ = ["audio_audit", "audit_issues", "AUDIT_RULES"]

SNR_MIN_DB = 10.0
LUFS_MIN = -40.0
LUFS_MAX = -5.0

_FIELDS = [
    ("n_samples", T.LongType()),
    ("rms_db", T.DoubleType()),
    ("peak_db", T.DoubleType()),
    ("silence_frac", T.DoubleType()),
    ("clip_frac", T.DoubleType()),
    ("speech_ratio", T.DoubleType()),
    ("speech_ms", T.IntegerType()),
    ("snr_db", T.DoubleType()),
    ("lufs_i", T.DoubleType()),
    ("n_dropouts", T.LongType()),
    ("max_const_run", T.LongType()),
    ("dc_sum", T.LongType()),
    ("n_nonzero", T.LongType()),
    ("tz_bits", T.LongType()),
    ("mulaw_hits", T.LongType()),
    ("hum_frac", T.DoubleType()),
    ("hum_contrast", T.DoubleType()),
    ("hum_hz", T.DoubleType()),
    ("n_decays", T.LongType()),
    ("rt60_est", T.DoubleType()),
]


def audio_audit(df: DataFrame, counter=None) -> DataFrame:
    """One wide scalar row per clip from a single decode."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [T.StructField("clip_id", T.StringType(), False),
         T.StructField("codec", T.StringType(), True),
         T.StructField("ok", T.BooleanType(), False)]
        + [T.StructField(name, dt, True) for name, dt in _FIELDS]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16, clip_stats_i16
        from ..functions.dropout import dropout_stats_i16
        from ..functions.loudness import clip_loudness
        from ..functions.quantization import quantization_stats_i16
        from ..functions.reverb import decay_stats
        from ..functions.snr import speech_snr
        from ..functions.spectral import hum_stats
        from ..functions.vad import frame_mean_squares, vad_stats

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            oks: list[bool] = []
            cols: dict[str, list] = {name: [] for name, _ in _FIELDS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    q = _decode_i16(buf, codecs[i], srs[i])
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                sr = srs[i] or 0
                x = q.astype(np.float32) / np.float32(32767.0)
                st = clip_stats_i16(q, sr)
                dp = dropout_stats_i16(q, sr)
                # the 20 ms frame-energy reduction is the shared O(n)
                # pass of BOTH the VAD and the SNR kernel — compute it
                # once (bit-identical: same function either way)
                fr = (frame_mean_squares(x, sr)
                      if x.size and sr > 0 else None)
                vd = vad_stats(x, sr, frames=fr)
                sn = speech_snr(x, sr, frames=fr)
                lf = clip_loudness(x, sr)
                qt = quantization_stats_i16(q, include_distinct=False)
                # same int16 input as operators.audio_hum.clip_hum so the
                # fused floats stay bit-identical to the a-la-carte scan
                hm = hum_stats(q, sr)
                # same float32-normalized input as audio_reverb.clip_decay
                # (x IS that array — identical expression, no second
                # full-clip allocation/normalize pass)
                rv = decay_stats(x, sr)
                oks.append(ok)
                cols["n_samples"].append(int(q.size))
                cols["rms_db"].append(st["rms_db"])
                cols["peak_db"].append(st["peak_db"])
                cols["silence_frac"].append(st["silence_frac"])
                cols["clip_frac"].append(st["clip_frac"])
                cols["speech_ratio"].append(vd["speech_ratio"])
                cols["speech_ms"].append(vd["speech_ms"])
                cols["snr_db"].append(sn["snr_db"])
                cols["lufs_i"].append(lf["lufs_i"])
                cols["n_dropouts"].append(dp["n_dropouts"])
                cols["max_const_run"].append(dp["max_const_run"])
                cols["dc_sum"].append(dp["dc_sum"])
                cols["n_nonzero"].append(qt["n_nonzero"])
                cols["tz_bits"].append(qt["tz_bits"])
                cols["mulaw_hits"].append(qt["mulaw_hits"])
                cols["hum_frac"].append(hm["hum_frac"])
                cols["hum_contrast"].append(hm["hum_contrast"])
                cols["hum_hz"].append(hm["hum_hz"])
                cols["n_decays"].append(int(rv["n_decays"]))
                cols["rt60_est"].append(rv["rt60_est"])
            pa_types = {
                "LongType": pa.int64(), "DoubleType": pa.float64(),
                "IntegerType": pa.int32(),
            }
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()),
                 pa.array(codecs, type=pa.string()),
                 pa.array(oks, type=pa.bool_())]
                + [pa.array(cols[name], type=pa_types[type(dt).__name__])
                   for name, dt in _FIELDS],
                names=["clip_id", "codec", "ok"] + [n for n, _ in _FIELDS],
            )

    return df.mapInArrow(run, out_schema)


# issue_type -> (flag column builder, severity-when-present, column, description)
AUDIT_RULES = {
    "undecodable": (
        lambda: ~F.col("ok"),
        "critical", "bytes", "payload failed to decode"),
    "mostly_silence": (
        lambda: F.col("ok")
        & (F.col("silence_frac") > F.lit(TH.SILENCE_MAX)),
        "warning", "bytes", "more than 80% silent frames"),
    "clipping": (
        lambda: F.col("ok") & (F.col("clip_frac") > F.lit(TH.CLIP_MAX)),
        "warning", "bytes", "clipped-sample fraction above limit"),
    "too_quiet": (
        lambda: F.col("ok") & (F.col("rms_db") < F.lit(TH.RMS_MIN_DB)),
        "warning", "bytes", "rms below usable level"),
    "low_snr": (
        lambda: F.col("snr_db") < F.lit(SNR_MIN_DB),
        "warning", "bytes", "speech-to-noise ratio below 10 dB"),
    "loudness_range": (
        lambda: (F.col("lufs_i") < F.lit(LUFS_MIN))
        | (F.col("lufs_i") > F.lit(LUFS_MAX)),
        "info", "bytes", "integrated loudness outside [-40, -5] LUFS"),
    "dropout": (
        lambda: F.col("n_dropouts") > 0,
        "critical", "bytes", "interior zero-run dropout detected"),
    "stuck_samples": (
        lambda: F.col("max_const_run") >= F.lit(STUCK_MIN_DEFAULT),
        "critical", "bytes", "stuck-sample plateau detected"),
    "dc_offset": (
        lambda: F.abs(F.col("dc_sum")) * F.lit(DC_DEN)
        > F.lit(DC_NUM) * F.col("n_samples") * F.lit(32768),
        "warning", "bytes", "converter DC bias above 2% full scale"),
    # lattice law shared with operators.audio_quantization: a 16-bit
    # container whose samples live on an 8-bit or µ-law lattice was
    # upconverted; below MIN_NONZERO_DEFAULT nonzero samples the clip is
    # not evaluable and must not count (the AND keeps it FALSE)
    # decision law shared with operators.audio_hum.hum_flags: the 50/60 Hz
    # comb must be audible (>= 1% of total power) AND dominate the <200 Hz
    # band; NULL metrics (undecodable / shorter than one 4096 frame) never
    # fire because NULL comparisons are skipped by count()
    "mains_hum": (
        lambda: (F.col("hum_frac") >= F.lit(HUM_MIN_FRAC))
        & (F.col("hum_contrast") >= F.lit(HUM_MIN_CONTRAST)),
        "warning", "bytes", "mains hum (50/60 Hz comb) detected"),
    # decision law shared with operators.audio_reverb.reverb_flags
    "reverberant": (
        lambda: (F.col("n_decays") >= F.lit(REVERB_MIN_DECAYS))
        & (F.col("rt60_est") >= F.lit(RT60_FLAG_MIN))
        & (F.col("rt60_est") <= F.lit(RT60_FLAG_MAX)),
        "warning", "bytes", "room decay population (RT60 0.35-4 s)"),
    "upconverted": (
        lambda: F.col("ok")
        & F.col("codec").isin("pcm16", "wav")
        & (F.col("n_nonzero") >= F.lit(MIN_NONZERO_DEFAULT))
        & ((F.col("tz_bits") >= F.lit(UPCONVERT_TZ_BITS))
           | (F.col("mulaw_hits") == F.col("n_nonzero"))),
        "warning", "bytes",
        "16-bit container over an 8-bit or mu-law source lattice"),
}


def audit_issues(audit: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the audit: one row per rule, computed in ONE
    fused aggregate (NULL metrics never fire a flag — comparisons with
    NULL are NULL and count() skips them)."""
    aggs = [F.count(F.lit(1)).alias("__total__")] + [
        F.count(F.when(build(), 1)).alias(f"n:{name}")
        for name, (build, _, _, _) in AUDIT_RULES.items()
    ]
    wide = audit.agg(*aggs)
    structs = []
    for name, (_, sev, column, desc) in AUDIT_RULES.items():
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
