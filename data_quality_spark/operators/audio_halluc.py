"""ASR-hallucination / cross-modal mismatch audit.

The one defect family neither a text-only nor an audio-only scan can
catch: the transcript and the audio DISAGREE.  Four exact laws per clip
(constants in ``functions.halluc``; VAD evidence from ``functions.vad``):

- ``text_over_silence``: a ≥``TOS_MIN_TOKENS``-token transcript over a
  clip whose detected speech is ≤``TOS_MAX_SPEECH_MS`` — the caption is
  invented (the canonical Whisper-on-silence failure);
- ``speech_no_text``: ≥``SNT_MIN_SPEECH_MS`` of detected speech with an
  empty transcript — lost/failed transcription;
- ``end_loop``: a ≤``LOOP_MAX_PERIOD``-token phrase repeated verbatim
  ≥``LOOP_MIN_REPEATS`` times at the transcript TAIL with loop mass
  ≥``LOOP_MIN_TOKENS`` tokens — the decoder repetition loop;
- ``stock_caption``: the whole normalized transcript is a known
  subtitle-credit / outro phrase over ≥``STOCK_MIN_DUR_MS`` of decoded
  audio — captioning boilerplate emitted over non-speech content.

ONE ``mapInArrow`` pass: zero-copy Arrow buffer → decode → VAD stats,
transcript tokenized next to it; the payload is dropped at the boundary
(output rows are ~60 bytes of scalars), so the stage is a pure map that
scales with input splits at 10^12 rows exactly like ``pipeline.
featurize``.  No shuffle, no UDF-per-row — whole-batch Python over
Arrow, the repo-wide audio-kernel shape.

Undecodable clips (``ok=false``) keep text-side stats but never flag the
audio-evidence laws (you cannot claim silence for bytes you cannot read).

Reference analog: none — the reference has no audio path; this feeds the
same predicate → severity → gate machinery as its row rules
(/root/reference/src/data_quality/checkpoints.py:178-296).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["halluc_flags", "halluc_issues"]

_STATS = [
    ("n_tokens", T.IntegerType(), "int32"),
    ("dur_dec_ms", T.IntegerType(), "int32"),
    ("speech_ms", T.IntegerType(), "int32"),
    ("speech_ratio", T.DoubleType(), "float64"),
    ("tail_period", T.IntegerType(), "int32"),
    ("tail_repeats", T.IntegerType(), "int32"),
]
_FLAGS = ["text_over_silence", "speech_no_text", "end_loop", "stock_caption"]


def halluc_flags(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, ok, n_tokens, dur_dec_ms, speech_ms, speech_ratio,
    tail_period, tail_repeats, text_over_silence, speech_no_text,
    end_loop, stock_caption, is_halluc) — one Arrow pass per clip."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("ok", T.BooleanType(), False),
        ]
        + [T.StructField(n, t, False) for n, t, _ in _STATS]
        + [T.StructField(n, T.BooleanType(), False) for n in _FLAGS]
        + [T.StructField("is_halluc", T.BooleanType(), False)]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.halluc import (
            LOOP_MIN_REPEATS,
            LOOP_MIN_TOKENS,
            SNT_MIN_SPEECH_MS,
            STOCK_MIN_DUR_MS,
            STOCK_PHRASES,
            TOS_MAX_SPEECH_MS,
            TOS_MIN_TOKENS,
            normalize_caption,
            tail_loop,
        )
        from ..functions.vad import vad_stats

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            texts = batch.column(col_idx["transcript"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            cols: dict[str, list] = {n: [] for n, _, _ in _STATS}
            oks: list[bool] = []
            flags: dict[str, list] = {n: [] for n in _FLAGS}
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                sr = srs[i] or 0
                try:
                    q = _decode_i16(buf, codecs[i], sr)
                    ok = True
                except (ValueError, TypeError):
                    q = np.zeros(0, dtype=np.int16)
                    ok = False
                st = vad_stats(q.astype(np.float32) / np.float32(32767.0), sr)
                dur_dec = int(len(q) * 1000 // sr) if (ok and sr > 0) else 0
                toks = (texts[i] or "").split()
                p, k = tail_loop(toks)
                norm = normalize_caption(texts[i])
                tos = bool(
                    ok
                    and len(toks) >= TOS_MIN_TOKENS
                    and st["speech_ms"] <= TOS_MAX_SPEECH_MS
                )
                snt = bool(
                    ok and len(toks) == 0 and st["speech_ms"] >= SNT_MIN_SPEECH_MS
                )
                loop = bool(k >= LOOP_MIN_REPEATS and p * k >= LOOP_MIN_TOKENS)
                stock = bool(
                    ok and norm in STOCK_PHRASES and dur_dec >= STOCK_MIN_DUR_MS
                )
                oks.append(ok)
                cols["n_tokens"].append(len(toks))
                cols["dur_dec_ms"].append(dur_dec)
                cols["speech_ms"].append(st["speech_ms"])
                cols["speech_ratio"].append(st["speech_ratio"])
                cols["tail_period"].append(p)
                cols["tail_repeats"].append(k)
                flags["text_over_silence"].append(tos)
                flags["speech_no_text"].append(snt)
                flags["end_loop"].append(loop)
                flags["stock_caption"].append(stock)
            any_flag = [
                a or b or c or d
                for a, b, c, d in zip(*(flags[n] for n in _FLAGS))
            ]
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.string()), pa.array(oks, type=pa.bool_())]
                + [
                    pa.array(cols[n], type=getattr(pa, pat)())
                    for n, _, pat in _STATS
                ]
                + [pa.array(flags[n], type=pa.bool_()) for n in _FLAGS]
                + [pa.array(any_flag, type=pa.bool_())],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)


def halluc_issues(flags: DataFrame, table: str = "clips") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — total folded from the same pass): the four laws, the
    audio-evidence ones critical, the text-shape ones warning."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        *[F.count(F.when(F.col(n), 1)).alias(f"n:{n}") for n in _FLAGS],
    )
    rules = [
        ("text_over_silence", "critical", "transcript",
         "multi-token transcript over silent audio: invented caption"),
        ("speech_no_text", "critical", "transcript",
         "clear speech with an empty transcript: lost transcription"),
        ("end_loop", "warning", "transcript",
         "phrase repeated verbatim at the transcript tail: decoder loop"),
        ("stock_caption", "warning", "transcript",
         "whole caption is subtitle-credit boilerplate over long audio"),
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
