"""Cross-modal PII redaction: scrub the transcript AND mute the audio.

Scrubbing ``<EMAIL>`` out of a transcript while shipping the clip that
*speaks* the address redacts nothing — the PII survives in the modality
models actually train on.  This operator closes that hole: every PII
span the scrub chain rewrites is also silenced in the waveform, using
uniform-rate alignment (char offsets → sample offsets, exact integer
law).  Uniform rate is the honest no-aligner baseline — speech rate
within a clip varies, so spans carry margin via ceil on the right edge;
a forced aligner, if one ever ships in the image, slots in at exactly
this seam (``pii_spans`` stays, only char→sample mapping changes).

Laws — exact integers:

- Spans come from the SAME ``PII_PATTERNS`` the scrub chain applies
  (``functions.text``), matched on the ORIGINAL text so offsets are
  stable; for ``url_credential`` only the password group is muted
  (matching the scrub's keep-user/mask-password semantics).
  Overlapping/adjacent spans merge (sorted sweep).
- Char span [c0, c1) maps to samples [c0·n // m, ceil(c1·n / m)) for a
  clip of n samples and m chars — pure integer division both sides.
- Muted samples are set to exactly 0; everything else is bit-identical
  to the input (re-encoded pcm16, the synth corpora's round-trip-exact
  codec).

Execution shape: ONE ``mapInArrow`` pass; the redacted payload leaves
the stage only in the full transform (``redact_clips``); the audit
relation (``redact_stats``) carries an md5 of the redacted bytes
instead — the payload-grade oracle convention (audio_mel).

Reference analog: F12's credential scrub (secure_db.py:265-268)
extended across the modality boundary; the transform shape is
repairs.py's.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import _TOX_PATTERN, PII_PATTERNS

__all__ = ["pii_spans", "mute_spans", "redact_clips", "redact_stats"]

# PII spans + the toxicity deny-list (the audio side of <TOX> is the
# classic bleep) — the SAME patterns the scrub chain rewrites
_COMPILED = [(name, re.compile(p)) for name, p, _ in PII_PATTERNS] + [
    ("toxicity", re.compile(_TOX_PATTERN))
]


def pii_spans(text: str | None) -> list[tuple[int, int]]:
    """Merged char spans of every PII match on the ORIGINAL text.

    url_credential contributes only its password group (group 2); all
    other patterns contribute their full match.  Returned spans are
    sorted, non-overlapping, non-adjacent."""
    if not text:
        return []
    raw: list[tuple[int, int]] = []
    for name, pat in _COMPILED:
        for m in pat.finditer(text):
            if name == "url_credential":
                raw.append((m.start(2), m.end(2)))
            else:
                raw.append((m.start(), m.end()))
    if not raw:
        return []
    raw.sort()
    merged = [raw[0]]
    for s0, s1 in raw[1:]:
        if s0 <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], s1))
        else:
            merged.append((s0, s1))
    return merged


def mute_spans(q, spans: list[tuple[int, int]], n_chars: int):
    """Zero the sample ranges mapped from char ``spans``; returns
    (muted int16 array, n_muted).  Exact integer char→sample law."""
    import numpy as np

    n = int(len(q))
    if n == 0 or n_chars <= 0 or not spans:
        return q.astype(np.int16), 0
    out = q.astype(np.int16).copy()
    n_muted = 0
    for c0, c1 in spans:
        s0 = (c0 * n) // n_chars
        s1 = min((c1 * n + n_chars - 1) // n_chars, n)
        if s1 > s0:
            n_muted += int(s1 - s0) - int(np.count_nonzero(out[s0:s1] == 0))
            out[s0:s1] = 0
    return out, n_muted


def _run_factory(col_idx: dict[str, int], emit_bytes: bool):
    def run(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16, encode_pcm16
        from ..functions.text import scrub_text

        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"]).to_pylist()
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            texts = batch.column(col_idx["transcript"]).to_pylist()
            out: dict[str, list] = {
                "clip_id": [], "codec": [], "n_spans": [], "n_muted": [],
                "redacted_md5": [], "redacted_transcript": [],
            }
            if emit_bytes:
                out["bytes"] = []
            for i in range(batch.num_rows):
                text = texts[i]
                spans = pii_spans(text)
                scrubbed = scrub_text(text)
                try:
                    q = _decode_i16(payloads[i], codecs[i], srs[i])
                except (ValueError, TypeError):
                    q = None
                if q is None:
                    red, n_muted, codec = payloads[i], 0, codecs[i]
                    digest = None
                else:
                    m, n_muted = mute_spans(q, spans, len(text or ""))
                    red = encode_pcm16(m.astype(np.float64) / 32767.0)
                    codec = "pcm16"
                    digest = hashlib.md5(red).hexdigest()
                out["clip_id"].append(ids[i])
                out["codec"].append(codec)
                out["n_spans"].append(len(spans))
                out["n_muted"].append(n_muted)
                out["redacted_md5"].append(digest)
                out["redacted_transcript"].append(scrubbed)
                if emit_bytes:
                    out["bytes"].append(red)
            arrays = [
                pa.array(out["clip_id"], type=pa.string()),
                pa.array(out["codec"], type=pa.string()),
                pa.array(out["n_spans"], type=pa.int32()),
                pa.array(out["n_muted"], type=pa.int64()),
                pa.array(out["redacted_md5"], type=pa.string()),
                pa.array(out["redacted_transcript"], type=pa.string()),
            ]
            names = ["clip_id", "codec", "n_spans", "n_muted",
                     "redacted_md5", "redacted_transcript"]
            if emit_bytes:
                arrays.append(pa.array(out["bytes"], type=pa.binary()))
                names.append("bytes")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return run


_STAT_FIELDS = [
    T.StructField("clip_id", T.StringType(), False),
    T.StructField("codec", T.StringType(), True),
    T.StructField("n_spans", T.IntegerType(), False),
    T.StructField("n_muted", T.LongType(), False),
    T.StructField("redacted_md5", T.StringType(), True),
    T.StructField("redacted_transcript", T.StringType(), True),
]


def redact_stats(df: DataFrame) -> DataFrame:
    """Audit relation: (clip_id, codec, n_spans, n_muted, redacted_md5,
    redacted_transcript) — payload never leaves the stage."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    return df.mapInArrow(
        _run_factory(col_idx, emit_bytes=False), T.StructType(_STAT_FIELDS)
    )


def redact_clips(df: DataFrame) -> DataFrame:
    """Full transform: the stats plus the redacted payload, for writing
    a clean silver table (undecodable clips pass through untouched)."""
    col_idx = {f.name: i for i, f in enumerate(df.schema.fields)}
    schema = T.StructType(
        _STAT_FIELDS + [T.StructField("bytes", T.BinaryType(), True)]
    )
    return df.mapInArrow(_run_factory(col_idx, emit_bytes=True), schema)
