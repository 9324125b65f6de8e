"""Pre-decode payload triage: declared codec vs byte-level evidence.

The gate's ``decode_failed`` rule (pipeline.py DROP_RULES) tells you a
clip did not decode — it cannot tell you WHY, and it only finds out after
paying the Arrow hop and the decode kernel.  This operator classifies
every payload from bytes alone — container magic, RIFF header fields,
exact-integer length grids — entirely in Catalyst expressions: zero
Python, zero decode, zero shuffle until the final tiny rollup.  At
10^12-clip scale it is the cheap first pass that (a) routes obviously
bad payloads away from the expensive ``mapInArrow`` decode stage and
(b) produces the (declared codec × evidence class) confusion relation an
ingest owner debugs from — the reference reports WHAT failed per rule
(``validators.py`` issue relations, severity per rule); this gives the
same relation for the byte layer, pre-decode.

Evidence ladder (first match wins; a later test never sees bytes the
earlier tests rejected, so short CASE branches make every byte access
safe):

- ``empty_payload``  critical — NULL or zero-length bytes.
- ``codec_unknown``  critical — declared codec outside {pcm16,mulaw,wav}.
- ``sr_invalid``     critical — declared sample rate NULL, <= 0, > 384 kHz.
- wav: ``bad_container`` (no RIFF/WAVE or < 44 bytes, e.g. truncation),
  ``noncanonical_wav`` (RIFF but not the minimal fmt@12/data@36 layout a
  compliant mono-16-bit writer emits — the triage cannot certify it,
  the chunk-walk decoder owns it), ``unsupported_wav`` (fmt tag,
  channels or bit depth the mono-16-bit decoder rejects),
  ``header_sr_mismatch`` (header LE uint32 sr != declared ``sr_hz``),
  ``length_mismatch`` (data-chunk sample count off the declared
  duration grid).
- pcm16/mulaw: ``container_in_raw`` (payload IS a RIFF container but the
  codec column says raw — decode would reinterpret the header bytes as
  samples and SUCCEED with garbage), ``odd_length`` (pcm16 byte count
  not sample-aligned — decode silently drops the trailing byte),
  ``length_mismatch``, else ``ok``.

Length-grid law (exact integers, dialect-portable): expected samples
``n_exp = floor((dur_ms * sr_hz + 500) / 1000)``; a payload is on-grid
when ``|samples - n_exp| <= ceil(sr_hz / 1000)`` (one millisecond of
slack absorbs the encoder's ``int(sr * dur_s)`` vs the stored rounded
``dur_ms``).  A duration overstated 1.5x (the seeded dur_mismatch
defect) sits hundreds of samples off-grid — the classes separate
cleanly, nothing is tuned.

Severity mirrors the gate's DROP_RULES: container/format/sr evidence
that makes decode raise is critical; evidence decode survives but
mis-measures (wrong duration, dropped trailing byte, layout the triage
cannot certify) is warning; ``ok`` is info.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sniff_payloads", "payload_confusion", "PAYLOAD_CLASS_SEVERITY"]

# evidence class -> severity (gate DROP_RULES convention: critical =
# decode raises / rule hard-fails, warning = decodes but lies, info = ok)
PAYLOAD_CLASS_SEVERITY: dict[str, str] = {
    "empty_payload": "critical",
    "codec_unknown": "critical",
    "sr_invalid": "critical",
    "bad_container": "critical",
    "unsupported_wav": "critical",
    "header_sr_mismatch": "critical",
    "container_in_raw": "critical",
    "noncanonical_wav": "warning",
    "odd_length": "warning",
    "length_mismatch": "warning",
    "ok": "info",
}

# RIFF header hex constants (F.hex emits uppercase)
_RIFF = "52494646"  # b"RIFF"
_WAVE = "57415645"  # b"WAVE"
_FMT = "666D7420"  # b"fmt "
_DATA = "64617461"  # b"data"


def _byte(col: Column, pos: int) -> Column:
    """Unsigned value of the byte at 1-based ``pos`` (long)."""
    return F.conv(F.hex(F.substring(col, pos, 1)), 16, 10).cast("long")


def _le(col: Column, pos: int, width: int) -> Column:
    """Little-endian unsigned integer of ``width`` bytes at ``pos``."""
    out = _byte(col, pos)
    for k in range(1, width):
        out = out + _byte(col, pos + k) * F.lit(256**k)
    return out


def _hex_at(col: Column, pos: int) -> Column:
    return F.hex(F.substring(col, pos, 4))


def sniff_payloads(
    df: DataFrame,
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Add ``payload_class`` / ``payload_severity`` from byte evidence.

    Pure Column expressions (whole-stage codegen; no Python, no decode).
    The CASE ladder is strictly ordered, so header-field reads only
    execute on rows already proven >= 44 bytes with RIFF/WAVE magic.
    """
    b = F.col(bytes_col)
    blen = F.octet_length(b).cast("long")
    sr = F.col(sr_col).cast("long")
    dur = F.col(dur_col).cast("long")

    n_exp = F.floor((dur * sr + F.lit(500)) / F.lit(1000)).cast("long")
    slack = F.ceil(sr / F.lit(1000)).cast("long")

    def off_grid(samples: Column) -> Column:
        return F.abs(samples - n_exp) > slack

    is_riff = (
        (blen >= 12)
        & (_hex_at(b, 1) == _RIFF)
        & (_hex_at(b, 9) == _WAVE)
    )
    # canonical minimal mono writer layout: fmt(16) at byte 12 (pos 13),
    # data chunk at byte 36 (pos 37), data size covering the remainder
    # (+1 for a spec pad byte)
    fmt_size = _le(b, 17, 4)
    dsize = _le(b, 41, 4)
    canonical = (
        (_hex_at(b, 13) == _FMT)
        & (fmt_size == 16)
        & (_hex_at(b, 37) == _DATA)
        & (blen >= dsize + 44)
        & (blen <= dsize + 45)
    )
    fmt_code = _le(b, 21, 2)
    channels = _le(b, 23, 2)
    bits = _le(b, 35, 2)
    hdr_sr = _le(b, 25, 4)

    wav_class = (
        F.when(~is_riff | (blen < 44), F.lit("bad_container"))
        .when(~canonical, F.lit("noncanonical_wav"))
        .when(
            (fmt_code != 1) | (channels != 1) | (bits != 16),
            F.lit("unsupported_wav"),
        )
        .when(hdr_sr != sr, F.lit("header_sr_mismatch"))
        .when(off_grid(F.floor(dsize / F.lit(2)).cast("long")),
              F.lit("length_mismatch"))
        .otherwise(F.lit("ok"))
    )
    pcm_class = (
        F.when(is_riff, F.lit("container_in_raw"))
        .when(blen % 2 != 0, F.lit("odd_length"))
        .when(off_grid(F.floor(blen / F.lit(2)).cast("long")),
              F.lit("length_mismatch"))
        .otherwise(F.lit("ok"))
    )
    mulaw_class = (
        F.when(is_riff, F.lit("container_in_raw"))
        .when(off_grid(blen), F.lit("length_mismatch"))
        .otherwise(F.lit("ok"))
    )

    cls = (
        F.when(b.isNull() | (blen == 0), F.lit("empty_payload"))
        .when(
            ~F.col(codec_col).isin("pcm16", "mulaw", "wav")
            | F.col(codec_col).isNull(),
            F.lit("codec_unknown"),
        )
        .when(sr.isNull() | (sr <= 0) | (sr > 384000), F.lit("sr_invalid"))
        .when(F.col(codec_col) == "wav", wav_class)
        .when(F.col(codec_col) == "pcm16", pcm_class)
        .otherwise(mulaw_class)
    )
    sev = F.lit(None).cast("string")
    for name in reversed(list(PAYLOAD_CLASS_SEVERITY)):
        sev = F.when(cls == name, F.lit(PAYLOAD_CLASS_SEVERITY[name])) \
            .otherwise(sev)
    return df.withColumn("payload_class", cls).withColumn(
        "payload_severity", sev
    )


def payload_confusion(
    df: DataFrame,
    id_col: str = "clip_id",
    codec_col: str = "codec",
    **kw,
) -> DataFrame:
    """(declared codec x evidence class) confusion rollup.

    One narrow projection (id, codec, class, severity) feeds a tiny
    groupBy — at 10^12 rows the map-side partial aggregate reduces each
    task to at most |codecs| x |classes| rows before the one exchange.
    ``example_clip`` = min id per cell keeps the relation debuggable and
    deterministic.
    """
    sniffed = sniff_payloads(df, codec_col=codec_col, **kw)
    return (
        sniffed.groupBy(
            F.col(codec_col).alias("codec"),
            "payload_class",
            "payload_severity",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min(id_col).alias("example_clip"),
        )
        .orderBy("codec", "payload_class")
    )
