"""Dataset datasheet ("datasheets for datasets", Gebru et al. 2021):
one structured card summarizing a clips table for its consumers.

Everything a model team asks before pulling a corpus — how many clips,
how much audio, which languages/codecs/days, how much transcript text,
how duplicated, how much visible PII — in one command, computed in two
passes (no payload decode, so the card costs metadata + transcript
scans even at 10^12 rows):

  pass 1 — ONE fused aggregate: row counts, duration mass, transcript
           char/token totals, empty-transcript count, PII hit estimate
           (the scrub chain's own patterns via regexp_count), exact
           duplicate-transcript mass via approx_count_distinct(md5)
           (±2% at any scale; the exact variant is scan_duplicates).
  pass 2 — ONE GROUPING SETS aggregate: per-codec, per-language
           (langid_pred_col, the SQL-expressible voter) and per-day
           distributions in a single shuffle instead of three.

Reference analog: the reference's health-check summary + analyze
reports (cli.py:234-360) recast as a consumer-facing card.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import PII_PATTERNS
from ..operators.docs import langid_pred_col, token_count_col

__all__ = ["datasheet", "render_markdown"]


def datasheet(df: DataFrame, text_col: str = "transcript") -> dict:
    """Structured datasheet for a clips-shaped table (needs clip_id,
    codec, dur_ms, ingest_day and a text column; missing optional
    columns are skipped)."""
    cols = set(df.columns)
    text = F.coalesce(F.col(text_col), F.lit(""))
    pii_hits = None
    if text_col in cols:
        pii_hits = sum(
            F.regexp_count(text, F.lit(p)) for _, p, _ in PII_PATTERNS
        )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.md5(text.cast("binary"))).alias(
            "approx_distinct_transcripts"
        ),
        F.count(F.when(F.length(F.trim(text)) == 0, 1)).alias(
            "n_empty_transcript"
        ),
        F.sum(F.length(text)).alias("total_chars"),
        F.sum(token_count_col(F.col(text_col))).alias("total_tokens"),
    ]
    if pii_hits is not None:
        aggs.append(F.sum(pii_hits).alias("pii_hits"))
    if "dur_ms" in cols:
        aggs += [
            F.sum("dur_ms").alias("total_dur_ms"),
            F.min("dur_ms").alias("min_dur_ms"),
            F.max("dur_ms").alias("max_dur_ms"),
        ]
    if "ingest_day" in cols:
        aggs += [
            F.min("ingest_day").alias("first_day"),
            F.max("ingest_day").alias("last_day"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()

    card: dict = {"overview": {k: (int(v) if isinstance(v, int) else v)
                               for k, v in row.items()}}
    ov = card["overview"]
    n = ov["n_rows"] or 0
    if n:
        ov["approx_duplicate_frac"] = round(
            max(0.0, 1.0 - ov["approx_distinct_transcripts"] / n), 4
        )
        if "total_dur_ms" in ov and ov["total_dur_ms"]:
            ov["total_hours"] = round(ov["total_dur_ms"] / 3_600_000, 2)

    # pass 2: all three distributions in one GROUPING SETS shuffle
    dims = []
    sel = [F.col("codec")] if "codec" in cols else []
    if "codec" in cols:
        dims.append("codec")
    if text_col in cols:
        sel.append(langid_pred_col(F.col(text_col)).alias("lang_pred"))
        dims.append("lang_pred")
    if "ingest_day" in cols:
        sel.append(F.col("ingest_day"))
        dims.append("ingest_day")
    if dims:
        proj = df.select(*sel)
        sets = ", ".join(f"({d})" for d in dims)
        grouped = proj.groupingSets(
            [[F.col(d)] for d in dims], *[F.col(d) for d in dims]
        ).agg(F.count(F.lit(1)).alias("n"))
        for d in dims:
            dist = {}
            for r in grouped.collect():
                if r[d] is not None and all(
                    r[o] is None for o in dims if o != d
                ):
                    dist[str(r[d])] = int(r["n"])
            card[f"by_{d}"] = dict(
                sorted(dist.items(), key=lambda kv: -kv[1])
            )
    return card


def render_markdown(card: dict, title: str = "Dataset datasheet") -> str:
    out = [f"# {title}\n", "\n## Overview\n"]
    for k, v in card["overview"].items():
        out.append(f"- **{k}**: {v}\n")
    for key in sorted(k for k in card if k.startswith("by_")):
        out.append(f"\n## {key[3:]} distribution\n")
        for name, n in card[key].items():
            out.append(f"- {name}: {n}\n")
    return "".join(out)
