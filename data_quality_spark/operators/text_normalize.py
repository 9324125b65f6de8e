"""Unicode text normalization (the REPAIR sibling of ``encoding_audit``).

``encoding_audit`` detects hygiene defects; this transform fixes the
fixable ones with an exact, auditable law applied in one pass:

1. newline canonicalization: ``\\r\\n`` → ``\\n``, then lone ``\\r`` →
   ``\\n`` (the CRLF/CR zoo collapses to one convention);
2. control-character strip: C0 controls except ``\\n``/``\\t``, DEL
   (0x7F), and the C1 range U+0080–U+009F are REMOVED — they carry no
   text and poison tokenizers;
3. Unicode NFC composition (``unicodedata.normalize``): decomposed
   sequences (``e`` + COMBINING ACUTE) become their canonical composed
   form, so byte-level dedup/fingerprints see one spelling.

U+FFFD replacement characters are deliberately KEPT — they mark real
upstream damage the audit should keep seeing; silently deleting them
would hide corruption, not repair it.

Two shapes (the ``normalize_gain`` pattern):
- ``normalize_stats`` — hash-checkable relation: per-doc counts of each
  repair class plus the md5 of the normalized text (differential twin
  replays the law with Python ``unicodedata``/``hashlib``);
- ``normalize_text`` — the transform view: input columns with ``text``
  replaced (NULL stays NULL — a normalizer must never invent rows).

One ``mapInArrow`` pass, zero shuffles; NFC runs in CPython's C
implementation per string, whole batch at a time.  Deterministic: the
law is a pure function of the input string.

Reference analog: the reference's repair family mutates rows in place
(fix_critical_issues.py); this is its text-encoding instance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["NORM_INJECT", "normalize_stats", "normalize_text",
           "normalize_issues", "apply_norm"]

# deterministic defect injection for clean synthetic corpora (the
# encoding_audit pattern): residues of doc_id % (4*inject_every)
NORM_INJECT = (
    (0, " cafe\u0301 expose\u0301"),   # NFC-decomposed accents
    (1, " bad\x07ctl\x9cend"),          # C0 + C1 controls
    (2, " line1\r\nline2\rline3"),      # CRLF / lone CR
    (3, " ok caf\u00e9."),              # already-NFC (must be a no-op)
)


def apply_norm(s: str) -> tuple[str, int, int, bool]:
    """The normalization law: returns (normalized, n_crlf_cr, n_ctl,
    nfc_changed).  Pure function, shared by the operator and importable
    by tests; the differential twin replays it independently."""
    import unicodedata

    s1 = s.replace("\r\n", "\n").replace("\r", "\n")
    n_cr = s.count("\r")
    kept = []
    n_ctl = 0
    for ch in s1:
        o = ord(ch)
        if (o < 32 and ch not in "\n\t") or o == 0x7F or 0x80 <= o <= 0x9F:
            n_ctl += 1
        else:
            kept.append(ch)
    s2 = "".join(kept)
    s3 = unicodedata.normalize("NFC", s2)
    return s3, n_cr, n_ctl, s3 != s2


def _injected(docs: DataFrame, inject_every: int | None) -> DataFrame:
    if not inject_every:
        return docs
    text = F.coalesce(F.col("text"), F.lit(""))
    mod = 4 * inject_every
    out = text
    for res, s in NORM_INJECT:
        out = F.when(
            F.col("doc_id") % mod == res * inject_every,
            F.concat(text, F.lit(s)),
        ).otherwise(out)
    return docs.withColumn("text", out)


def normalize_stats(
    docs: DataFrame, inject_every: int | None = None
) -> DataFrame:
    """(doc_id, n_in, n_out, n_cr, n_ctl, nfc_changed, changed,
    norm_md5) — exact integers + the md5 of the normalized text."""
    df = _injected(docs, inject_every).select("doc_id", "text")
    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_in", T.IntegerType(), False),
        T.StructField("n_out", T.IntegerType(), False),
        T.StructField("n_cr", T.IntegerType(), False),
        T.StructField("n_ctl", T.IntegerType(), False),
        T.StructField("nfc_changed", T.BooleanType(), False),
        T.StructField("changed", T.BooleanType(), False),
        T.StructField("norm_md5", T.StringType(), False),
    ])

    def run(batches):
        import hashlib

        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            cols = {k: [] for k in ("n_in", "n_out", "n_cr", "n_ctl",
                                    "nfc_changed", "changed", "norm_md5")}
            for t in texts:
                s = t or ""
                s3, n_cr, n_ctl, nfc = apply_norm(s)
                cols["n_in"].append(len(s))
                cols["n_out"].append(len(s3))
                cols["n_cr"].append(n_cr)
                cols["n_ctl"].append(n_ctl)
                cols["nfc_changed"].append(nfc)
                cols["changed"].append(s3 != s)
                cols["norm_md5"].append(
                    hashlib.md5(s3.encode("utf-8")).hexdigest())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()),
                 pa.array(cols["n_in"], type=pa.int32()),
                 pa.array(cols["n_out"], type=pa.int32()),
                 pa.array(cols["n_cr"], type=pa.int32()),
                 pa.array(cols["n_ctl"], type=pa.int32()),
                 pa.array(cols["nfc_changed"], type=pa.bool_()),
                 pa.array(cols["changed"], type=pa.bool_()),
                 pa.array(cols["norm_md5"], type=pa.string())],
                names=[f.name for f in out_schema.fields],
            )

    return df.mapInArrow(run, out_schema)


def normalize_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Transform view: every column preserved, ``text`` replaced by its
    normalized form; NULL text stays NULL."""
    cols = docs.columns
    idx = cols.index(text_col)
    out_schema = docs.schema

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            texts = batch.column(idx).to_pylist()
            normed = [None if t is None else apply_norm(t)[0]
                      for t in texts]
            arrays = [batch.column(i) if i != idx
                      else pa.array(normed, type=pa.string())
                      for i in range(batch.num_columns)]
            yield pa.RecordBatch.from_arrays(arrays, names=cols)

    return docs.mapInArrow(run, out_schema)


def normalize_issues(stats: DataFrame, table: str = "documents") -> DataFrame:
    """Issue relation over ``normalize_stats`` (reference issue schema,
    ONE fused aggregate): how much repair the corpus needs, per class."""
    wide = stats.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("n_cr") > 0, 1)).alias("n:crlf_newlines"),
        F.count(F.when(F.col("n_ctl") > 0, 1)).alias("n:control_chars"),
        F.count(F.when(F.col("nfc_changed"), 1)).alias("n:nfc_decomposed"),
        F.count(F.when(F.col("changed"), 1)).alias("n:needs_normalization"),
    )
    rules = [
        ("crlf_newlines", "info", "carriage returns present (CRLF/CR zoo)"),
        ("control_chars", "warning",
         "C0/C1 control characters present (tokenizer poison)"),
        ("nfc_decomposed", "warning",
         "NFC-decomposed sequences present (dedup sees two spellings)"),
        ("needs_normalization", "info",
         "any repair class applies (transform would change the text)"),
    ]
    structs = []
    for name, sev, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit("text").alias("column"),
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
