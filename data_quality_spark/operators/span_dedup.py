"""Exact-substring span dedup: find and remove every >= ``k``-token span
that occurs more than once ANYWHERE in the corpus (within-doc repeats
included), per Lee et al. 2021 "Deduplicating Training Data Makes Language
Models Better" (ExactSubstr).  The published implementation builds a
suffix array over the concatenated corpus; that is a single-machine
formulation.  Re-derived here as a Catalyst relation:

1. token k-gram starts per doc (array HOFs, map-side only);
2. ONE gram-keyed aggregate for the duplicated-gram lexicon
   (``count(*) >= min_count`` over total occurrences — a within-doc repeat
   is a duplicate, matching the suffix-array semantics);
3. a semi-join marks duplicated gram starts, and a per-doc window merge
   (gaps-and-islands over the running max of ``pos + k``) turns
   overlapping [pos, pos+k) intervals into maximal spans — exactly the
   maximal duplicated substrings the suffix array would emit, quantized
   to token boundaries;
4. an order-exact rebuild drops covered tokens (two-arg ``filter`` lambda
   over the token array against the doc's merged span list).

Scale notes
-----------
- The only corpus-wide shuffle carries (gram-key, 1) pairs with map-side
  partial counts; with ``hash_grams=True`` (default) the key is the 8-byte
  ``xxhash64`` of the gram, never document text.  At 10^12-token scale the
  lexicon shuffle is the same shape as ``fingerprint_dedup``.
- The start-marking semi-join is gram-keyed; duplicated grams are a small
  fraction of all grams in a healthy corpus, and AQE may broadcast the
  lexicon when it fits.
- Span merge + rebuild shuffle only (doc_id, pos) rows for docs that have
  at least one duplicated gram; clean docs never enter the window stage.
- Per-doc work in the rebuild is O(n_tokens * n_spans) array arithmetic
  inside whole-stage codegen; documents are bounded, so no skew risk
  beyond the gram lexicon itself (bound pathological grams with
  ``min_count`` and ``max_gram_docs``).

Reference analog: none (the reference validates, never repairs text); the
nearest reference shape is its duplicate scan
(``/root/reference/src/data_quality/checks.py`` duplicate family), widened
from whole-row identity to sub-document token spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "duplicated_gram_starts",
    "duplicated_spans",
    "span_dedup_stats",
    "remove_duplicated_spans",
]


def _token_array(text_col: str) -> Column:
    """Whitespace token array; NULL/blank -> empty.  Twin of the SQL
    ``regexp_split_to_array(trim(text), '\\s+')`` (empty-string guard
    included, since Spark's split('') yields [''])."""
    t = F.trim(F.col(text_col))
    return F.when(
        F.col(text_col).isNull() | (F.length(t) == F.lit(0)),
        F.array().cast("array<string>"),
    ).otherwise(F.split(t, r"\s+"))


def _gram_key(gram: Column, hash_grams: bool) -> Column:
    return F.xxhash64(gram) if hash_grams else gram


def duplicated_gram_starts(
    docs: DataFrame,
    k: int = 15,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """(__id, pos) rows: every token position whose k-gram occurs
    ``>= min_count`` times corpus-wide.  ``max_gram_docs`` optionally drops
    degenerate grams (e.g. a filler phrase in millions of docs) from span
    formation — the boilerplate-lexicon operators own that regime."""
    if k < 1:
        raise ValueError("k must be >= 1")
    arr = _token_array(text_col)
    grams = docs.select(
        F.col(id_col).alias("__id"), arr.alias("__arr")
    ).select(
        "__id",
        F.posexplode(
            F.when(
                F.size("__arr") >= F.lit(k),
                F.transform(
                    F.sequence(F.lit(0), F.size("__arr") - F.lit(k)),
                    lambda i: F.array_join(F.slice("__arr", i + 1, k), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pos", "gram"),
    ).select("__id", "pos", _gram_key(F.col("gram"), hash_grams).alias("__g"))
    agg = [F.count(F.lit(1)).alias("__n")]
    if max_gram_docs is not None:
        agg.append(F.count_distinct("__id").alias("__nd"))
    lex = grams.groupBy("__g").agg(*agg).where(F.col("__n") >= F.lit(min_count))
    if max_gram_docs is not None:
        lex = lex.where(F.col("__nd") <= F.lit(max_gram_docs))
    return grams.join(lex.select("__g"), "__g", "left_semi").select("__id", "pos")


def duplicated_spans(
    docs: DataFrame,
    k: int = 15,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Maximal duplicated token spans per doc: (__id, start, end) with the
    half-open token interval [start, end).  Overlapping / contiguous
    duplicated k-gram windows merge (gaps-and-islands on the running max
    of ``pos + k``)."""
    starts = duplicated_gram_starts(
        docs, k, min_count, id_col, text_col, hash_grams, max_gram_docs
    )
    w = Window.partitionBy("__id").orderBy("pos")
    run_end = F.max(F.col("pos") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = starts.withColumn(
        "__new",
        F.when(run_end.isNull() | (F.col("pos") > run_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "__span",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("__id", "__span").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + F.lit(k)).alias("end"),
    ).select("__id", "start", "end")


def _with_spans(
    docs: DataFrame,
    k: int,
    min_count: int,
    id_col: str,
    text_col: str,
    hash_grams: bool,
    max_gram_docs: int | None,
) -> DataFrame:
    """docs + (__arr, __spans sorted struct array, kept-token rebuild)."""
    spans = duplicated_spans(
        docs, k, min_count, id_col, text_col, hash_grams, max_gram_docs
    )
    per_doc = spans.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("__n_spans"),
        F.sum(F.col("end") - F.col("start")).cast("long").alias("__dup_tokens"),
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("__spans"),
    )
    base = docs.withColumn("__arr", _token_array(text_col))
    joined = base.join(
        per_doc, base[id_col] == per_doc["__id"], "left"
    ).drop("__id")
    sp = F.coalesce(
        F.col("__spans"),
        F.array().cast("array<struct<start:int,end:int>>"),
    )
    kept = F.filter(
        F.col("__arr"),
        lambda tok, i: ~F.exists(
            sp, lambda s: (s["start"] <= i) & (i < s["end"])
        ),
    )
    return joined.withColumn("__clean", F.array_join(kept, " "))


def span_dedup_stats(
    docs: DataFrame,
    k: int = 15,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Per-doc duplicated-span report: (id, total_tokens, n_spans,
    dup_tokens, dup_frac, clean_md5).  ``clean_md5`` is the portable md5
    of the span-removed text (NULL text stays NULL), so the rebuild itself
    is hash-checkable across engines."""
    j = _with_spans(docs, k, min_count, id_col, text_col, hash_grams, max_gram_docs)
    total = F.size("__arr").cast("long")
    dup = F.coalesce(F.col("__dup_tokens"), F.lit(0)).cast("long")
    return j.select(
        F.col(id_col),
        total.alias("total_tokens"),
        F.coalesce(F.col("__n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        dup.alias("dup_tokens"),
        F.when(total > 0, dup / total).otherwise(F.lit(0.0)).alias("dup_frac"),
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.md5(F.col("__clean").cast("binary")))
        .alias("clean_md5"),
    )


def remove_duplicated_spans(
    docs: DataFrame,
    k: int = 15,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = True,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """The TRANSFORM: input columns with ``text`` replaced by the
    span-removed rebuild (token-joined with single spaces), plus
    ``n_spans_removed`` / ``n_tokens_removed``.  NULL text passes through
    NULL."""
    j = _with_spans(docs, k, min_count, id_col, text_col, hash_grams, max_gram_docs)
    out_cols = [c for c in docs.columns if c != text_col]
    return j.select(
        *out_cols,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .otherwise(F.col("__clean"))
        .alias(text_col),
        F.coalesce(F.col("__n_spans"), F.lit(0)).cast("int").alias("n_spans_removed"),
        F.coalesce(F.col("__dup_tokens"), F.lit(0))
        .cast("int")
        .alias("n_tokens_removed"),
    )
