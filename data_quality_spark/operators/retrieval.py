"""Sparse text retrieval: BM25 top-k over a document corpus.

The missing member of the similarity-search family (dense ANN paths:
``similarity.cosine_topk`` brute / LSH / IVF / PQ) — the SPARSE path a
curation pipeline uses for eval-set leakage probes, boilerplate hunting,
and "find the documents about X" audits without embeddings.  Okapi BM25
in Lucene's formulation:

    score(q, d) = Σ_{t ∈ q}  idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    idf(t)      = ln(1 + (N − df + 0.5)/(df + 0.5))

Scale shape (the point of the design): the corpus NEVER shuffles.

- Query terms are a driver-side set (queries are human-sized);
  ``array_intersect`` against the broadcast term array filters each
  document to its matching terms BEFORE anything explodes, so only
  (doc, matched-term, tf) rows — a sparse sliver of the corpus — leave
  the scan.  A 10^12-doc corpus pays one column scan; the exchange
  carries only postings that hit a query term.
- Corpus constants N and Σdl ride the SAME scan via ``observe()`` (the
  runner's one-action law), so document frequencies, N, and avgdl all
  come out of one pass over the matched sliver + one metric observation.
- idf is computed DRIVER-side from the collected (term, df) sliver
  (≤ |query terms| rows) — the DSIR "driver-learned literals" pattern —
  and rejoined as a broadcast relation.
- Per-term contributions are fixed-point-quantized (floor(x·2^20 + 0.5))
  so the per-(query, doc) score is an EXACT INTEGER sum: order-free,
  bit-stable across engines and shuffle layouts.  Every float op before
  the quantization is an element-wise IEEE chain (no reduction), hence
  bit-identical in any engine evaluating the same expression tree; the
  DuckDB twin re-derives N/avgdl/df/idf from scratch in SQL.
- Top-k per query is a rank window Spark 4 executes as
  ``WindowGroupLimit`` (per-partition partial top-k before the exchange).

Reference analog: none — extends SURVEY §2's similarity-search family
from dense embeddings to sparse lexical retrieval.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "bm25_topk", "bm25_idf", "IDF_SCALE", "query_terms",
    "tfidf_top_terms",
]

# fixed-point scale for per-term score contributions: 2^20.  idf ≤ ln(N)
# ≈ 28 at 10^12 docs → idf_fx ≤ 3·10^7; tf-weight ≤ k1+1; per-term
# contribution < 2^27, so even a 2^36-term query stays inside int64.
IDF_SCALE = 1 << 20


def _tokens_col(text_col: str):
    """The corpus token law shared with docs.py / corpus_overlap.py:
    lowercase, trim, split on runs of whitespace; NULL/blank → empty."""
    t = F.trim(F.lower(F.col(text_col)))
    return F.when(
        F.col(text_col).isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))


def query_terms(queries: dict[str, str]) -> list[tuple[str, str]]:
    """(q_id, term) rows with the SAME token law as the corpus side,
    deduplicated per query (BM25 treats the query as a term set)."""
    rows = []
    for q_id in sorted(queries):
        toks = sorted(set(queries[q_id].strip().lower().split()))
        rows.extend((q_id, t) for t in toks if t)
    return rows


def bm25_idf(n_docs: int, df: int) -> int:
    """Lucene BM25 idf, fixed-point-quantized to ``IDF_SCALE``.
    ``math.log`` and libm ``ln`` are correctly rounded on this target,
    so the DuckDB twin's ``ln`` lands on the same double."""
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return int(math.floor(idf * IDF_SCALE + 0.5))


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    materialize: bool = True,
) -> DataFrame:
    """BM25 top-k documents per query.

    Returns (q_id, rank, doc_id, score_fx) where ``score_fx`` is the
    integer fixed-point score (true score · 2^20, per-term-floored) —
    exact, order-free, and therefore hash-stable.  Ties break on doc id.

    One corpus scan total: the matched sliver is persisted; N and Σdl
    are observed on the same pass; df/idf come from the sliver.

    ``materialize=False`` returns the lazy scoring relation (for plan
    inspection) and leaves the matched sliver cached for its consumers.
    """
    qrows = query_terms(queries)
    terms = sorted({t for _, t in qrows})
    if not terms:
        raise ValueError("queries contain no terms")
    spark = docs.sparkSession

    toks = _tokens_col(text_col)
    obs = Observation()
    base = (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .withColumn("__dl", F.size("__toks"))
        .observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("__dl"), F.lit(0)).alias("sum_dl"),
        )
    )
    term_arr = F.array(*[F.lit(t) for t in terms])
    matched = (
        base.select(
            id_col,
            "__dl",
            "__toks",
            F.explode(F.array_intersect("__toks", term_arr)).alias("term"),
        )
        .withColumn(
            "tf", F.size(F.filter("__toks", lambda x: x == F.col("term")))
        )
        .drop("__toks")
        .persist()
    )
    matched.count()  # one action: populates the observation too
    n_docs = int(obs.get["n"])
    sum_dl = int(obs.get["sum_dl"])
    if n_docs == 0:
        matched.unpersist()
        return spark.createDataFrame(
            [],
            T.StructType([
                T.StructField("q_id", T.StringType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField(id_col, docs.schema[id_col].dataType),
                T.StructField("score_fx", T.LongType()),
            ]),
        )
    avgdl = sum_dl / n_docs  # exact IEEE division of int-valued doubles

    dfrel = {r["term"]: r["df"] for r in
             matched.groupBy("term").agg(F.count(F.lit(1)).alias("df")).collect()}
    qrel = [
        (q_id, t, bm25_idf(n_docs, dfrel[t]))
        for q_id, t in qrows
        if t in dfrel
    ]
    if not qrel:
        matched.unpersist()
        return spark.createDataFrame(
            [],
            T.StructType([
                T.StructField("q_id", T.StringType()),
                T.StructField("rank", T.IntegerType()),
                T.StructField(id_col, docs.schema[id_col].dataType),
                T.StructField("score_fx", T.LongType()),
            ]),
        )
    qdf = spark.createDataFrame(qrel, "q_id string, term string, idf_fx long")

    # element-wise IEEE chain — parenthesization mirrored in the twin
    tfw = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + (F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * (F.col("__dl") / F.lit(avgdl)))))
    )
    contrib = F.floor(F.col("idf_fx") * tfw + F.lit(0.5)).cast("long")
    scored = (
        matched.join(F.broadcast(qdf), "term")
        .groupBy("q_id", id_col)
        .agg(F.sum(contrib).alias("score_fx"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("score_fx").desc(), F.col(id_col)
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, "score_fx")
        .orderBy("q_id", "rank")
    )
    if not materialize:
        return out
    # materialize before unpersisting the sliver the plan reads from
    out = out.localCheckpoint(eager=True)
    matched.unpersist()
    return out


def tfidf_top_terms(
    docs: DataFrame,
    group_col: str = "source",
    top: int = 5,
    group_count: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Characteristic vocabulary per corpus slice: tf-idf over groups as
    superdocuments — the per-domain keyword-signature report a curation
    pipeline uses to see what each source is actually made of.

    Law (exact integers end to end, so hash-stable with NO float ever
    computed on an executor):

        tf(t, g)   = occurrences of t in group g
        g_t        = number of groups containing t
        idf_fx(g_t)= floor(ln(G / g_t) · 2^20 + 0.5)   — G = group count
        score_fx   = tf · idf_fx                        — integer product

    g_t has at most G distinct values, so the idf table is a broadcast
    literal map learned driver-side (math.log) — the BM25/DSIR pattern.
    Terms present in EVERY group score 0 (ln 1) and are ranked out.

    Scale shape: one explode + one (group, term) HashAggregate with
    map-side partials (the exchange carries the compacted per-partition
    vocabulary, never raw tokens), one tiny term-keyed aggregate for
    g_t, and WindowGroupLimit top-k per group.  ``group_count`` skips
    the exact countDistinct when the caller already knows G.
    """
    import math

    toks = _tokens_col(text_col)
    exploded = docs.select(
        F.col(group_col).alias("grp"), F.explode(toks).alias("term")
    )
    tf = exploded.groupBy("grp", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    if group_count is None:
        group_count = docs.select(group_col).distinct().count()
    if group_count <= 0:
        raise ValueError("no groups")
    idf_fx = {
        g: int(math.floor(math.log(group_count / g) * IDF_SCALE + 0.5))
        for g in range(1, group_count + 1)
    }
    gt = tf.groupBy("term").agg(F.count(F.lit(1)).cast("int").alias("g_t"))
    idf_map = F.create_map(
        *[F.lit(x) for g in sorted(idf_fx) for x in (g, idf_fx[g])]
    )
    scored = (
        tf.join(gt, "term")
        .withColumn("score_fx", F.col("tf") * idf_map[F.col("g_t")])
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("score_fx").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= top) & (F.col("score_fx") > 0))
        .select(
            F.col("grp").alias(group_col), "rank", "term", "tf", "score_fx"
        )
        .orderBy(group_col, "rank")
    )
