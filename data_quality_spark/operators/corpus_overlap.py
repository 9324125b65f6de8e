"""Cross-corpus overlap estimation by bottom-k shingle sketches.

The corpus-pair question every crawl-curation pipeline asks before
merging sources ("how much of snapshot B is already in A?") answered
WITHOUT comparing documents: a bottom-k sketch — the k smallest
distinct xxhash64 values over each corpus's word-n-gram shingles — is
a uniform sample of the shingle space, so

    Ĵ(A, B)   = |S ∩ Â ∩ B̂| / k          (Jaccard),
    Ĉ(B in A) = |S ∩ Â ∩ B̂| / |S ∩ B̂|   (containment of B in A),

where S is the k smallest of the UNION (computable from the two
sketches alone: the union's bottom-k is a subset of the sketches'
union).  Standard KMV/bottom-k estimator (Bar-Yossef et al. 2002;
Broder 1997 resemblance) with RMSE ≈ 1/√k.

Scale shape (the whole point): each corpus reduces to k int64s —
shingles are hashed JVM-side (``xxhash64``), distinct is ONE shuffle,
and the per-corpus bottom-k runs as Spark 4's ``WindowGroupLimit``
(partial top-k per partition, the exchange carries ≤ k rows per
partition).  Corpus-pair comparison is then O(k) regardless of corpus
size — 10^12 docs vs 10^12 docs costs two scans and 2k rows.  The
exact Jaccard (one groupBy over all distinct shingle hashes) is
computed only as the accuracy-as-data companion at test scale, the
same pattern as ``ann_recall`` / ``lsh_tuning``.

Reference analog: none — extends the dedup family (SURVEY §2) from
row-level to corpus-level overlap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["shingle_hashes", "corpus_sketch", "merge_sketches",
           "corpus_overlap"]

OVERLAP_K = 256      # sketch size: RMSE ≈ 1/16
SHINGLE_N = 3        # word n-gram shingle width


def shingle_hashes(
    df: DataFrame,
    corpus_col: str = "corpus",
    text_col: str = "text",
    n: int = SHINGLE_N,
) -> DataFrame:
    """(corpus, h): xxhash64 of every word n-gram shingle, JVM-side.
    Documents shorter than ``n`` tokens contribute their whole-text
    token join as one shingle (so tiny docs still count)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    shingles = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.col(corpus_col).alias("corpus"),
                F.explode(shingles).alias("shingle"))
        .select("corpus", F.xxhash64("shingle").alias("h"))
    )


def corpus_sketch(hashes: DataFrame, k: int = OVERLAP_K) -> DataFrame:
    """(corpus, h) bottom-k distinct hashes per corpus — ONE distinct
    shuffle, then a rank-k window Spark executes as WindowGroupLimit
    (per-partition partial top-k before the exchange)."""
    w = Window.partitionBy("corpus").orderBy("h")
    return (
        hashes.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def merge_sketches(sketches: list, k: int = OVERLAP_K) -> DataFrame:
    """Fold per-increment sketches (e.g. one per ingest day) into the
    corpus sketch WITHOUT rescanning: the k smallest of a union are
    always among the increments' own bottom-k sets, so re-ranking the
    unioned sketch rows is exact — the mergeable-summary property that
    makes daily updates O(days·k) at any corpus size."""
    from functools import reduce

    merged = reduce(lambda a, b: a.unionByName(b), sketches).distinct()
    return corpus_sketch(merged, k)


def corpus_overlap(
    df: DataFrame,
    corpus_col: str = "corpus",
    text_col: str = "text",
    k: int = OVERLAP_K,
    n: int = SHINGLE_N,
    with_exact: bool = False,
) -> DataFrame:
    """One row per unordered corpus pair: sketch-estimated Jaccard and
    both containments, plus (``with_exact=True``, test-scale only) the
    exact shingle Jaccard and the estimate's absolute error."""
    hashes = shingle_hashes(df, corpus_col, text_col, n)
    if with_exact:
        # the exact companion re-reads the full hash relation (corpus
        # names + the all-shingle groupBy) — cache it so the corpus is
        # shingled once.  Test-scale only: the sketch-only path never
        # materializes the hash relation.
        hashes = hashes.cache()
    sk = corpus_sketch(hashes, k).cache()
    a = sk.select(F.col("corpus").alias("ca"), "h")
    b = sk.select(F.col("corpus").alias("cb"), "h")
    # per unordered pair: the union's bottom-k is contained in the two
    # sketches' union, so rank the merged distinct hash set per pair,
    # flagged by sketch membership
    pairs = (
        sk.select(F.col("corpus").alias("ca")).distinct()
        .join(sk.select(F.col("corpus").alias("cb")).distinct(),
              F.col("ca") < F.col("cb"))
    )
    ha = pairs.join(a, ["ca"]).select("ca", "cb", "h",
                                      F.lit(1).alias("in_a"),
                                      F.lit(0).alias("in_b"))
    hb = pairs.join(b, ["cb"]).select("ca", "cb", "h",
                                      F.lit(0).alias("in_a"),
                                      F.lit(1).alias("in_b"))
    both = (
        ha.unionByName(hb)
        .groupBy("ca", "cb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ca", "cb").orderBy("h")
    s = both.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k)
    est = s.groupBy("ca", "cb").agg(
        F.count(F.lit(1)).alias("union_k"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("inter_k"),
        F.sum("in_a").alias("a_k"),
        F.sum("in_b").alias("b_k"),
    )

    def ratio(num, den):
        # zero-guarded (repo division convention): a corpus pair whose
        # union bottom-k holds none of one side's hashes has defined
        # containment 0.0, and ANSI mode must not fail the job
        return F.round(
            F.when(F.col(den) > 0, F.col(num) / F.col(den))
            .otherwise(F.lit(0.0)), 6)

    est = est.select(
        "ca", "cb", F.lit(k).alias("k"), "union_k", "inter_k",
        ratio("inter_k", "union_k").alias("jaccard_est_r"),
        ratio("inter_k", "b_k").alias("contain_b_in_a_r"),
        ratio("inter_k", "a_k").alias("contain_a_in_b_r"),
    )
    if not with_exact:
        return est.orderBy("ca", "cb")
    # accuracy-as-data companion: exact shingle Jaccard (full distinct
    # groupBy — test scale only; at 10^12 rows only the sketch runs)
    # columns are INDEXED (in_0, in_1, ...), never derived from corpus
    # VALUES — a corpus named 'cc.2024-08' would otherwise parse as a
    # struct accessor in F.col
    cs = sorted(r.corpus for r in
                hashes.select("corpus").distinct().collect())
    flags = (
        hashes.groupBy("h")
        .agg(*[F.max(F.when(F.col("corpus") == c, 1).otherwise(0))
               .alias(f"in_{i}")
               for i, c in enumerate(cs)])
    )
    rows = []
    for i, c1 in enumerate(cs):
        for j in range(i + 1, len(cs)):
            c2 = cs[j]
            rows.append(
                flags.agg(
                    F.sum(F.col(f"in_{i}") * F.col(f"in_{j}"))
                    .alias("inter"),
                    F.sum(F.greatest(F.col(f"in_{i}"), F.col(f"in_{j}")))
                    .alias("union"),
                ).select(
                    F.lit(c1).alias("ca"), F.lit(c2).alias("cb"),
                    F.round(F.col("inter") / F.col("union"), 6)
                    .alias("jaccard_exact_r"),
                )
            )
    exact = rows[0]
    for r in rows[1:]:
        exact = exact.unionByName(r)
    return (
        est.join(exact, ["ca", "cb"])
        .withColumn(
            "abs_err_r",
            F.round(F.abs(F.col("jaccard_est_r")
                          - F.col("jaccard_exact_r")), 6),
        )
        .orderBy("ca", "cb")
    )
