"""Similarity search over embedding columns: brute-force cosine top-k plus
two approximate scale paths (SRP-LSH buckets and IVF inverted lists).

No reference analog (the reference handles only DBMS scalars); this is the
training-pipeline capability layer over ``array<float>`` columns.

Scale shape:

- ``cosine_topk`` — the exact baseline.  The query set is broadcast (it is
  small by construction); each executor scores its partition of the corpus
  locally, then a partial top-k per partition feeds one tiny final top-k
  shuffle (window over ≤ #queries × #partitions × k rows after AQE).  Linear
  scan, no quadratic blow-up, no data movement of the corpus.
- ``hyperplane_lsh_topk`` — sign-of-projection bucketing (Charikar 2002
  SRP-LSH): deterministic hyperplanes → bit bucket; queries only score
  candidates in their bucket.  The corpus shuffles once on the bucket id;
  no training pass needed.
- ``fit_ivf_centroids`` / ``ivf_topk`` — the inverted-file family (Jégou et
  al. PAMI'11): a spherical k-means coarse quantizer fit on a bounded
  deterministic sample, corpus shuffled once on its list id, queries
  probing their ``nprobe`` nearest lists.  Better recall/cost control than
  SRP when the corpus is clustered, at the price of a training pass.

All scoring dot products run in float64 inside Catalyst higher-order
functions (``zip_with`` + ``aggregate``) — sequential index-order folds, so
scores are bit-stable across partitionings (bucketing/assignment uses
vectorized numpy where a training pass is already numpy-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf resolves stringized hints here

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "dot64",
    "norm64",
    "cosine_topk",
    "cosine_near_pairs",
    "embedding_decontaminate",
    "semantic_prune",
    "hyperplane_lsh_topk",
    "fit_ivf_centroids",
    "ivf_assign",
    "ivf_topk",
    "fit_pq_codebooks",
    "pq_encode",
    "pq_topk",
]


def dot64(a: Column, b: Column) -> Column:
    """Float64 dot product of two array columns (sequential left fold)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm64(a: Column) -> Column:
    return F.sqrt(dot64(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    Output: (q_id, rank, n_id, cosine) — self-matches excluded; ties broken
    by neighbour id for determinism.
    """
    from pyspark.sql import Window

    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__cv"),
        norm64(F.col(vec_col)).alias("__cn"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__qv"),
        norm64(F.col(vec_col)).alias("__qn"),
    )
    sim = dot64(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out


def cosine_near_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_col: str | None = None,
    allow_cross: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine ≥ threshold).

    Exact all-pairs within a block — O(n²) per block, so ``block_col``
    (a label, a coarse cluster id, or an SRP bucket from ``bucket_col``) is
    mandatory at scale.  The unblocked path is a cartesian product and is a
    hard error unless ``allow_cross=True`` is passed explicitly (small
    corpora / verification only) — one forgotten argument must not become a
    10^24-pair job.  The LSH-bucketed scale path is ``hyperplane_lsh_topk``'s
    bucketing composed with this as the verifier.
    """
    if block_col is None and not allow_cross:
        raise ValueError(
            "cosine_near_pairs without block_col is a cartesian product; "
            "pass block_col (scale path) or allow_cross=True (small/verify)"
        )
    cols = [F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
            norm64(F.col(vec_col)).alias("__n")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("__blk"))
    slim = corpus.select(*cols)
    a = slim.select(
        *([F.col("__blk")] if block_col else []),
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
    )
    b = slim.select(
        *([F.col("__blk")] if block_col else []),
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
    )
    joined = a.join(b, on="__blk") if block_col else a.crossJoin(b)
    sim = dot64(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cosine")
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_lists: int = 16,
    iters: int = 10,
    seed: int = 7,
    sample: int = 2048,
) -> np.ndarray:
    """Spherical k-means coarse quantizer for IVF (the inverted-file ANN
    family, Jégou et al. PAMI'11): unit-norm centroids fit by Lloyd
    iterations with cosine assignment.

    Deterministic by construction: the training sample is the ``sample``
    lowest-id vectors (an order-free predicate at scale — at 10^12 rows a
    seeded hash filter plays the same role), the init draws from a seeded
    RNG, and iteration count is fixed.  Driver-side numpy over the sample
    only — the CORPUS is never collected.
    """
    rows = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__id")
        .limit(sample)
        .collect()
    )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=n_lists, replace=False)]
    for _i in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_lists):
            members = x[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "ivf_list",
) -> DataFrame:
    """Append the nearest-centroid list id (cosine / max dot on unit-norm
    centroids).  One vectorized pandas-UDF pass: each Arrow batch is a
    float64 matmul against the broadcast centroid matrix — no per-row
    Python, no shuffle; at 10^12 rows this is a map-only stage."""
    from pyspark.sql import types as T

    cent = centroids

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.array(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ cent.T, axis=1).astype(np.int32))

    return df.withColumn(out_col, assign(F.col(vec_col)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 2,
    round_to: int | None = 6,
) -> DataFrame:
    """IVF approximate top-k: queries probe their ``nprobe`` nearest
    inverted lists and score only those lists' members.

    Scale shape: the corpus is assigned + shuffled ONCE on the list id; the
    (tiny) query set explodes to ``nprobe`` rows and broadcasts; scoring is
    the exact float64 sequential-fold cosine.  Recall < 1 by design — the
    quantizer bounds how much of the corpus any query touches
    (|list| ≈ N/n_lists per probe instead of N).  Output matches
    ``cosine_topk``: (q_id, rank, n_id, cosine).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    cent = centroids
    nb = int(nprobe)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        m = np.array(list(vecs), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent.T
        # top-nprobe lists, deterministic ties by list id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nb]
        return pd.Series(list(order.astype(np.int32)))

    c = ivf_assign(
        corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("__cv"),
            norm64(F.col(vec_col)).alias("__cn"),
        ),
        cent,
        vec_col="__cv",
        out_col="__list",
    )
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("__qv"),
            norm64(F.col(vec_col)).alias("__qn"),
            probes(F.col(vec_col)).alias("__probes"),
        )
        .withColumn("__list", F.explode("__probes"))
        .drop("__probes")
    )
    sim = dot64(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = (
        c.join(F.broadcast(q), "__list")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """SRP bucket id: sign bits of the vector's projection on each plane."""
    out = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # NaN guard: Spark's NaN-greatest ordering makes `NaN >= 0` TRUE,
        # while the numpy/Python differential oracles evaluate it False — a
        # NaN projection must take the 0 bit on BOTH sides (ADVICE r2)
        bit = (
            F.when(F.isnan(proj), F.lit(0).cast("long"))
            .when(proj >= 0, F.lit(1).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
        out = out.bitwiseOR(F.shiftleft(bit, i))
    return out


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    bits: int = 8,
    seed: int = 7,
    round_to: int | None = 6,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's SRP
    bucket.  Recall < 1 by design; the scale path when a linear scan per query
    is too expensive.  Output schema matches ``cosine_topk``.

    Pass ``dim`` (the embedding width) explicitly — it is a schema fact the
    caller knows; the ``first()`` fallback exists for exploratory use but
    costs one extra Spark job just to learn the vector length.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__cv"),
        norm64(F.col(vec_col)).alias("__cn"),
        bucket_col(F.col(vec_col), planes).alias("__bkt"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__qv"),
        norm64(F.col(vec_col)).alias("__qn"),
        bucket_col(F.col(vec_col), planes).alias("__bkt"),
    )
    sim = dot64(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    scored = (
        c.join(F.broadcast(q), "__bkt")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cosine", sim)
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "n_id", "cosine")
    )
    if round_to is not None:
        out = out.withColumn("cosine", F.round(F.col("cosine"), round_to))
    return out


def embedding_decontaminate(
    corpus: DataFrame,
    evalset: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    threshold: float = 0.9,
    round_to: int | None = 6,
) -> DataFrame:
    """Embedding-space eval-set decontamination: flag corpus vectors whose
    cosine similarity to ANY eval-set vector reaches ``threshold`` — the
    semantic leg of the decontamination triad (text n-gram overlap in
    ``quality_filters.decontaminate``, waveform fingerprints in
    ``audio_dedup.audio_decontaminate``).  A paraphrased or re-embedded
    eval example that shares no n-grams and no waveform still leaks
    through its embedding neighbourhood; this is the probe that sees it.

    Output: one row per corpus vector — (id, n_hits, is_leak,
    best_eval_id, best_cosine).  ``best_*`` are reported only for leaks:
    sub-threshold similarities never surface, so no float ordering over
    arbitrary near-tie values can differ between engines.

    Scale shape: the eval set is broadcast (eval suites are KBs-to-MBs
    against a 100 TB corpus); the corpus side is one broadcast
    nested-loop score + an early ``>= threshold`` filter, so only the
    (rare) hits — ids plus one double — ever reach the tiny hit
    aggregate, and the final attach joins that aggregate back broadcast.
    The corpus itself never shuffles.  Cosines run in float64 sequential
    folds (``dot64``), bit-stable across partitionings.
    """
    eid = eval_id_col or id_col
    e = evalset.select(
        F.col(eid).alias("__eid"),
        F.col(vec_col).alias("__ev"),
        norm64(F.col(vec_col)).alias("__en"),
    )
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col).alias("__cv"),
        norm64(F.col(vec_col)).alias("__cn"),
    )
    sim = dot64(F.col("__cv"), F.col("__ev")) / (F.col("__cn") * F.col("__en"))
    hits = (
        c.join(F.broadcast(e), F.lit(True))
        .withColumn("__cos", sim)
        .filter(F.col("__cos") >= F.lit(threshold))
        .select(id_col, "__eid", "__cos")
    )
    # Best hit per corpus vector: max cosine, ties to the smallest eval id
    # (struct max on (cosine, -eid) — eval ids are numeric by contract).
    best = F.max(
        F.struct(F.col("__cos").alias("c"), (-F.col("__eid")).alias("ni"))
    )
    agg = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        best.alias("__best"),
    )
    out = (
        corpus.select(F.col(id_col))
        .join(F.broadcast(agg), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("is_leak"),
            (-F.col("__best.ni")).cast("long").alias("best_eval_id"),
            F.col("__best.c").alias("best_cosine"),
        )
    )
    if round_to is not None:
        out = out.withColumn(
            "best_cosine", F.round(F.col("best_cosine"), round_to)
        )
    return out


def semantic_prune(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    bits: int = 6,
    seed: int = 11,
) -> DataFrame:
    """SemDeDup-shaped semantic dedup (Abbas et al. 2023, public method):
    embedding near-duplicate PAIRS (SRP-bucketed exact cosine — the scale
    path) close into clusters via the large-star/small-star rounds, and
    each cluster keeps exactly ONE representative (the min id — the
    component label itself, so no extra decision pass).  Returns one row
    per vector: (id, component, cluster_size, keep); singletons keep
    themselves.

    Scale shape: the pair stage is per-bucket O(n²) with one bucket-keyed
    shuffle (pairs carry ids + one double, never vectors); the closure is
    O(log n) rounds over the (small) pair graph; the final left join
    attaches the member relation back to the id column only — embeddings
    never shuffle.
    """
    from .cluster import cluster_members

    planes = _hyperplanes(dim, bits, seed)
    blocked = corpus.withColumn("__bkt", bucket_col(F.col(vec_col), planes))
    pairs = cosine_near_pairs(
        blocked, id_col=id_col, vec_col=vec_col,
        threshold=threshold, block_col="__bkt",
    )
    members = cluster_members(pairs)
    ids = corpus.select(F.col(id_col))
    return ids.join(members, ids[id_col] == members["node"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        F.coalesce(F.col("cluster_size"), F.lit(1))
        .cast("long")
        .alias("cluster_size"),
        (F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)).alias(
            "keep"
        ),
    )


# ---------------------------------------------------------------- PQ ANN
# Product quantization (Jégou et al. PAMI'11 §III): the COMPRESSED-domain
# ANN path.  IVF bounds how much of the corpus a query touches; PQ bounds
# how many BYTES each touched vector costs — a 64-dim float64 vector
# (512 B) becomes m=8 uint8 codes, and scoring a query against a code is
# m table lookups instead of a 64-term dot product.  At 10^12 vectors the
# codes fit where the vectors never could, which is the entire point.

PQ_M = 16       # subspaces (dim must divide evenly)
PQ_KSUB = 256   # centroids per subspace (8-bit codes; 16 B/vector = 32x
                # compression on 64-dim float64 — measured recall@3 0.8 on
                # the synthetic embeddings, which are adversarial for PQ:
                # no cluster structure, so quantization error competes with
                # tiny true-neighbor cosine gaps)


def fit_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 10,
    seed: int = 11,
    sample: int = 2048,
) -> np.ndarray:
    """(m, ksub, dim/m) per-subspace L2 k-means codebooks fit on the
    deterministic lowest-id sample of unit-normalized vectors — same
    determinism contract as ``fit_ivf_centroids`` (driver-side numpy
    over the sample only; the corpus is never collected)."""
    rows = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy("__id")
        .limit(sample)
        .collect()
    )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub: (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code (nearest sub-centroid per subspace of
    the unit-normalized vector).  One vectorized pandas-UDF pass — per
    Arrow batch, m small matmuls against the broadcast codebooks; at
    10^12 rows this is a map-only stage whose OUTPUT is 64× smaller
    than its input."""
    from pyspark.sql import types as T

    books = codebooks
    m, ksub, dsub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(vecs: pd.Series) -> pd.Series:
        xm = np.array(list(vecs), dtype=np.float64)
        xm /= np.maximum(np.linalg.norm(xm, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(xm), m), dtype=np.int32)
        for j in range(m):
            xs = xm[:, j * dsub: (j + 1) * dsub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return df.withColumn(out_col, encode(F.col(vec_col)))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """PQ asymmetric-distance top-k: each (tiny, collected) query builds
    an (m, ksub) lookup table of sub-dot-products against the codebooks;
    scoring a corpus code is m LUT gathers + a fixed-order sum.

    Scale shape: the corpus crosses the scoring stage as CODES (m ints),
    never as vectors; per-partition candidate scoring is a pure map and
    the only exchange carries (q_id, n_id, adc) for the window top-k —
    Spark 4 executes it as WindowGroupLimit (partial top-k before the
    shuffle).  Recall < 1 by design: the quantizer error bounds score
    fidelity; ``ann_recall``-style companions measure it."""
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    books = codebooks
    m, ksub, dsub = books.shape
    qrows = (
        queries.select(F.col(id_col).alias("__qid"),
                       F.col(vec_col).alias("__qv"))
        .orderBy("__qid")
        .collect()
    )
    q_ids = [int(r["__qid"]) for r in qrows]
    qm = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    # (nq, m, ksub) LUTs: dot of each query subvector with each centroid
    luts = np.einsum(
        "qjd,jkd->qjk",
        qm.reshape(len(qm), m, dsub),
        books,
    )
    encoded = pq_encode(corpus, codebooks, vec_col).select(
        F.col(id_col).alias("n_id"), "pq_code")

    out_schema = T.StructType([
        T.StructField("q_id", T.LongType(), False),
        T.StructField("n_id", T.LongType(), False),
        T.StructField("adc", T.DoubleType(), False),
    ])

    def score(batches):
        import pyarrow as pa

        for batch in batches:
            nids = batch.column(0).to_pylist()
            codes = np.array(batch.column(1).to_pylist(), dtype=np.int64)
            if len(codes):
                # (nq, rows): gather per subspace, fixed-order sum over m
                sc = np.zeros((len(q_ids), len(codes)), dtype=np.float64)
                for j in range(m):
                    sc += luts[:, j, :][:, codes[:, j]]
                nid_arr = np.asarray(nids, dtype=np.int64)
                qid_arr = np.asarray(q_ids, dtype=np.int64)
                oq = np.repeat(qid_arr, len(nid_arr))
                on = np.tile(nid_arr, len(qid_arr))
                oa = sc.ravel()
                keep = oq != on  # drop self-pairs, vectorized
                oq, on, oa = oq[keep], on[keep], oa[keep]
            else:
                oq = on = np.zeros(0, dtype=np.int64)
                oa = np.zeros(0, dtype=np.float64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(oq, type=pa.int64()),
                 pa.array(on, type=pa.int64()),
                 pa.array(oa, type=pa.float64())],
                names=["q_id", "n_id", "adc"],
            )

    scored = encoded.mapInArrow(score, out_schema)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc())
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    adc = F.round("adc", round_to) if round_to is not None else F.col("adc")
    return ranked.select(
        "q_id", "rank", "n_id", adc.alias("adc_r")
    ).orderBy("q_id", "rank")
