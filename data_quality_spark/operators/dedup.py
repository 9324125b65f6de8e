"""Document deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

The reference's duplicate detection is `COUNT(*) - COUNT(DISTINCT col)` /
grouped-HAVING over scalar columns (``/root/reference/src/data_quality/
quality_scanner.py:554-569``, ``safe_scanners.py:144-190``).  A web-scale
training-data pipeline additionally needs *near*-duplicate detection over
text; these operators provide the standard ladder, each expressed purely in
JVM-side Catalyst expressions (split / transform / xxhash64 / array ops — no
Python in the hot path):

- **exact_dedup**        — md5 fingerprint → hash-groupBy.  One shuffle on the
  digest; at 100 TB the digest (16 bytes) shuffles instead of the document.
- **ngram_jaccard_pairs** — token-set Jaccard over blocked candidate pairs.
  Exact but O(n²) within a block: use only inside small blocks (lang, length
  bucket) or as the *verify* stage after LSH candidate generation.
- **minhash_lsh_pairs**  — shingle → K minhashes → b bands × r rows →
  bucket-join (Broder 1997 / Leskovec MMDS ch.3).  The only shuffle is on
  (band, band_hash) — candidates collide into tiny buckets and the quadratic
  blowup is bounded per bucket.  This is the 10^12-row path.
- **simhash64**          — Charikar 2002 bitwise-majority fingerprint +
  chunk-banded Hamming pairs (Manku et al. WWW'07): 4×16-bit chunks guarantee
  recall for Hamming distance ≤ 3 by pigeonhole.
- **winnow_fingerprints** — rolling-hash local fingerprints (Schleimer et
  al. SIGMOD'03 / MOSS): windowed-min shingle hashes with the coverage
  guarantee; one posexplode + one doc-id shuffle.

All hash families derive from ``xxhash64(col, seed)`` — deterministic across
sessions/executors (unlike ``F.hash``'s salted murmur in some contexts, the
xxhash64 expression is seed-stable and documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tokens_col",
    "exact_dedup_stats",
    "exact_dedup_keep_first",
    "exact_text_pairs",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "lsh_candidates_multi",
    "simhash64",
    "simhash_near_pairs",
    "simhash_index_entries",
    "simhash_index_bucket_stats",
    "simhash_probe_index",
    "winnow_fingerprints",
    "dedup_against_index",
    "build_dedup_index",
    "build_lsh_index",
    "lsh_index_entries",
    "lsh_index_bucket_stats",
    "lsh_probe_index",
    "cross_source_dup_matrix",
]


def tokens_col(text: Column) -> Column:
    """Whitespace tokens of the trimmed, lower-cased text (empty → [])."""
    t = F.trim(F.lower(text))
    return F.when(
        text.isNull() | (F.length(t) == 0), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))


def exact_dedup_stats(df: DataFrame, text_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Exact-duplicate profile via md5 fingerprint: per group (or global)
    doc count, distinct fingerprints, extra (removable) rows."""
    keyed = df.withColumn("__fp", F.md5(F.col(text_col)))
    gb = keyed.groupBy(*group_cols) if group_cols else keyed.groupBy()
    return gb.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct(F.col("__fp")).cast("long").alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("__fp")))
        .cast("long")
        .alias("n_dup_extra"),
    )


def exact_text_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate edges for the cluster/split pipelines: documents
    with byte-identical text link representative→member via the shared
    ``cluster.digest_chain_pairs`` law (md5 digest groupBy, k−1 chain
    edges per family, never quadratic).

    Why beside MinHash-LSH: exact copies are the dominant duplicate
    class at web scale, and a family of k copies makes EVERY band
    bucket it touches k× hotter — past ``max_bucket_size`` the LSH
    guard drops those buckets and the family's pairs vanish from the
    closure (the identity-split smoke measured 4.8% of replica
    families straddling the split from exactly this).  With this edge
    source unioned in, LSH owns only NEAR-dup recall, which stays
    guard-bounded by design.  NULL texts carry no content and never
    link (``exact_dedup_stats``'s md5 key skips them the same way)."""
    from .cluster import digest_chain_pairs

    slim = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.md5(F.col(text_col)).alias("__d")
    )
    return digest_chain_pairs(slim)


def exact_dedup_keep_first(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact fingerprint (the dedup *transform*).

    groupBy-min instead of a window: one shuffle on the 16-byte digest and no
    full sort within groups — the cheapest distributed formulation.

    NULL texts are not duplicates of each other (``md5(NULL)`` is NULL and a
    plain groupBy would silently collapse every NULL-text row into one
    survivor), so NULL rows get a per-row sentinel fingerprint and all pass
    through unchanged.
    """
    keyed = df.withColumn(
        "__fp",
        F.when(
            F.col(text_col).isNull(),
            F.concat(F.lit("null:"), F.col(id_col).cast("string")),
        ).otherwise(F.md5(F.col(text_col))),
    )
    winners = keyed.groupBy("__fp").agg(F.min(F.col(id_col)).alias(id_col))
    return keyed.join(winners, ["__fp", id_col], "inner").drop("__fp")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Token-set Jaccard ≥ threshold over within-block pairs.

    ``block_cols`` is the blocking key (e.g. ``[lang]`` or ``[lang,
    length_bucket]``): the self-join shuffles once on the block key and the
    quadratic comparison is confined to each block.  Output:
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    toks = F.array_distinct(tokens_col(F.col(text_col)))
    slim = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("__id"),
        toks.alias("__toks"),
    )
    a = slim.select(
        *[F.col(c) for c in block_cols],
        F.col("__id").alias("id_a"),
        F.col("__toks").alias("__ta"),
    )
    b = slim.select(
        *[F.col(c) for c in block_cols],
        F.col("__id").alias("id_b"),
        F.col("__toks").alias("__tb"),
    )
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.size(F.array_union(F.col("__ta"), F.col("__tb")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        a.join(b, on=block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def _shingles(toks: Column, k: int) -> Column:
    """k-token shingles joined with spaces; shorter docs collapse to one
    whole-document shingle so every non-empty doc has ≥1 shingle.

    Built by zip_with-ing the token array against its own shifted slices —
    O(k) evaluations of the token expression per row.  (The naive
    ``transform(sequence, i -> element_at(toks, i+j))`` form re-evaluates
    the tokenization per element access — measured ~30× slower on sf0.1.)
    """
    n = F.size(toks)
    sh = toks
    for j in range(1, k):
        shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
        # zip_with pads to the longer input; tail entries get null parts that
        # concat_ws skips, producing short shingles — sliced off below
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    sliding = F.slice(sh, 1, F.greatest(n - (k - 1), F.lit(1)))
    return (
        F.when(n == 0, F.array().cast("array<string>"))
        .when(n < k, F.array(F.concat_ws(" ", toks)))
        .otherwise(sliding)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig: array<long>) of ``num_hashes`` minhash values per document.

    Formulation matters: evaluating 64 ``array_min(transform(...))`` column
    expressions re-instantiates the shingle-construction tree per hash
    function (Catalyst does not CSE across higher-order-function lambdas),
    which measured ~60× slower.  Instead shingles explode to rows ONCE and a
    single fused aggregate takes 64 mins — map-side partial agg means the
    shuffle carries one 64-long row per document, and the hash work is
    exactly |shingles| × num_hashes.
    """
    # CPU-heavy per-row work: force task parallelism ≥ cores even when the
    # source is one small file (the shuffle moves only (id, text) rows)
    par = df.sparkSession.sparkContext.defaultParallelism
    slim = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__tx"))
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    sh_rows = slim.select(
        "__id",
        F.explode(_shingles(tokens_col(F.col("__tx")), shingle_k)).alias("__sh"),
    )
    wide = sh_rows.groupBy("__id").agg(
        *[
            F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    return wide.select(
        F.col("__id").alias(id_col),
        F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def _band_key_explode(bands: int, rows_per_band: int):
    """ONE definition of the LSH banding key (xxhash64 over each
    signature slice), shared by the batch candidate stage and the
    incremental index probe — their tested equivalence depends on the
    key being literally the same expression."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.slice(
                            F.col("__sig"),
                            b * rows_per_band + 1,
                            rows_per_band,
                        )
                    ).alias("bh"),
                )
                for b in range(bands)
            ]
        )
    )


def _banded_candidates(
    keyed: DataFrame, bands: int, rows_per_band: int, max_bucket_size: int
) -> DataFrame:
    """The banding stage over a (__id, __sig) signature relation:
    explode per-band bucket keys, drop singleton/oversized buckets, pair
    within buckets, dedupe across bands.  Shared by minhash_lsh_pairs and
    the multi-config tuning sweep (which bands ONE persisted signature
    relation several ways)."""
    band_entries = keyed.select(
        "__id",
        _band_key_explode(bands, rows_per_band).alias("e"),
    ).select("__id", "e.band", "e.bh")
    small_buckets = (
        band_entries.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") > 1) & (F.col("__bn") <= max_bucket_size))
        .select("band", "bh")
    )
    pruned = band_entries.join(small_buckets, ["band", "bh"])
    left = pruned.select("band", "bh", F.col("__id").alias("id_a"))
    right = pruned.select("band", "bh", F.col("__id").alias("id_b"))
    return (
        left.join(right, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float | None = 0.5,
    max_bucket_size: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding, optionally verified
    with exact token-set Jaccard.

    ``materialize`` persists the signature relation (one 64-long array per
    document, MEMORY_AND_DISK) before the DAG references it three times
    (bucket entries, bucket-size guard, both pair sides) — without it the
    shingle-explode + 64-min aggregate re-executes per divergently-pruned
    reference (measured at sf0.1: cold 30 s → 5 s, warm 1.2 s → 0.2 s for
    the simhash sibling; same shape here).  At a scale where even
    signatures don't fit in cluster memory, write them to a table and join
    against the scan instead.  The caller may ``unpersist()`` after
    collecting.

    With 64 hashes in 16 bands of 4 rows, the S-curve midpoint sits at
    J ≈ (1/16)^(1/4) ≈ 0.5.  Scale shape: signatures are computed in a single
    narrow projection; the ONLY shuffle is the explode→groupBy on
    (band, band_hash).

    ``max_bucket_size`` is the hot-bucket skew guard: a band bucket with more
    than this many members contributes O(bucket²) candidate pairs, so
    oversized buckets are dropped (their members still pair up through their
    other bands — with 16 bands, only documents hot in *every* band are
    lost, and a bucket that large signals boilerplate better handled by
    exact dedup first).  This is what keeps the operator alive at 10^12 rows
    on skew-heavy corpora.

    Returns (id_a, id_b [, jaccard]) with id_a < id_b, deduped across bands.
    """
    rows_per_band = num_hashes // bands
    keyed = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k).select(
        F.col(id_col).alias("__id"), F.col("sig").alias("__sig")
    )
    if materialize:
        from pyspark.storagelevel import StorageLevel

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    cand = _banded_candidates(keyed, bands, rows_per_band, max_bucket_size)
    if verify_threshold is None:
        return cand
    toks = df.select(
        F.col(id_col).alias("__vid"),
        F.array_distinct(tokens_col(F.col(text_col))).alias("__vt"),
    )
    inter = F.size(F.array_intersect(F.col("__ta"), F.col("__tb")))
    union = F.size(F.array_union(F.col("__ta"), F.col("__tb")))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
        F.lit(0.0)
    )
    return (
        cand.join(
            toks.select(F.col("__vid").alias("id_a"), F.col("__vt").alias("__ta")),
            "id_a",
        )
        .join(
            toks.select(F.col("__vid").alias("id_b"), F.col("__vt").alias("__tb")),
            "id_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(verify_threshold))
        .select("id_a", "id_b", "jaccard")
    )


def lsh_candidates_multi(
    df: DataFrame,
    id_col: str,
    text_col: str,
    band_configs: tuple[int, ...] = (8, 16, 32),
    num_hashes: int = 64,
    shingle_k: int = 3,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Candidate pairs under SEVERAL banding configurations of the same
    ``num_hashes``-long MinHash signature — the measurement half of an LSH
    parameter sweep (the banding S-curve midpoint is (1/b)^(1/r); 8×8 /
    16×4 / 32×2 over 64 hashes put midpoints at J ≈ 0.77 / 0.50 / 0.18).
    Returns (bands, id_a, id_b).

    All configs band ONE persisted signature relation — the corpus pays
    the shingle-explode + 64-min signature aggregate once, and each
    config adds only its own (band, band_hash) shuffle.
    """
    keyed = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_k
    ).select(F.col(id_col).alias("__id"), F.col("sig").alias("__sig"))
    from pyspark.storagelevel import StorageLevel

    keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    parts = [
        _banded_candidates(
            keyed, b, num_hashes // b, max_bucket_size
        ).select(F.lit(b).cast("int").alias("bands"), "id_a", "id_b")
        for b in band_configs
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS local fingerprinting algorithm): hash every
    k-token shingle, slide a window of ``window`` consecutive hashes, keep
    each window's minimum, emit the distinct selected hashes per document.
    Guarantees: any shared run of ``window + shingle_k - 1`` tokens between
    two documents yields at least one shared fingerprint (the winnowing
    coverage property), while storing only ~2/(window+1) of the hashes.

    Spark shape: shingles posexplode once; the windowed min and the per-doc
    length share ONE partitioning (doc id) so the whole operator costs a
    single shuffle + per-doc local sort; the output carries (id, fp) rows —
    at 10^12 docs fingerprints shuffle, never documents.  Documents shorter
    than one full window contribute their global-min hash (standard
    short-document degeneration).
    """
    from pyspark.sql import Window as W

    par = df.sparkSession.sparkContext.defaultParallelism
    slim = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__tx"))
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    sh = slim.select(
        "__id",
        F.posexplode(_shingles(tokens_col(F.col("__tx")), shingle_k)).alias(
            "__pos", "__sh"
        ),
    ).select("__id", "__pos", F.xxhash64(F.col("__sh")).alias("__h"))
    w_roll = (
        W.partitionBy("__id").orderBy("__pos").rowsBetween(-(window - 1), 0)
    )
    w_all = W.partitionBy("__id")
    picked = (
        sh.withColumn("__wmin", F.min("__h").over(w_roll))
        .withColumn("__m", F.count(F.lit(1)).over(w_all))
        .filter(
            (F.col("__pos") >= window - 1)
            | ((F.col("__m") < window) & (F.col("__pos") == F.col("__m") - 1))
        )
    )
    return picked.select(
        F.col("__id").alias(id_col), F.col("__wmin").alias("fp")
    ).distinct()


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document (Charikar 2002).

    (doc, token) explode → per-bit ±1 votes summed in ONE fused aggregate (64
    conditional sums — same fused-agg machinery as the rule compiler) →
    signature reassembled bitwise.  One shuffle on the doc id.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    slim = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__tx"))
    if slim.rdd.getNumPartitions() < par:
        slim = slim.repartition(par)
    tok = slim.select(
        "__id",
        F.explode(F.array_distinct(tokens_col(F.col("__tx")))).alias("__tok"),
    ).withColumn("__h", F.xxhash64(F.col("__tok")))
    votes = tok.groupBy("__id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(64)
        ]
    )
    sig = None
    for i in range(64):
        bit = F.when(F.col(f"__b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return votes.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def _simhash_chunks(sigs: DataFrame, id_col: str) -> DataFrame:
    """(__id, simhash, ci, cv): the 4×16-bit chunk-key emission shared
    by the self-join pair finder and the incremental index probe — the
    ONE definition of the banding law."""
    return sigs.select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("ci"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("e"),
    ).select("__id", "simhash", "e.ci", "e.cv")


def simhash_index_entries(index_df: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """(index_id, simhash, ci, cv): a stored signature index's
    chunk-key relation — store beside the index and pass to
    ``simhash_probe_index`` to skip per-probe re-derivation (the
    at-scale seam; it only grows by appending survivors' keys)."""
    return _simhash_chunks(index_df, id_col).select(
        F.col("__id").alias("index_id"),
        F.col("simhash").alias("__sb"), "ci", "cv",
    )


def simhash_index_bucket_stats(entries_df: DataFrame) -> DataFrame:
    """(ci, cv, n_members): per-chunk-bucket population of a stored
    simhash entries relation — store beside the index and pass to
    ``simhash_probe_index`` so the hot-bucket guard reads ~#buckets
    instead of re-aggregating the entries per probe (the audio path's
    ``audio_index_bucket_stats``, simhash form)."""
    return entries_df.groupBy("ci", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"))


def simhash_probe_index(
    new_sigs: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int = 256,
    index_entries_df: DataFrame | None = None,
    index_stats_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental SimHash near-dup: NEW signatures probed against a
    STORED signature relation (8 B per row — the simhash column IS the
    index).  Returns (new_id, index_id, hamming), NEW×INDEX collisions
    only under the INDEX-side bucket guard, verified by bit_count(xor)
    ≤ ``max_hamming``.

    Exact identity never depends on chunk-bucket heat: equal signatures
    additionally join on the full 64-bit value at hamming 0 (a hash
    equality is not byte-identity — it is the same *perceptual* class,
    which is precisely what the signature family asserts).  Same-id
    pairs are excluded (re-ingest is exact dedup's job)."""
    new_c = _simhash_chunks(new_sigs, id_col).select(
        F.col("__id").alias("new_id"),
        F.col("simhash").alias("__sa"), "ci", "cv",
    )
    idx_c = (index_entries_df if index_entries_df is not None
             else simhash_index_entries(index_df, id_col))
    if index_stats_df is not None:
        # stored-stats scale shape (see audio_probe_index): broadcast
        # anti-join against the tiny hot list, broadcast the increment
        # — the stored entries scan once, never shuffle, no per-probe
        # aggregate
        hot = index_stats_df.filter(
            F.col("n_members") > max_bucket_size).select("ci", "cv")
        idx_c = idx_c.join(F.broadcast(hot), ["ci", "cv"], "left_anti")
        collided = idx_c.join(F.broadcast(new_c), ["ci", "cv"])
    else:
        small = (
            idx_c.groupBy("ci", "cv")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("ci", "cv")
        )
        collided = new_c.join(idx_c.join(small, ["ci", "cv"]),
                              ["ci", "cv"])
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    banded = (
        collided
        .filter(F.col("new_id") != F.col("index_id"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("new_id", "index_id", "hamming")
        .distinct()
    )
    exact = (
        new_sigs.select(F.col(id_col).alias("new_id"), "simhash")
        .join(index_df.select(F.col(id_col).alias("index_id"), "simhash"),
              "simhash")
        .filter(F.col("new_id") != F.col("index_id"))
        .select("new_id", "index_id",
                F.lit(0).cast("int").alias("hamming"))
    )
    return banded.unionByName(exact).dropDuplicates(
        ["new_id", "index_id"])


def simhash_near_pairs(
    sigs: DataFrame, id_col: str, max_hamming: int = 3, max_bucket_size: int = 256,
    materialize: bool = True,
) -> DataFrame:
    """Pairs with Hamming(simhash) ≤ max_hamming via 4×16-bit chunk banding
    (Manku et al. 2007): any pair within distance 3 shares ≥1 exact chunk, so
    the bucket-join on (chunk_idx, chunk_value) has full recall — up to the
    ``max_bucket_size`` hot-bucket guard (same skew rationale as
    ``minhash_lsh_pairs``; oversized chunk buckets are near-identical
    boilerplate that exact dedup should have removed).

    ``materialize`` persists ``sigs`` (8 bytes/doc) before the three
    divergently-pruned references below re-execute its lineage — when fed
    from ``simhash64`` that lineage is the token explode + fused 64-sum
    aggregate, measured at sf0.1: cold 30.3 s → 5.2 s, warm 1.19 s →
    0.20 s.  Caller may ``unpersist()`` after collecting.
    """
    if materialize:
        from pyspark.storagelevel import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    chunks = _simhash_chunks(sigs, id_col)
    small = (
        chunks.groupBy("ci", "cv")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") > 1) & (F.col("__bn") <= max_bucket_size))
        .select("ci", "cv")
    )
    chunks = chunks.join(small, ["ci", "cv"])
    a = chunks.select(
        "ci", "cv", F.col("__id").alias("id_a"), F.col("simhash").alias("__sa")
    )
    b = chunks.select(
        "ci", "cv", F.col("__id").alias("id_b"), F.col("simhash").alias("__sb")
    )
    ham = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def dedup_against_index(
    new_df: DataFrame,
    index_df: DataFrame,
    *,
    text_col: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Incremental exact dedup: drop NEW documents whose content already
    exists in a historical fingerprint index (yesterday's corpus), keep
    everything else.  Returns the surviving rows of ``new_df`` unchanged.

    ``index_df`` carries one md5-hex ``fp_col`` per known document (build
    it with :func:`build_dedup_index`; at scale it is a stored table that
    only ever grows by appending the survivors' fingerprints).  The match
    is a LEFT ANTI join on the 16-byte digest — document text never
    shuffles, and a small index broadcasts automatically under AQE.
    NULL-text rows always survive (md5(NULL) is NULL; an anti-join on a
    NULL key can never match — the engine's semantics, and the intended
    ones: an absent document is not "already indexed").
    """
    keyed = new_df.withColumn("__fp", F.md5(F.col(text_col)))
    idx = index_df.select(F.col(fp_col).alias("__fp")).distinct()
    return keyed.join(idx, "__fp", "left_anti").drop("__fp")


def build_dedup_index(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Distinct md5 fingerprints of a corpus — the relation
    :func:`dedup_against_index` matches against.  NULL texts contribute
    no fingerprint."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"))
        .where(F.col("fp").isNotNull())
        .distinct()
    )


def cross_source_dup_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source_a, source_b, n_shared) with source_a < source_b: the
    number of DISTINCT contents present in both sources — the
    syndication/mirror matrix.  A pair with high overlap means one
    source republishes the other (or both scrape a common upstream):
    per-source dedup statistics cannot see it, and a per-source crawl
    budget double-pays for it.

    Law: distinct (md5(text), source) pairs, self-joined on the
    fingerprint with ``source_a < source_b``, counted per source pair.
    NULL texts carry no fingerprint and never match.  Scale: the
    distinct relation is one 48-byte row per (content, source); the
    self-join fans out per fingerprint by its source multiplicity —
    bounded by |sources|, never by copies (the distinct collapsed
    those) — and the result is at most |sources|² rows.

    Reference analog: none (the reference's duplicate scan is
    single-table); this is the cross-SOURCE curation view of C1-C4's
    duplicate family."""
    d = (
        df.select(
            F.md5(F.col(text_col)).alias("__fp"),
            F.col(source_col).alias("__src"),
        )
        .where(F.col("__fp").isNotNull())
        .distinct()
    )
    a = d.select(F.col("__fp"), F.col("__src").alias("source_a"))
    b = d.select(F.col("__fp"), F.col("__src").alias("source_b"))
    return (
        a.join(b, "__fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )


def build_lsh_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, sig array<long>, fp) minhash-signature index — the NEAR-dup
    analog of :func:`build_dedup_index`.  A daily dedup job stores this
    relation (64 longs + one md5 hex = ~550 B per document, ~3 orders
    smaller than text) and only ever appends the survivors' rows;
    indexed text is never needed again.

    ``fp`` (md5 of the text, NULL for NULL text) is the EXACT-identity
    key: probe-side exact matches join on it directly, so identical
    re-posts under new ids never depend on band-bucket heat — and
    texts too short to shingle (invisible to the signature path
    entirely) still match exactly."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k)
    fps = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
    return sigs.join(fps, id_col, "left")


def lsh_index_entries(
    index_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(index_id, band, bh): a stored minhash index's band-bucket key
    relation — slim (no signatures; the verify stage joins those back
    from the index itself), append-only, written beside the index so a
    probe never re-bands O(corpus) signatures."""
    rows_per_band = num_hashes // bands
    return index_df.select(
        F.col(id_col).alias("index_id"), F.col("sig").alias("__sig")
    ).select(
        "index_id", _band_key_explode(bands, rows_per_band).alias("e")
    ).select("index_id", "e.band", "e.bh")


def lsh_index_bucket_stats(entries_df: DataFrame) -> DataFrame:
    """(band, bh, n_members): stored per-bucket population for the
    minhash probe's zero-aggregate hot guard."""
    return entries_df.groupBy("band", "bh").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"))


def lsh_probe_index(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    agree_threshold: float = 0.5,
    max_bucket_size: int = 64,
    index_entries_df: DataFrame | None = None,
    index_stats_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: NEW documents probed against a STORED
    signature index, no re-LSH of the corpus.

    Returns (new_id, index_id, n_agree, est_jaccard) — one row per
    (new, indexed) near-duplicate pair.  The law:

    - new signatures are computed (the only text scan — the increment);
    - both sides band identically (xxhash64 over signature slices, the
      exact batch-operator key), and candidates are the NEW×INDEX
      bucket collisions — a join against the stored bucket keys, never
      an index self-join, so a day's probe costs O(increment), not
      O(corpus);
    - the verify stage is SIGNATURE AGREEMENT, computable from stored
      data alone: ``n_agree`` = positions where the two 64-long
      signatures are equal (an unbiased Jaccard estimator — the
      classic minhash identity P[h_min equal] = J), accepted when
      ``n_agree >= ceil(agree_threshold · num_hashes)`` — an exact
      INTEGER compare, no float ever decides;
    - ``max_bucket_size`` guards hot buckets BY INDEX-SIDE population
      (the side whose size you know ahead of time); a same-id pair
      (re-ingest of an indexed document) is excluded — re-ingest is
      exact dedup's job (:func:`dedup_against_index`).

    Contract vs the batch operator (tested): with the guard wide open,
    probe pairs == the cross (new × indexed) slice of
    ``_banded_candidates`` over the union corpus — the incremental law
    is the batch law restricted to the increment.

    Exact-identity law (when the index carries the ``fp`` digest column
    — :func:`build_lsh_index` writes it): identical texts under
    different ids pair via a digest equi-join with
    ``n_agree = num_hashes`` / ``est_jaccard = 1.0`` (identical text ⇒
    identical signatures, so the banded path produces the same row when
    its buckets are cool — the digest path guarantees it when they are
    NOT, and covers texts too short to shingle, which the signature
    path cannot see at all).  Indexes stored before the column existed
    keep working (the exact path is skipped).
    """
    import math

    rows_per_band = num_hashes // bands
    agree_min = math.ceil(agree_threshold * num_hashes)

    def entries(sig_rel: DataFrame, side: str) -> DataFrame:
        return sig_rel.select(
            F.col("__id").alias(side),
            F.col("__sig").alias(f"__sig_{side}"),
            _band_key_explode(bands, rows_per_band).alias("e"),
        ).select(side, f"__sig_{side}", "e.band", "e.bh")

    idx = index_df.select(
        F.col(id_col).alias("__id"), F.col("sig").alias("__sig"))
    new = minhash_signatures(
        new_df, id_col, text_col, num_hashes, shingle_k
    ).select(F.col(id_col).alias("__id"), F.col("sig").alias("__sig"))

    if index_entries_df is not None:
        # stored slim keys: collide ids first, join signatures back for
        # the verify stage (entries never carry the 64-long arrays)
        idx_k = index_entries_df
        new_k = new.select(
            F.col("__id").alias("new_id"),
            _band_key_explode(bands, num_hashes // bands).alias("e"),
        ).select("new_id", "e.band", "e.bh")
        if index_stats_df is not None:
            hot = index_stats_df.filter(
                F.col("n_members") > max_bucket_size).select("band", "bh")
            idx_k = idx_k.join(F.broadcast(hot), ["band", "bh"],
                               "left_anti")
            collided = idx_k.join(F.broadcast(new_k), ["band", "bh"])
        else:
            small = (
                idx_k.groupBy("band", "bh")
                .agg(F.count(F.lit(1)).alias("__bn"))
                .filter(F.col("__bn") <= max_bucket_size)
                .select("band", "bh")
            )
            collided = new_k.join(idx_k.join(small, ["band", "bh"]),
                                  ["band", "bh"])
        pair_ids = (
            collided
            .filter(F.col("new_id") != F.col("index_id"))
            .select("new_id", "index_id")
            .dropDuplicates(["new_id", "index_id"])
        )
        new_s = new.select(F.col("__id").alias("new_id"),
                           F.col("__sig").alias("__sig_new_id"))
        idx_s = idx.select(F.col("__id").alias("index_id"),
                           F.col("__sig").alias("__sig_index_id"))
        if index_stats_df is not None:
            # verify stage, scale shape: broadcast the increment-sized
            # (pair, new-sig) side so the index signature arrays are
            # scanned, never shuffled
            cand = idx_s.join(
                F.broadcast(pair_ids.join(new_s, "new_id")), "index_id")
        else:
            cand = pair_ids.join(new_s, "new_id").join(idx_s, "index_id")
    else:
        idx_e = entries(idx, "index_id")
        small = (
            idx_e.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("band", "bh")
        )
        idx_e = idx_e.join(small, ["band", "bh"])
        new_e = entries(new, "new_id")
        cand = (
            new_e.join(idx_e, ["band", "bh"])
            .filter(F.col("new_id") != F.col("index_id"))
            .select("new_id", "index_id", "__sig_new_id",
                    "__sig_index_id")
            .dropDuplicates(["new_id", "index_id"])
        )
    n_agree = F.aggregate(
        F.zip_with(
            F.col("__sig_new_id"), F.col("__sig_index_id"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    out = (
        cand.withColumn("n_agree", n_agree.cast("int"))
        .filter(F.col("n_agree") >= F.lit(agree_min))
        .select(
            "new_id", "index_id", "n_agree",
            (F.col("n_agree") / F.lit(float(num_hashes)))
            .alias("est_jaccard"),
        )
    )
    if "fp" in index_df.columns:
        idx_fp = index_df.where(F.col("fp").isNotNull()).select(
            F.col(id_col).alias("index_id"), "fp")
        new_fp = new_df.select(
            F.col(id_col).alias("new_id"),
            F.md5(F.col(text_col)).alias("fp"),
        ).where(F.col("fp").isNotNull())
        if index_stats_df is not None:
            new_fp = F.broadcast(new_fp)
        exact = (
            new_fp.join(idx_fp, "fp")
            .filter(F.col("new_id") != F.col("index_id"))
            .select(
                "new_id", "index_id",
                F.lit(num_hashes).cast("int").alias("n_agree"),
                F.lit(1.0).alias("est_jaccard"),
            )
        )
        out = out.unionByName(exact).dropDuplicates(
            ["new_id", "index_id"])
    return out
