"""Audio near-duplicate detection via spectral fingerprints.

The audio twin of ``operators/dedup.py``'s MinHash-LSH: detect the SAME
recording under a different codec (pcm16 ↔ wav ↔ µ-law) or gain — the
duplicate class an audio training corpus actually contains — without ever
shipping waveforms through a shuffle.

Pipeline shape (scale-first, mirrors ``dedup.minhash_lsh_pairs``):

1. **fingerprint** — ONE ``mapInArrow`` pass decodes each clip and emits the
   packed Philips-style subfingerprint stream
   (``functions/spectral.fingerprint_i32``): int32[frames-1], 15 bits each,
   gain- and codec-invariant by construction.  The payload column dies at
   this boundary; everything downstream moves ~4 B per 16 ms of audio
   (~250 B/s vs 32 kB/s for the waveform — a 128× reduction before the
   first shuffle).
2. **candidates** — every ``window``-subfingerprint run (stride ``stride``)
   is hashed to a bucket key over the STABLE high byte of each
   subfingerprint (bands 7-14; the narrow low bands flip ~2× as often
   under lossy re-encode — see ``functions/spectral.STABLE_SHIFT``); clips
   sharing an exact (offset, window-hash) bucket are candidates.  Identical
   re-encodes agree on most frames, so they share many clean windows;
   independent content matches a 24-bit window with ~2⁻²⁴ odds (measured
   distinct-pair BER is 0.46-0.54, nowhere near colliding).  The ONLY
   shuffle is the explode → groupBy on the bucket key, with the same
   ``max_bucket_size`` hot-bucket guard as text LSH (oversized buckets =
   degenerate content, e.g. all-silence; dropped, callers dedup those
   exactly instead).  At 10¹²-clip scale, widen ``window`` (each extra
   subfingerprint adds 8 bucket-key bits) exactly as one widens LSH bands.
3. **verify** — candidate pairs join their fingerprint streams back and
   compute the bit error rate over the overlapping prefix
   (``bit_count(a XOR b)`` summed JVM-side); pairs with
   ``ber <= ber_max`` are emitted.  No Python in this stage.

At 10¹² clips: stage 1 is embarrassingly parallel, stage 2 shuffles
fingerprints (not audio) with bucket-size-bounded quadratic work, stage 3
touches only candidates.  No all-pairs path exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.spectral import (
    N_BANDS,
    STABLE_MASK,
    STABLE_SHIFT,
    fingerprint_i32,
)
from .cluster import digest_chain_pairs  # noqa: F401 - re-exported

__all__ = [
    "clip_fingerprints",
    "ber_col",
    "digest_chain_pairs",
    "fingerprint_exact_pairs",
    "fingerprint_hot_buckets",
    "fingerprint_near_dup",
    "build_audio_index",
    "audio_index_entries",
    "audio_index_bucket_stats",
    "audio_probe_index",
    "fingerprint_shift_match",
    "clip_landmarks",
    "landmark_match",
    "audio_decontaminate",
]


def fingerprint_exact_pairs(fp_df: DataFrame,
                            id_col: str = "clip_id") -> DataFrame:
    """Exact-content edges: clips whose ENTIRE fingerprint sequence is
    identical, linked representative→member — (id_a, id_b) with
    id_a = the family's min id.

    Why this exists beside the LSH path: exact re-uploads are the
    dominant duplicate class at web scale, and a family of k exact
    copies makes EVERY byte-window bucket it touches k× hotter — at
    high replica density the hot-bucket guard (``max_bucket_size``)
    starts dropping those buckets and the LSH path silently loses the
    very pairs that are cheapest to find (measured: 10× replication of
    the 100k bench corpus left 4.8% of replica families split across
    train/val until this pre-pass existed —
    ``scripts/cluster_split_prune_scale_smoke.py``).  The digest
    groupBy emits k−1 chain edges per family (never quadratic), the
    shuffle carries an 8-byte digest + id, and the closure unions these
    with the near-dup pairs, so LSH bucket heat can no longer break
    EXACT identity.  Near-dup recall at hot spots remains guard-
    bounded by design (surfaced as data via the hot-bucket reports).
    """
    slim = fp_df.filter(F.size("fp") > 0).select(
        F.col(id_col).alias("__id"),
        # 8-byte content digest: xxhash64 over the full subfingerprint
        # array (HashExpression folds arrays element-wise)
        F.xxhash64(F.col("fp")).alias("__d"),
    )
    return digest_chain_pairs(slim)


def _fp_bucket_entries(fp_df: DataFrame, window: int,
                       stride: int) -> DataFrame:
    """(__id, off, bh): the fingerprint LSH bucket-key emission shared
    by the candidate join and the hot-bucket report.  Buckets key on
    the stable high byte of each subfingerprint (cast to long so
    xxhash64 folds with the same element width the pure-Python oracle
    twin reproduces)."""
    keyed = fp_df.filter(F.size("fp") >= window).select(
        F.col("clip_id").alias("__id"),
        F.transform(
            "fp",
            lambda v: F.shiftright(v, STABLE_SHIFT)
            .bitwiseAND(F.lit(STABLE_MASK))
            .cast("long"),
        ).alias("__sb"),
    )
    n_win = ((F.size("__sb") - window) / stride).cast("int")
    return keyed.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_win),
                lambda i: F.struct(
                    i.alias("off"),
                    F.xxhash64(
                        F.slice("__sb", i * stride + 1, window)
                    ).alias("bh"),
                ),
            )
        ).alias("e"),
    ).select("__id", "e.off", "e.bh")


def fingerprint_hot_buckets(
    fp_df: DataFrame,
    window: int = 3,
    stride: int = 1,
    max_bucket_size: int = 64,
) -> DataFrame:
    """(off, bh, n_members): the fingerprint buckets the hot-bucket
    guard SKIPPED — the content-axis twin of
    ``audio_channel.hot_buckets``.  A populated row names an (offset,
    window-hash) family whose members were never candidate-paired by
    the LSH path, so NEAR-dup recall inside it is zero (EXACT identity
    is safe regardless — ``fingerprint_exact_pairs`` / the payload
    digest own it).  Empty on a healthy corpus; hold-music, test
    tones, and heavy replication populate it.  One aggregate over the
    shared bucket-key emission.  ``n_members`` IS the per-bucket clip
    count: ``_fp_bucket_entries`` emits exactly one entry per clip per
    offset, so entries and distinct clips coincide by construction."""
    entries = _fp_bucket_entries(fp_df, window, stride)
    return (
        entries.groupBy("off", "bh")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .where(F.col("n_members") > max_bucket_size)
    )


def clip_fingerprints(
    df: DataFrame, counter=None, shuffle: bool = True
) -> DataFrame:
    """(clip_id, n_frames, fp array<int>) via one Arrow pass; bytes dropped.

    ``counter`` mirrors ``pipeline.featurize``'s execute-once hook.

    ``shuffle`` (default on) ends the stage with a repartition on clip_id.
    Two scale reasons: (a) ``fingerprint_near_dup`` references this relation
    four times (bucket entries, bucket-size guard, and both verify sides) —
    without an Exchange above the MapInArrow, Catalyst re-executes the
    decode+FFT per reference (measured: FOUR MapInArrow nodes in the plan);
    with it, ReuseExchange collapses them to one executed stage.  (b) the
    shuffle moves fingerprints (~250 B/s of audio), not payloads, and
    decouples downstream join parallelism from the payload file splits."""
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("fp", T.ArrayType(T.IntegerType()), True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16

        _EMPTY_PCM = np.zeros(0, dtype=np.int16)
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            fps, nfr = [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    x = _EMPTY_PCM
                fp = fingerprint_i32(x)
                fps.append(fp.tolist())
                nfr.append(len(fp))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(nfr, type=pa.int32()),
                    pa.array(fps, type=pa.list_(pa.int32())),
                ],
                names=["clip_id", "n_frames", "fp"],
            )

    out = df.mapInArrow(run, out_schema)
    if shuffle:
        par = df.sparkSession.sparkContext.defaultParallelism
        out = out.repartition(par, "clip_id")
    return out


def ber_col(fa: str, fb: str):
    """Aligned-prefix fingerprint bit-error rate — the ONE definition of
    the audio-identity verify law (used by fingerprint_near_dup and the
    transcript-blocked cross-modal verifier; their tested verdict parity
    depends on the expression being literally shared)."""
    n = F.least(F.size(fa), F.size(fb))
    diff_bits = F.aggregate(
        F.zip_with(
            F.slice(fa, 1, n),
            F.slice(fb, 1, n),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return diff_bits.cast("double") / (
        F.lit(float(N_BANDS - 1)) * n.cast("double")
    )


def fingerprint_near_dup(
    fp_df: DataFrame,
    window: int = 3,
    stride: int = 1,
    ber_max: float = 0.30,
    max_bucket_size: int = 64,
    materialize: bool = True,
) -> DataFrame:
    """Near-duplicate clip pairs from a ``clip_fingerprints`` relation.

    Returns (id_a, id_b, ber) with id_a < id_b, ``ber`` the fraction of
    differing fingerprint bits over the overlapping prefix (0 = identical
    audio).  ``window``/``stride`` trade candidate recall against bucket
    volume exactly like LSH band width; the defaults (three stable bytes
    per bucket key, every offset) recovered 100% of µ-law re-encodes and
    every PCM-family re-encode on the measured corpus, with distinct-pair
    BER ≥ 0.46 against the 0.30 cut.

    ``materialize`` persists ``fp_df`` (MEMORY_AND_DISK) before the DAG
    references it four times (bucket entries, bucket-size guard, both
    verify sides).  Without it the fingerprint stage — i.e. the full
    decode+FFT over every payload byte — re-executes per divergently-pruned
    reference (accumulator-measured: 4× unpersisted/unshuffled, 2× with
    only the exchange-reuse shuffle, 1× persisted).  Fingerprints are
    ~250 B per second of audio, so the cache is ~0.8% of corpus size; at a
    scale where even that doesn't fit, write the fingerprint relation to a
    table and pass the scan in with ``materialize=False``.  The caller may
    ``unpersist()`` the input after collecting results."""
    if materialize:
        from pyspark.storagelevel import StorageLevel

        fp_df = fp_df.persist(StorageLevel.MEMORY_AND_DISK)
    entries = _fp_bucket_entries(fp_df, window, stride)
    small = (
        entries.groupBy("off", "bh")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") > 1) & (F.col("__bn") <= max_bucket_size))
        .select("off", "bh")
    )
    pruned = entries.join(small, ["off", "bh"])
    cand = (
        pruned.select("off", "bh", F.col("__id").alias("id_a"))
        .join(
            pruned.select("off", "bh", F.col("__id").alias("id_b")),
            ["off", "bh"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    fps = fp_df.select(F.col("clip_id").alias("__vid"), F.col("fp").alias("__vf"))
    ber = ber_col("__fa", "__fb")
    n = F.least(F.size("__fa"), F.size("__fb"))
    return (
        cand.join(fps.select(F.col("__vid").alias("id_a"), F.col("__vf").alias("__fa")), "id_a")
        .join(fps.select(F.col("__vid").alias("id_b"), F.col("__vf").alias("__fb")), "id_b")
        .filter(n > 0)
        .withColumn("ber", ber)
        .filter(F.col("ber") <= F.lit(ber_max))
        .select("id_a", "id_b", "ber")
    )


def build_audio_index(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, n_frames, fp, fp_digest): the stored audio near-dup
    index — the audio analog of ``dedup.build_lsh_index``.  A daily
    dedup job stores this relation (~250 B per second of audio, 3
    orders smaller than payloads) and appends the survivors' rows;
    indexed AUDIO is never decoded again.  ``fp_digest`` (xxhash64 of
    the fingerprint array; NULL for empty fingerprints) is the
    exact-identity key, so identical re-uploads under new ids probe by
    digest equi-join regardless of bucket heat."""
    fps = clip_fingerprints(df, counter=counter)
    return fps.withColumn(
        "fp_digest",
        F.when(F.size("fp") > 0, F.xxhash64(F.col("fp"))),
    )


def audio_index_entries(index_df: DataFrame, window: int = 3,
                        stride: int = 1) -> DataFrame:
    """(index_id, off, bh): a stored index's bucket-key relation —
    write it beside the index (it only ever grows by appending the
    survivors' keys) and pass it to ``audio_probe_index`` so a probe
    joins stored keys directly instead of re-deriving O(corpus
    fingerprints) of them per run — the at-scale seam."""
    return _fp_bucket_entries(
        index_df.select(F.col("clip_id"), "fp"), window, stride
    ).select(F.col("__id").alias("index_id"), "off", "bh")


def audio_index_bucket_stats(entries_df: DataFrame) -> DataFrame:
    """(off, bh, n_members): per-bucket population of a stored entries
    relation — write it beside the index and pass it to
    ``audio_probe_index`` so the hot-bucket guard reads a stored
    ~#buckets relation instead of re-aggregating O(index entries) per
    probe.  Appends to the index re-aggregate (or merge-add) this
    relation in the same job that appends the entries."""
    return entries_df.groupBy("off", "bh").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"))


def audio_probe_index(
    new_df: DataFrame,
    index_df: DataFrame,
    window: int = 3,
    stride: int = 1,
    ber_max: float = 0.30,
    max_bucket_size: int = 64,
    counter=None,
    index_entries_df: DataFrame | None = None,
    index_stats_df: DataFrame | None = None,
) -> DataFrame:
    """Incremental audio near-dup: NEW clips probed against a STORED
    fingerprint index — the increment is the only audio decoded.

    Returns (new_id, index_id, ber), one row per (new, indexed)
    near-duplicate pair.  The law mirrors ``dedup.lsh_probe_index``:

    - new fingerprints are computed (ONE mapInArrow decode pass — the
      increment's only payload scan); the index side re-derives its
      bucket keys from the STORED fp arrays (fingerprint bytes, never
      audio — at a scale where even that rescan hurts, pass the stored
      (off, bh) entry relation via ``index_entries_df``);
    - candidates are NEW×INDEX bucket collisions on the shared
      ``_fp_bucket_entries`` key law — a join against the index keys,
      never an index self-join; ``max_bucket_size`` guards by
      INDEX-side population (the side whose size is known up front);
    - verify is the shared ``ber_col`` law over the stored arrays
      (zero decode);
    - exact identity rides ``fp_digest`` when the index carries it
      (``build_audio_index`` writes it): identical fingerprints pair
      at ber 0.0 regardless of bucket heat — the
      exact-never-depends-on-bucket-heat law, incremental-audio form.
      Same-id re-ingests are excluded (re-ingest is exact dedup's
      job).  Indexes stored without the column keep working.

    Probe-cost shape (the claim the 1M smoke measures,
    ``scripts/incremental_probe_scale_smoke.py``): the hot-bucket
    guard is an ANTI-join against the bucket list EXCEEDING
    ``max_bucket_size`` — tiny by definition, so it broadcasts — and
    the candidate join broadcasts the INCREMENT's keys, so the index
    entry relation is scanned once and never shuffled; with
    ``index_stats_df`` (``audio_index_bucket_stats``, stored beside
    the index) the per-probe bucket-size aggregate disappears too.
    The increment must be bounded (it is the broadcast side) — chunk
    oversized backfills into probe-sized pieces.
    """
    new_fps = clip_fingerprints(new_df, counter=counter).persist()
    idx = index_df
    idx_e = (index_entries_df if index_entries_df is not None
             else audio_index_entries(idx, window, stride))
    new_e = _fp_bucket_entries(new_fps, window, stride).select(
        F.col("__id").alias("new_id"), "off", "bh"
    )
    if index_stats_df is not None:
        # stored-index scale shape: the guard is an ANTI-join against
        # the (tiny, by definition) hot-bucket list from the STORED
        # stats, and the candidate join broadcasts the increment's
        # keys — the entry relation is scanned once, never shuffled,
        # and no per-probe aggregate runs over it
        hot = index_stats_df.filter(
            F.col("n_members") > max_bucket_size).select("off", "bh")
        idx_e = idx_e.join(F.broadcast(hot), ["off", "bh"], "left_anti")
        joined = idx_e.join(F.broadcast(new_e), ["off", "bh"])
    else:
        # hint-free shape for ad-hoc and per-micro-batch probes:
        # Catalyst/AQE pick the strategy (forced broadcasts inside a
        # foreachBatch hang the stream-execution thread in local mode)
        small = (
            idx_e.groupBy("off", "bh")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_bucket_size)
            .select("off", "bh")
        )
        joined = new_e.join(idx_e.join(small, ["off", "bh"]),
                            ["off", "bh"])
    cand = (
        joined
        .filter(F.col("new_id") != F.col("index_id"))
        .select("new_id", "index_id")
        .distinct()
    )
    new_v = new_fps.select(
        F.col("clip_id").alias("new_id"), F.col("fp").alias("__fa"))
    idx_v = idx.select(
        F.col("clip_id").alias("index_id"), F.col("fp").alias("__fb"))
    n = F.least(F.size("__fa"), F.size("__fb"))
    if index_stats_df is not None:
        # scale shape, verify stage: the (pair, new-fp) side is
        # increment-sized — broadcast it so the index fp arrays (the
        # index's dominant bytes) are scanned, never shuffled (the 1M
        # smoke measured 600 MB of shuffle here before this hint)
        verify_in = idx_v.join(
            F.broadcast(cand.join(new_v, "new_id")), "index_id")
    else:
        verify_in = cand.join(new_v, "new_id").join(idx_v, "index_id")
    out = (
        verify_in
        .filter(n > 0)
        .withColumn("ber", ber_col("__fa", "__fb"))
        .filter(F.col("ber") <= F.lit(ber_max))
        .select("new_id", "index_id", "ber")
    )
    if "fp_digest" in idx.columns:
        new_d = new_fps.filter(F.size("fp") > 0).select(
            F.col("clip_id").alias("new_id"),
            F.xxhash64(F.col("fp")).alias("fp_digest"),
        )
        idx_d = idx.where(F.col("fp_digest").isNotNull()).select(
            F.col("clip_id").alias("index_id"), "fp_digest"
        )
        if index_stats_df is not None:
            matched = idx_d.join(F.broadcast(new_d), "fp_digest")
        else:
            matched = new_d.join(idx_d, "fp_digest")
        exact = (
            matched
            .filter(F.col("new_id") != F.col("index_id"))
            .select("new_id", "index_id", F.lit(0.0).alias("ber"))
        )
        out = out.unionByName(exact).dropDuplicates(
            ["new_id", "index_id"])
    # materialize, then release the fingerprint cache: stream_probe_index
    # calls this once per micro-batch, so a dangling persist would
    # accumulate in executor storage for the life of the stream
    out = out.localCheckpoint(eager=True)
    new_fps.unpersist()
    return out


def fingerprint_shift_match(
    fp_df: DataFrame,
    window: int = 3,
    stride: int = 1,
    ber_max: float = 0.30,
    max_bucket_size: int = 64,
    min_votes: int = 2,
    min_overlap: int = 8,
    materialize: bool = True,
) -> DataFrame:
    """Offset-tolerant duplicate detection: clip b is a (hop-aligned)
    excerpt of clip a, or the two share a shifted overlap — trims, splits,
    and concatenation edits rather than whole-clip re-encodes.

    Same bucket construction as ``fingerprint_near_dup`` but keyed on the
    window hash ALONE (offset becomes payload, not key): two clips sharing
    window content at ANY offset pair become a candidate with a proposed
    alignment ``shift = off_a - off_b``.  A vote stage keeps, per pair, the
    shift proposed by the most independent windows (``max_by``; ties break
    to the smaller shift for determinism, ``min_votes`` kills one-window
    coincidences), then ONE JVM-side pass verifies the bit error rate over
    the aligned overlap (≥ ``min_overlap`` frames).

    Alignment granularity is the analysis hop (128 samples = 8 ms at
    16 kHz): excerpts cut at arbitrary sample offsets decorrelate the
    frame grid, so recovering them needs a denser hop (the standard
    Haitsma-Kalker densification), not a different algorithm — documented
    limitation, hop is a ``functions.spectral`` constant.

    Scale shape: identical to the aligned path (bucket explode → guarded
    self-join → tiny vote aggregate → verify join); the only new shuffle is
    the vote groupBy on (id_a, id_b) pairs, which is candidate-sized.
    Returns (id_a, id_b, shift, votes, overlap, ber)."""
    if materialize:
        from pyspark.storagelevel import StorageLevel

        fp_df = fp_df.persist(StorageLevel.MEMORY_AND_DISK)
    keyed = fp_df.filter(F.size("fp") >= window).select(
        F.col("clip_id").alias("__id"),
        F.transform(
            "fp",
            lambda v: F.shiftright(v, STABLE_SHIFT)
            .bitwiseAND(F.lit(STABLE_MASK))
            .cast("long"),
        ).alias("__sb"),
    )
    n_win = ((F.size("__sb") - window) / stride).cast("int")
    entries = keyed.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_win),
                lambda i: F.struct(
                    (i * stride).alias("off"),
                    F.xxhash64(
                        F.slice("__sb", i * stride + 1, window)
                    ).alias("bh"),
                ),
            )
        ).alias("e"),
    ).select("__id", "e.off", "e.bh")
    small = (
        entries.groupBy("bh")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") > 1) & (F.col("__bn") <= max_bucket_size))
        .select("bh")
    )
    pruned = entries.join(small, ["bh"])
    votes = (
        pruned.select("bh", F.col("__id").alias("id_a"), F.col("off").alias("__oa"))
        .join(
            pruned.select(
                "bh", F.col("__id").alias("id_b"), F.col("off").alias("__ob")
            ),
            ["bh"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("__oa") - F.col("__ob")).alias("shift"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = (
        votes.groupBy("id_a", "id_b")
        .agg(
            F.max_by(
                F.struct("shift", "votes"),
                # most votes; ties -> smallest |shift|, then larger shift
                F.struct(
                    F.col("votes").alias("v"),
                    (-F.abs(F.col("shift"))).alias("t"),
                    F.col("shift").alias("s"),
                ),
            ).alias("b")
        )
        .select("id_a", "id_b", F.col("b.shift").alias("shift"),
                F.col("b.votes").alias("votes"))
        .filter(F.col("votes") >= F.lit(min_votes))
    )
    fps = fp_df.select(F.col("clip_id").alias("__vid"), F.col("fp").alias("__vf"))
    s = F.col("shift")
    la, lb = F.size("__fa"), F.size("__fb")
    # fp_a[i + shift] aligns with fp_b[i]
    a_start = F.greatest(s, F.lit(0))            # 0-based
    b_start = F.greatest(-s, F.lit(0))
    m = F.least(la - a_start, lb - b_start)
    diff_bits = F.aggregate(
        F.zip_with(
            F.slice("__fa", a_start + 1, m),
            F.slice("__fb", b_start + 1, m),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ber = diff_bits.cast("double") / (F.lit(float(N_BANDS - 1)) * m.cast("double"))
    return (
        best.join(
            fps.select(F.col("__vid").alias("id_a"), F.col("__vf").alias("__fa")),
            "id_a",
        )
        .join(
            fps.select(F.col("__vid").alias("id_b"), F.col("__vf").alias("__fb")),
            "id_b",
        )
        .filter(m >= F.lit(min_overlap))
        .withColumn("overlap", m)
        .withColumn("ber", ber)
        .filter(F.col("ber") <= F.lit(ber_max))
        .select("id_a", "id_b", "shift", "votes", "overlap", "ber")
    )


def clip_landmarks(df: DataFrame, counter=None) -> DataFrame:
    """(clip_id, n_landmarks, lm array<struct<h:int, t1:int>>) via one
    Arrow pass; bytes dropped (same boundary discipline as
    ``clip_fingerprints``).  ``h`` is the packed Shazam-style (f1, f2, dt)
    peak-pair hash, ``t1`` the anchor frame — see
    ``functions.spectral.constellation_landmarks``."""
    in_names = [f.name for f in df.schema.fields]
    col_idx = {name: i for i, name in enumerate(in_names)}
    lm_type = T.ArrayType(
        T.StructType(
            [T.StructField("h", T.IntegerType()),
             T.StructField("t1", T.IntegerType())]
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType(), False),
            T.StructField("n_landmarks", T.IntegerType(), True),
            T.StructField("lm", lm_type, True),
        ]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        from ..functions.audio import _decode_i16
        from ..functions.spectral import constellation_landmarks

        _EMPTY_PCM = np.zeros(0, dtype=np.int16)
        pa_lm = pa.list_(
            pa.struct([("h", pa.int32()), ("t1", pa.int32())])
        )
        for batch in batches:
            ids = batch.column(col_idx["clip_id"]).to_pylist()
            payloads = batch.column(col_idx["bytes"])
            codecs = batch.column(col_idx["codec"]).to_pylist()
            srs = batch.column(col_idx["sr_hz"]).to_pylist()
            if counter is not None:
                counter.add(batch.num_rows)
            lms, nlm = [], []
            for i in range(batch.num_rows):
                buf = payloads[i].as_buffer() if payloads[i].is_valid else None
                try:
                    x = _decode_i16(buf, codecs[i], srs[i])
                except (ValueError, TypeError):
                    x = _EMPTY_PCM
                hs, ts = constellation_landmarks(x)
                lms.append(
                    [{"h": int(h), "t1": int(t)} for h, t in zip(hs, ts)]
                )
                nlm.append(len(hs))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, type=pa.string()),
                    pa.array(nlm, type=pa.int32()),
                    pa.array(lms, type=pa_lm),
                ],
                names=["clip_id", "n_landmarks", "lm"],
            )

    out = df.mapInArrow(run, out_schema)
    par = df.sparkSession.sparkContext.defaultParallelism
    return out.repartition(par, "clip_id")


def landmark_match(
    lm_df: DataFrame,
    min_votes: int = 45,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Arbitrary-offset duplicate detection via constellation-hash voting
    (Wang, ISMIR'03): clips sharing ``min_votes``+ landmark hashes at ONE
    consistent frame-offset delta are duplicates/excerpts of each other —
    no alignment assumption at all, because the hash carries no absolute
    time and the vote is on ``t1_a - t1_b``.

    Complements ``fingerprint_shift_match`` (which needs hop-aligned cuts):
    landmarks survive arbitrary sample offsets since peak FREQUENCIES
    persist across frames and the ±1-frame time jitter folds into adjacent
    offset bins, never splitting the winning bin's majority.

    A true match's offset is generally FRACTIONAL in frames, splitting its
    votes across two adjacent integer bins, while coincidental matches of
    stationary tones spread votes uniformly over every offset — so each
    bin is scored as its own votes plus its best neighbour's (``votes`` in
    the output).  On the synthetic corpus — adversarial for this scheme,
    being pure stationary sinusoids — the paired score separates cleanly
    (true ≥ 52, coincidence ≤ 41); real audio's transients widen the gap.

    Scale shape: explode landmarks → self-join keyed on the hash value
    (``max_bucket_size`` guards degenerate hashes) → count votes per
    (pair, offset) → two tiny self-joins for neighbour pairing → ``max_by``
    keeps each pair's best offset.  Shuffles move (hash, t1) pairs — ~8
    bytes per landmark, ~30 landmarks/s of audio.
    Returns (id_a, id_b, offset_frames, votes)."""
    # entries feeds the bucket-count guard AND both self-join sides, and
    # the vote relation feeds itself plus two neighbour projections —
    # without persists every consumer re-runs the decode+landmark
    # mapInArrow (measured: 12 scans in the executed plan).  Both
    # relations are slim (~8 bytes/landmark, ~30 landmarks/s of audio).
    entries = lm_df.filter(F.size("lm") > 0).select(
        F.col("clip_id").alias("__id"),
        F.explode("lm").alias("e"),
    ).select("__id", "e.h", "e.t1").persist()
    small = (
        entries.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter((F.col("__bn") > 1) & (F.col("__bn") <= max_bucket_size))
        .select("h")
    )
    pruned = entries.join(small, ["h"])
    votes = (
        pruned.select("h", F.col("__id").alias("id_a"), F.col("t1").alias("__ta"))
        .join(
            pruned.select(
                "h", F.col("__id").alias("id_b"), F.col("t1").alias("__tb")
            ),
            ["h"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy(
            "id_a", "id_b", (F.col("__ta") - F.col("__tb")).alias("offset_frames")
        )
        .agg(F.count(F.lit(1)).alias("__v"))
        .persist()
    )
    # paired score via two linear equi-joins: each bin sees the vote count
    # of offset-1 and offset+1 (missing neighbour -> 0)
    def _nb(delta: int, name: str) -> DataFrame:
        return votes.select(
            "id_a", "id_b",
            (F.col("offset_frames") + delta).alias("offset_frames"),
            F.col("__v").alias(name),
        )

    paired = (
        votes.join(_nb(1, "__vm"), ["id_a", "id_b", "offset_frames"], "left")
        .join(_nb(-1, "__vp"), ["id_a", "id_b", "offset_frames"], "left")
        .withColumn(
            "votes",
            F.col("__v")
            + F.greatest(
                F.coalesce("__vm", F.lit(0)), F.coalesce("__vp", F.lit(0))
            ),
        )
    )
    return (
        paired.groupBy("id_a", "id_b")
        .agg(
            F.max_by(
                F.struct("offset_frames", "votes"),
                # best paired score; ties -> smallest |offset|, then larger
                F.struct(
                    F.col("votes").alias("v"),
                    (-F.abs(F.col("offset_frames"))).alias("t"),
                    F.col("offset_frames").alias("s"),
                ),
            ).alias("b")
        )
        .select(
            "id_a", "id_b",
            F.col("b.offset_frames").alias("offset_frames"),
            F.col("b.votes").alias("votes"),
        )
        .filter(F.col("votes") >= F.lit(min_votes))
    )


def audio_decontaminate(
    corpus_fp: DataFrame,
    eval_fp: DataFrame,
    *,
    window: int = 3,
    stride: int = 1,
    ber_max: float = 0.30,
) -> DataFrame:
    """Eval-set leakage removal for AUDIO: flag corpus clips whose
    fingerprints near-match ANY eval-set clip — the waveform analog of
    the text pipeline's n-gram benchmark decontamination
    (``quality_filters.decontaminate``), robust to the codec/gain
    re-encodes that would defeat an exact-bytes check.

    Returns one row per corpus clip: (clip_id, contaminated, n_matches,
    min_ber) — ``min_ber`` NULL when clean.  Downstream drops with a
    trivial filter, keeping the evidence relation queryable.

    Scale shape: the eval set is the small side by construction
    (benchmarks are thousands of clips, the corpus 10^12), so its bucket
    entries AND its fingerprints broadcast — the corpus side stays a
    fingerprint map plus two broadcast joins with NO corpus shuffle at
    all; corpus payload bytes never leave their stage.  Unlike the
    self-join path there is no bucket-size>1 requirement (a lone eval
    entry must still catch its copy) and no skew guard is needed on the
    broadcast side.
    """
    def entries(fp_df: DataFrame, idname: str) -> DataFrame:
        keyed = fp_df.filter(F.size("fp") >= window).select(
            F.col("clip_id").alias(idname),
            F.transform(
                "fp",
                lambda v: F.shiftright(v, STABLE_SHIFT)
                .bitwiseAND(F.lit(STABLE_MASK))
                .cast("long"),
            ).alias("__sb"),
        )
        n_win = ((F.size("__sb") - window) / stride).cast("int")
        return keyed.select(
            idname,
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_win),
                    lambda i: F.struct(
                        i.alias("off"),
                        F.xxhash64(
                            F.slice("__sb", i * stride + 1, window)
                        ).alias("bh"),
                    ),
                )
            ).alias("e"),
        ).select(idname, "e.off", "e.bh")

    cand = (
        entries(corpus_fp, "__cid")
        .join(F.broadcast(entries(eval_fp, "__eid").distinct()),
              ["off", "bh"])
        .select("__cid", "__eid")
        .distinct()
    )
    cfp = corpus_fp.select(F.col("clip_id").alias("__cid"),
                           F.col("fp").alias("__fa"))
    efp = eval_fp.select(F.col("clip_id").alias("__eid"),
                         F.col("fp").alias("__fb"))
    n = F.least(F.size("__fa"), F.size("__fb"))
    diff_bits = F.aggregate(
        F.zip_with(
            F.slice("__fa", 1, n),
            F.slice("__fb", 1, n),
            lambda a, b: F.bit_count(a.bitwiseXOR(b)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    ber = diff_bits.cast("double") / (
        F.lit(float(N_BANDS - 1)) * n.cast("double")
    )
    matches = (
        cand.join(cfp, "__cid")
        .join(F.broadcast(efp), "__eid")
        .filter(n > 0)
        .withColumn("__ber", ber)
        .filter(F.col("__ber") <= F.lit(ber_max))
        .groupBy("__cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matches"),
             F.min("__ber").alias("__minber"))
    )
    return (
        corpus_fp.select("clip_id")
        .join(matches.withColumnRenamed("__cid", "clip_id"),
              "clip_id", "left")
        .select(
            "clip_id",
            F.coalesce(F.col("n_matches") > 0, F.lit(False))
            .alias("contaminated"),
            F.coalesce("n_matches", F.lit(0).cast("long"))
            .alias("n_matches"),
            F.col("__minber").alias("min_ber"),
        )
    )
