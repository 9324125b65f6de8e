"""Incremental dedup (anti-join against a fingerprint index) contract."""

from __future__ import annotations

import pytest
from pyspark.sql import Row


@pytest.mark.usefixtures("spark")
class TestDedupAgainstIndex:
    def test_known_content_dropped_new_content_kept(self, spark):
        from data_quality_spark.operators.dedup import (
            build_dedup_index,
            dedup_against_index,
        )

        history = spark.createDataFrame(
            [Row(doc_id=1, text="alpha"), Row(doc_id=2, text="beta")])
        index = build_dedup_index(history)
        new = spark.createDataFrame(
            [Row(doc_id=10, text="alpha"),   # already indexed → dropped
             Row(doc_id=11, text="gamma"),   # new → kept
             Row(doc_id=12, text="beta"),    # already indexed → dropped
             Row(doc_id=13, text=None)])     # NULL text → always kept
        out = dedup_against_index(new, index).toPandas()
        assert sorted(out["doc_id"]) == [11, 13]
        # survivors keep their full original rows
        assert set(out.columns) == {"doc_id", "text"}

    def test_index_is_distinct_and_null_free(self, spark):
        from data_quality_spark.operators.dedup import build_dedup_index

        history = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in
             enumerate(["x", "x", "y", None, "y"])])
        idx = build_dedup_index(history).toPandas()
        assert len(idx) == 2  # x, y once each; NULL contributes nothing
        assert idx["fp"].notna().all()

    def test_growing_index_converges(self, spark):
        """The incremental loop: survivors' fingerprints append to the
        index; replaying the same batch then yields zero survivors with
        non-NULL text."""
        from pyspark.sql import functions as F

        from data_quality_spark.operators.dedup import (
            build_dedup_index,
            dedup_against_index,
        )

        batch = spark.createDataFrame(
            [Row(doc_id=i, text=f"doc {i % 7}") for i in range(20)])
        index = build_dedup_index(spark.createDataFrame(
            [Row(doc_id=0, text="doc 0")]))
        first = dedup_against_index(batch, index)
        grown = index.unionByName(build_dedup_index(first)).distinct()
        second = dedup_against_index(batch, grown)
        assert second.filter(F.col("text").isNotNull()).count() == 0


class TestLshProbeIndex:
    """Incremental NEAR-dup against a stored signature index."""

    def _docs(self, spark):
        rows = []
        for i in range(40):
            base = f"alpha beta gamma delta epsilon zeta eta theta doc{i}"
            rows.append((i, base))
        # odd near-dups of even docs: same text, one token changed
        for i in range(0, 40, 4):
            rows.append((100 + i + 1,  # odd id
                         f"alpha beta gamma delta epsilon zeta eta theta doc{i}x"))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_probe_equals_batch_cross_slice(self, spark):
        # the contract: with the guard wide open, probe pairs == the
        # (new x indexed) slice of the batch banded candidates over the
        # union, verified by the same signature-agreement law
        from data_quality_spark.operators.dedup import (
            _banded_candidates,
            build_lsh_index,
            lsh_probe_index,
            minhash_signatures,
        )
        from pyspark.sql import functions as F

        docs = self._docs(spark)
        idx_docs = docs.filter("doc_id % 2 = 0")
        new_docs = docs.filter("doc_id % 2 = 1")
        got = {
            (r["new_id"], r["index_id"])
            for r in lsh_probe_index(
                new_docs, build_lsh_index(idx_docs),
                max_bucket_size=10**6, agree_threshold=0.5,
            ).collect()
        }
        sigs = {
            r["doc_id"]: r["sig"]
            for r in minhash_signatures(docs, "doc_id", "text").collect()
        }
        keyed = minhash_signatures(docs, "doc_id", "text").select(
            F.col("doc_id").alias("__id"), F.col("sig").alias("__sig"))
        batch = _banded_candidates(keyed, 16, 4, 10**6).collect()
        want = set()
        for r in batch:
            a, b = r["id_a"], r["id_b"]
            if (a % 2) == (b % 2):
                continue  # same side: not a cross pair
            new, old = (a, b) if a % 2 == 1 else (b, a)
            n_agree = sum(1 for x, y in zip(sigs[new], sigs[old]) if x == y)
            if n_agree >= 32:
                want.add((new, old))
        assert got == want and len(got) > 0

    def test_reingest_same_id_excluded(self, spark):
        from data_quality_spark.operators.dedup import (
            build_lsh_index,
            lsh_probe_index,
        )

        docs = self._docs(spark)
        index = build_lsh_index(docs)
        # probing the corpus against itself: identical ids never pair,
        # but true near-dups still surface
        pairs = lsh_probe_index(docs, index, max_bucket_size=10**6).collect()
        assert all(r["new_id"] != r["index_id"] for r in pairs)
        assert len(pairs) > 0

    def test_index_side_bucket_guard(self, spark):
        from data_quality_spark.operators.dedup import (
            build_lsh_index,
            lsh_probe_index,
        )

        # 30 identical indexed docs form one hot bucket per band.  On a
        # LEGACY index (no fp column) the guard drops the bucket and
        # nothing pairs — the pre-exact-law behavior, still honored for
        # stored indexes that predate the digest column:
        rows = [(2 * i, "the same boilerplate text in every document")
                for i in range(30)]
        rows.append((99, "the same boilerplate text in every document"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        index = build_lsh_index(docs.filter("doc_id % 2 = 0"))
        new = docs.filter("doc_id % 2 = 1")
        legacy = index.drop("fp")
        assert lsh_probe_index(new, legacy, max_bucket_size=10).count() == 0
        open_ = lsh_probe_index(new, legacy, max_bucket_size=100)
        assert open_.count() == 30
        # identical text -> full signature agreement
        assert all(r["n_agree"] == 64 for r in open_.collect())
        # with the stored digest, EXACT identity no longer depends on
        # bucket heat: the guarded probe still pairs every identical doc
        # at (num_hashes, 1.0) via the fp equi-join
        exact = lsh_probe_index(new, index, max_bucket_size=10)
        got = exact.collect()
        assert len(got) == 30
        assert all(r["n_agree"] == 64 and r["est_jaccard"] == 1.0
                   for r in got)


def test_cross_source_dup_matrix(spark):
    """Copies collapse to distinct contents; NULLs never match; only
    cross-source sharing counts."""
    from data_quality_spark.operators.dedup import cross_source_dup_matrix

    rows = [
        # content X in A (3 copies) and B (2 copies) -> counts ONCE
        (1, "X", "A"), (2, "X", "A"), (3, "X", "A"),
        (4, "X", "B"), (5, "X", "B"),
        # content Y in A and C
        (6, "Y", "A"), (7, "Y", "C"),
        # content Z only within B (twice) -> no cross row
        (8, "Z", "B"), (9, "Z", "B"),
        # NULLs everywhere -> never match
        (10, None, "A"), (11, None, "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in cross_source_dup_matrix(df).collect()}
    assert got == {("A", "B"): 1, ("A", "C"): 1}


class TestSimhashProbeIndex:
    def test_exact_law_survives_hot_buckets_and_cross_only(self, spark):
        """Equal signatures pair at hamming 0 even when every chunk
        bucket is dropped; within-increment pairs never appear."""
        from data_quality_spark.operators.dedup import simhash_probe_index

        idx = spark.createDataFrame(
            [(i, 0x1234567890ABCDEF) for i in range(20)]
            + [(100, 0x0F0F0F0F0F0F0F0F)],
            "doc_id long, simhash long",
        )
        new = spark.createDataFrame(
            [(201, 0x1234567890ABCDEF), (202, 0x1234567890ABCDEF),
             (203, 0x7777777777777777)],
            "doc_id long, simhash long",
        )
        got = simhash_probe_index(new, idx, max_bucket_size=0).collect()
        by_new = {}
        for r in got:
            by_new.setdefault(r["new_id"], []).append(
                (r["index_id"], r["hamming"]))
        # both identical new docs match all 20 identical index docs at 0
        assert len(by_new[201]) == 20 and len(by_new[202]) == 20
        assert all(h == 0 for pairs in by_new.values()
                   for _, h in pairs)
        # no new×new pair, no unrelated match
        assert 202 not in [i for i, _ in by_new.get(201, [])]
        assert 203 not in by_new

    def test_banded_near_match_under_guard(self, spark):
        from data_quality_spark.operators.dedup import simhash_probe_index

        base = 0x1234567890ABCDEF
        idx = spark.createDataFrame(
            [(1, base)], "doc_id long, simhash long")
        new = spark.createDataFrame(
            [(2, base ^ 0b101)],  # hamming 2
            "doc_id long, simhash long")
        got = simhash_probe_index(new, idx).collect()
        assert [(r["new_id"], r["index_id"], r["hamming"])
                for r in got] == [(2, 1, 2)]


def test_stored_entries_equal_derived(spark, tmp_path):
    """The at-scale seam: probing with a STORED bucket-key relation
    (audio_index_entries / simhash_index_entries written beside the
    index) is row-identical to the per-probe derivation."""
    from pyspark.sql import functions as F

    from data_quality_spark.operators.audio_dedup import (
        audio_index_entries,
        audio_probe_index,
        build_audio_index,
    )
    from data_quality_spark.operators.dedup import (
        simhash_index_entries,
        simhash_probe_index,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_dup_corpus

    pdf = make_audio_dup_corpus(80, seed=7)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)
    par = F.pmod(F.xxhash64("clip_id"), F.lit(2))
    idx_clips, new_clips = clips.where(par == 0), clips.where(par == 1)
    index = build_audio_index(idx_clips)
    ents_path = str(tmp_path / "entries")
    audio_index_entries(index).write.parquet(ents_path)
    stored_entries = spark.read.parquet(ents_path)
    derived = sorted(map(tuple, audio_probe_index(
        new_clips, index).collect()))
    stored = sorted(map(tuple, audio_probe_index(
        new_clips, index, index_entries_df=stored_entries).collect()))
    assert derived == stored and len(derived) > 0

    # stored bucket STATS (the zero-per-probe-aggregate scale shape:
    # broadcast hot anti-join + broadcast increment) — same rows again
    from data_quality_spark.operators.audio_dedup import (
        audio_index_bucket_stats,
    )

    stats_path = str(tmp_path / "stats")
    audio_index_bucket_stats(stored_entries).write.parquet(stats_path)
    with_stats = sorted(map(tuple, audio_probe_index(
        new_clips, index, index_entries_df=stored_entries,
        index_stats_df=spark.read.parquet(stats_path)).collect()))
    assert with_stats == derived

    sig_idx = spark.createDataFrame(
        [(1, 0x1234567890ABCDEF), (2, 0x0F0F0F0F0F0F0F0F)],
        "doc_id long, simhash long")
    sig_new = spark.createDataFrame(
        [(9, 0x1234567890ABCDEC)], "doc_id long, simhash long")
    d2 = sorted(map(tuple, simhash_probe_index(sig_new, sig_idx).collect()))
    s2 = sorted(map(tuple, simhash_probe_index(
        sig_new, sig_idx,
        index_entries_df=simhash_index_entries(sig_idx)).collect()))
    assert d2 == s2 and len(d2) == 1
    from data_quality_spark.operators.dedup import (
        simhash_index_bucket_stats,
    )

    ents2 = simhash_index_entries(sig_idx)
    st2 = sorted(map(tuple, simhash_probe_index(
        sig_new, sig_idx, index_entries_df=ents2,
        index_stats_df=simhash_index_bucket_stats(ents2)).collect()))
    assert st2 == d2


def test_lsh_stored_entries_and_stats_equal_derived(spark, tmp_path):
    """Minhash probe: derived == stored-entries == stored-stats paths,
    including the exact-fp join and a hot-bucket guard that actually
    trims (boilerplate family over the guard size)."""
    from data_quality_spark.operators.dedup import (
        build_lsh_index,
        lsh_index_bucket_stats,
        lsh_index_entries,
        lsh_probe_index,
    )

    idx_rows = [(i, f"alpha beta gamma delta{i % 7} epsilon zeta eta")
                for i in range(60)]
    # a 40-strong identical-text family: its band buckets exceed the
    # guard, so only the digest path may pair into it
    idx_rows += [(100 + i, "copy pasta boiler plate text here")
                 for i in range(40)]
    index_docs = spark.createDataFrame(idx_rows, "doc_id long, text string")
    new_docs = spark.createDataFrame(
        [(900, "alpha beta gamma delta3 epsilon zeta eta"),
         (901, "copy pasta boiler plate text here"),
         (902, "completely unrelated content nothing shared")],
        "doc_id long, text string")
    index = build_lsh_index(index_docs)
    ents_path = str(tmp_path / "lsh_entries")
    lsh_index_entries(index).write.parquet(ents_path)
    ents = spark.read.parquet(ents_path)
    stats = lsh_index_bucket_stats(ents)

    kw = dict(max_bucket_size=16)
    derived = sorted(map(tuple, lsh_probe_index(
        new_docs, index, **kw).collect()))
    stored = sorted(map(tuple, lsh_probe_index(
        new_docs, index, index_entries_df=ents, **kw).collect()))
    with_stats = sorted(map(tuple, lsh_probe_index(
        new_docs, index, index_entries_df=ents, index_stats_df=stats,
        **kw).collect()))
    assert derived == stored == with_stats and len(derived) > 0
    # the exact family pairs rode the digest join despite hot buckets
    assert sum(1 for r in derived if r[0] == 900) >= 1
    assert sum(1 for r in derived if r[0] == 901) == 40
    assert not any(r[0] == 902 for r in derived)
