"""Tests for dedup (exact / Jaccard / MinHash-LSH / SimHash), similarity
search, and the docs text-analysis operators — seeded-defect style mirroring
the reference's test strategy (/root/reference/tests/test_quality_scanner.py:
85-150: inject a known defect, assert the scanner finds exactly it)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators import dedup as dd
from data_quality_spark.operators import docs as dq_docs
from data_quality_spark.operators import similarity as sim

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"
NEAR = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
OTHER = "completely different words about spark catalyst optimizer and shuffles"


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, BASE, "en", "s0"),
        (1, BASE, "en", "s0"),          # exact dup of 0
        (2, NEAR, "en", "s1"),          # near dup of 0 (1 token differs)
        (3, OTHER, "en", "s1"),
        (4, "palabras distintas sobre el mundo y la vida", "es", "s2"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_exact_dedup_stats(docs_df):
    row = dd.exact_dedup_stats(docs_df, "text").collect()[0]
    assert row.n_docs == 5
    assert row.n_unique == 4
    assert row.n_dup_extra == 1


def test_exact_dedup_keep_first(docs_df):
    kept = dd.exact_dedup_keep_first(docs_df, "text", "doc_id")
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 2, 3, 4]  # doc 1 (dup of 0) removed, lowest id wins


def test_ngram_jaccard_pairs(docs_df):
    pairs = dd.ngram_jaccard_pairs(
        docs_df, "doc_id", "text", ["lang"], threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert got[(0, 1)] == 1.0                      # exact dup
    assert (0, 2) in got and got[(0, 2)] > 0.8     # near dup
    assert (0, 3) not in got                       # dissimilar


def test_minhash_signatures_shape(docs_df):
    sigs = dd.minhash_signatures(docs_df, "doc_id", "text", num_hashes=16)
    rows = {r.doc_id: r.sig for r in sigs.collect()}
    assert len(rows) == 5 and all(len(s) == 16 for s in rows.values())
    assert rows[0] == rows[1]          # identical text → identical signature
    shared = sum(a == b for a, b in zip(rows[0], rows[2]))
    assert shared > 8                  # near dup shares most minhashes


def test_minhash_lsh_pairs(docs_df):
    pairs = dd.minhash_lsh_pairs(
        docs_df, "doc_id", "text", num_hashes=64, bands=16, verify_threshold=0.5
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) in got
    assert (0, 3) not in got and (3, 4) not in got


def test_simhash_near_pairs(docs_df):
    sigs = dd.simhash64(docs_df, "doc_id", "text")
    pairs = dd.simhash_near_pairs(sigs, "doc_id", max_hamming=10).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get((0, 1)) == 0        # identical text → identical simhash
    assert (0, 3) not in got


def test_simhash_hot_bucket_guard(spark):
    # 300 identical docs: every chunk bucket has 300 members → guard drops
    # them all (exact dedup's job), so no quadratic pair blow-up
    df = spark.createDataFrame(
        [(i, BASE) for i in range(300)], ["doc_id", "text"]
    )
    sigs = dd.simhash64(df, "doc_id", "text")
    n = dd.simhash_near_pairs(sigs, "doc_id", max_bucket_size=256).count()
    assert n == 0


@pytest.fixture(scope="module")
def vectors_df(spark):
    # vec 0/1 nearly parallel, 2 orthogonal-ish, 3 anti-parallel to 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [-1.0, 0.0, 0.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk(vectors_df):
    out = sim.cosine_topk(
        vectors_df, vectors_df.filter(F.col("vec_id") == 0), k=2
    ).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.n_id for r in ranked] == [1, 4]
    assert ranked[0].cosine > 0.99
    assert all(r.q_id == 0 for r in ranked)


def test_hyperplane_lsh_topk_finds_parallel(vectors_df):
    out = sim.hyperplane_lsh_topk(
        vectors_df, vectors_df.filter(F.col("vec_id") == 0), k=2, bits=4
    ).collect()
    # vec 1 is nearly parallel to vec 0 → same SRP bucket w.h.p. for any
    # hyperplane set; it must appear among the in-bucket neighbours
    assert any(r.n_id == 1 for r in out)


def test_token_stats_and_quality(spark):
    df = spark.createDataFrame(
        [
            (0, "one two three four five six", "en", "s"),
            (1, "short", "en", "s"),
            (2, "1 2 3 4 5 6 7 8 9 10 11 12", "de", "s"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    stats = {r.lang: r for r in dq_docs.token_stats_by_lang(df).collect()}
    assert stats["en"].n_docs == 2
    assert stats["en"].total_tokens == 7
    assert stats["de"].max_tokens == 12
    buckets = {
        (r.lang, r.quality_bucket): r.n_docs
        for r in dq_docs.quality_buckets(df).collect()
    }
    assert buckets[("en", "too_short")] == 1
    assert buckets[("de", "digit_heavy")] == 1


def test_langid_sql_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog went with me", "x", "s"),
            (1, "el perro y los gatos que veo", "x", "s"),
            (2, "zzz qqq xx yy", "x", "s"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = {r.pred_lang: r.n_docs for r in dq_docs.langid_sql(df).collect()}
    assert out.get("en") == 1
    assert out.get("es") == 1
    assert out.get("und") == 1


def test_scrub_audit_injection(spark):
    df = spark.createDataFrame(
        [(i, "hello world", "en", "s") for i in range(100)],
        ["doc_id", "text", "lang", "source"],
    )
    row = dq_docs.scrub_audit(df, inject_every=50).collect()[0]
    assert row.n_docs == 100
    assert row.n_scrubbed == 2  # doc_id 0 and 50 got the injected email


def test_winnow_fingerprints(spark):
    """Winnowing (Schleimer et al. SIGMOD'03): determinism, the coverage
    guarantee (shared run of window+k-1 tokens ⇒ shared fingerprint), and a
    differential check against the pure-Python twin."""
    from data_quality_spark.operators.dedup import winnow_fingerprints
    from data_quality_spark.oracles import _winnow_fps_one

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base + " lambda mu nu xi"),
        (2, "prefix words here " + base + " different tail words"),  # shares run
        (3, "totally unrelated content with other tokens entirely"),
        (4, "short doc"),                         # < one shingle of 5 tokens
        (5, None),                                # null text -> no fps
        (6, base + " lambda mu nu xi"),           # identical to 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", shingle_k=5, window=4)
    got: dict[int, set] = {}
    for r in fps.collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    # differential: every doc matches the pure-Python twin exactly
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == _winnow_fps_one(text, 5, 4), doc_id
    # identical docs -> identical fingerprint sets
    assert got[1] == got[6]
    # coverage: docs 1 and 2 share a 10-token run >= window+k-1 = 8 tokens
    assert got[1] & got[2]
    # unrelated doc shares nothing with doc 1
    assert not (got[1] & got[3])
    # short doc degenerates to its single whole-doc shingle hash
    assert len(got[4]) == 1


def test_ivf_topk_recall_and_determinism(spark):
    """IVF ANN: deterministic quantizer (same seed → same output) and
    useful recall of the exact top-k on a clustered corpus."""
    import numpy as np

    from data_quality_spark.operators.similarity import (
        cosine_topk,
        fit_ivf_centroids,
        ivf_topk,
    )

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 16)) * 3
    rows = [
        (int(i), (centers[i % 4] + rng.standard_normal(16) * 0.3).tolist())
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = fit_ivf_centroids(df, n_lists=4, sample=200)
    queries = df.filter("vec_id < 8")
    got = {
        (r.q_id, r.rank): r.n_id
        for r in ivf_topk(df, queries, cents, k=3, nprobe=2).collect()
    }
    again = {
        (r.q_id, r.rank): r.n_id
        for r in ivf_topk(
            df, queries, fit_ivf_centroids(df, n_lists=4, sample=200),
            k=3, nprobe=2,
        ).collect()
    }
    assert got == again  # deterministic end to end
    exact = {
        (r.q_id, r.rank): r.n_id
        for r in cosine_topk(df, queries, k=3).collect()
    }
    overlap = sum(1 for k_ in exact if got.get(k_) == exact[k_])
    # tight clusters + nprobe=2 of 4 lists: near-perfect recall expected
    assert overlap / len(exact) >= 0.9


def test_embedding_decontaminate_ground_truth(vectors_df):
    """Eval set = scaled copies of vecs 0 and 2: exactly those leak (plus
    vec 1, which is a genuine near-copy of 0 above the 0.9 threshold) and
    the hit attribution points at the right eval id."""
    evalset = (
        vectors_df.filter(F.col("vec_id").isin([0, 2]))
        .select(
            "vec_id",
            F.transform(
                F.col("embedding"), lambda x: x * F.lit(3.0)
            ).alias("embedding"),
        )
    )
    out = {
        r.vec_id: r
        for r in sim.embedding_decontaminate(
            vectors_df, evalset, threshold=0.9
        ).collect()
    }
    assert len(out) == 5  # one row per corpus vector, leak or not
    assert out[0].is_leak and out[0].best_eval_id == 0
    assert out[0].best_cosine == 1.0 and out[0].n_hits == 1
    assert out[2].is_leak and out[2].best_eval_id == 2
    # vec 1 is nearly parallel to 0 (cos ≈ 0.995) — a true semantic leak
    # that n-gram/fingerprint channels would miss
    assert out[1].is_leak and out[1].best_eval_id == 0
    assert out[1].best_cosine > 0.99
    # anti-parallel and diagonal vectors stay clean, with no best_* echo
    assert not out[3].is_leak and out[3].n_hits == 0
    assert out[3].best_eval_id is None and out[3].best_cosine is None
    assert not out[4].is_leak


def test_embedding_decontaminate_no_corpus_shuffle(vectors_df):
    """Scale-shape law: the corpus never shuffles — every join in the plan
    is broadcast (nested-loop against the eval set, hash for the tiny hit
    aggregate attach)."""
    evalset = vectors_df.filter(F.col("vec_id") == 0)
    plan = sim.embedding_decontaminate(
        vectors_df, evalset, threshold=0.5
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line and "broadcast" not in line.lower():
            # the only non-broadcast exchange permitted is the tiny
            # hits-only aggregate (rare rows), keyed on vec_id
            assert "hashpartitioning(vec_id" in line


def test_pq_topk_recall_and_code_size(spark):
    """PQ ANN (compressed-domain): codes are m ints (64x smaller than
    the vectors), codebook fit is deterministic, and ADC top-3 recall
    vs exact cosine stays useful on the test embeddings."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_quality_spark.operators.similarity import (
        PQ_M,
        cosine_topk,
        fit_pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = fit_pq_codebooks(emb)
    books2 = fit_pq_codebooks(emb)
    assert np.array_equal(books, books2)  # deterministic fit
    codes = pq_encode(emb, books).select("vec_id", "pq_code").limit(5)
    for r in codes.collect():
        assert len(r.pq_code) == PQ_M
        assert all(0 <= c < 256 for c in r.pq_code)
    queries = emb.filter(F.col("vec_id") < 10)
    approx = pq_topk(emb, queries, books, k=3).collect()
    exact = cosine_topk(emb, queries, k=3).collect()
    ex = {}
    for r in exact:
        ex.setdefault(r.q_id, set()).add(r.n_id)
    hits = sum(1 for r in approx if r.n_id in ex.get(r.q_id, set()))
    total = sum(len(v) for v in ex.values())
    assert total == 30
    assert hits / total >= 0.6, f"PQ recall@3 too low: {hits}/{total}"


class TestExactTextPairs:
    def test_chain_edges_and_null_law(self, spark):
        from data_quality_spark.operators.dedup import exact_text_pairs

        rows = [(1, "same text"), (2, "same text"), (5, "same text"),
                (3, "other"), (4, None), (6, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r["id_a"], r["id_b"]) for r in exact_text_pairs(df).collect()
        )
        # rep→member chains for the identical family; NULLs never link
        assert got == [(1, 2), (1, 5)]

    def test_replicated_family_survives_hot_lsh_guard(self, spark):
        """The identity-smoke law on the text side: a heavily replicated
        document must stay ONE cluster even when max_bucket_size drops
        every band bucket."""
        from data_quality_spark.operators import dedup as dd
        from data_quality_spark.operators.cluster import cluster_members

        base = "the quick brown fox jumps over the lazy dog " * 4
        rows = [(i, base) for i in range(30)] + [
            (100 + i, f"unique doc number {i} with its own words {i}")
            for i in range(5)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dd.exact_text_pairs(docs).unionByName(
            dd.minhash_lsh_pairs(
                docs, "doc_id", "text", verify_threshold=0.5,
                max_bucket_size=1,
            ).select("id_a", "id_b")
        )
        comp = {r["node"]: r["component"]
                for r in cluster_members(pairs).collect()}
        assert {comp[i] for i in range(30)} == {0}
