"""Cross-corpus bottom-k overlap sketches.

Property style: when k covers the whole shingle space the estimator IS
the exact Jaccard (the sketch degenerates to the full set), a contained
corpus measures containment 1.0, and disjoint corpora measure 0 — the
estimator's behaviour at the exactness boundary pins the union-rank
accounting.  The sampling-error regime is pinned by the driver oracle
(corpus_overlap at sf0.01 hash-checks estimate AND exact side by side).
The sketch plan must carry Spark 4's WindowGroupLimit (per-partition
partial top-k) — the property that makes a 10^12-doc corpus reduce to
k int64s without a full sort.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.corpus_overlap import (
    corpus_overlap,
    corpus_sketch,
    shingle_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "corpus string, text string")


class TestSketch:
    def test_bottom_k_is_k_smallest_distinct(self, spark):
        df = _docs(spark, [("a", f"w{i} w{i + 1} w{i + 2} w{i + 3}")
                           for i in range(40)])
        hashes = shingle_hashes(df)
        all_h = sorted({r.h for r in hashes.collect()})
        got = sorted(r.h for r in corpus_sketch(hashes, k=10).collect())
        assert got == all_h[:10]

    def test_plan_uses_window_group_limit(self, spark):
        df = _docs(spark, [("a", "x y z w"), ("b", "p q r s")])
        plan = corpus_sketch(shingle_hashes(df), k=8)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestEstimator:
    def test_exact_at_full_coverage(self, spark):
        # k >> distinct shingles: estimator must EQUAL the exact value
        rows = [("a", f"t{i} t{i + 1} t{i + 2} t{i + 3} t{i + 4}")
                for i in range(0, 30, 2)]
        rows += [("b", f"t{i} t{i + 1} t{i + 2} t{i + 3} t{i + 4}")
                 for i in range(20, 50, 2)]
        out = corpus_overlap(_docs(spark, rows), k=100_000,
                             with_exact=True).collect()
        assert len(out) == 1
        r = out[0]
        assert r.jaccard_est_r == r.jaccard_exact_r
        assert r.abs_err_r == 0.0
        assert 0.0 < r.jaccard_est_r < 1.0

    def test_contained_corpus(self, spark):
        texts = [f"u{i} u{i + 1} u{i + 2} u{i + 3} u{i + 4} u{i + 5}"
                 for i in range(0, 60, 3)]
        rows = [("a", t) for t in texts] + [("b", t) for t in texts[:7]]
        r = corpus_overlap(_docs(spark, rows), k=100_000,
                           with_exact=True).collect()[0]
        assert r.contain_b_in_a_r == 1.0
        assert r.jaccard_est_r == r.jaccard_exact_r < 1.0

    def test_disjoint_corpora(self, spark):
        rows = [("a", "m1 m2 m3 m4 m5"), ("b", "z1 z2 z3 z4 z5")]
        r = corpus_overlap(_docs(spark, rows), k=64,
                           with_exact=True).collect()[0]
        assert r.inter_k == 0
        assert r.jaccard_est_r == 0.0 == r.jaccard_exact_r

    def test_three_corpora_pairs(self, spark):
        rows = [("a", "c1 c2 c3 c4"), ("b", "c1 c2 c3 c4"),
                ("c", "d1 d2 d3 d4")]
        out = corpus_overlap(_docs(spark, rows), k=64).collect()
        got = {(r.ca, r.cb): r for r in out}
        assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
        assert got[("a", "b")].jaccard_est_r == 1.0
        assert got[("a", "c")].jaccard_est_r == 0.0

    def test_short_doc_whole_text_shingle(self, spark):
        # a 2-token doc still contributes one shingle
        rows = [("a", "hi there"), ("b", "hi there")]
        r = corpus_overlap(_docs(spark, rows), k=64).collect()[0]
        assert r.union_k == 1 and r.inter_k == 1
        assert r.jaccard_est_r == 1.0


class TestMerge:
    def test_merged_increment_sketches_equal_full_sketch(self, spark):
        from data_quality_spark.operators.corpus_overlap import (
            merge_sketches,
        )

        rows = [("a", f"v{i} v{i + 1} v{i + 2} v{i + 3} v{i + 4}")
                for i in range(60)]
        full = _docs(spark, rows)
        day1 = _docs(spark, rows[:25])
        day2 = _docs(spark, rows[25:])
        k = 16
        want = sorted(
            (r.corpus, r.h)
            for r in corpus_sketch(shingle_hashes(full), k).collect()
        )
        got = sorted(
            (r.corpus, r.h)
            for r in merge_sketches(
                [corpus_sketch(shingle_hashes(day1), k),
                 corpus_sketch(shingle_hashes(day2), k)], k
            ).collect()
        )
        assert got == want
