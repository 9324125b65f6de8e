"""Linear quality scorer laws: feature math on hand-built docs, empty-doc
totality, weight-sign behavior, and integer-exact rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.quality_model import (
    LEN_CAP,
    WEIGHTS,
    quality_score,
    quality_score_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # natural prose: stopwords present, few digits/specials → keep
        (1, "the quick brown fox jumps over the lazy dog and runs", "en"),
        # digit flood → strongly negative
        (2, "4532 9981 2210 8876 0045 1123 9087 6654 3321 0098", "en"),
        # symbol soup → special fraction dominates
        (3, "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) ___", "en"),
        # empty / null: score is the bias alone, never an error
        (4, "", "en"),
        (5, None, "en"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_scores_and_keep(spark, docs):
    rows = {r["doc_id"]: r for r in quality_score(docs).collect()}
    assert rows[1]["q_keep"] is True
    assert rows[2]["q_keep"] is False
    assert rows[3]["q_keep"] is False
    # empty and null docs score exactly the bias: every fraction guard
    # yields 0.0 and f_len is 0
    b = WEIGHTS[0]
    assert rows[4]["q_score"] == pytest.approx(b)
    assert rows[5]["q_score"] == pytest.approx(b)


def test_feature_math_exact(spark):
    """One doc with hand-countable features reproduces the exact chain."""
    text = "the cat sat on 12 mats!"
    df = spark.createDataFrame(
        [(1, text, "en")], "doc_id int, text string, lang string"
    )
    got = quality_score(df).first()["q_score"]
    from data_quality_spark.operators.quality_model import _ALL_STOPWORDS

    toks = text.lower().split()
    nt = len(toks)
    ns = sum(1 for t in toks if t in _ALL_STOPWORDS)
    nc = len(text)
    nd = sum(ch.isdigit() for ch in text)
    nsp = sum(
        1 for ch in text
        if not (ch.isascii() and (ch.isalnum() or ch in " \t\n\r"))
        and not ("À" <= ch <= "ÿ")
    )
    assert nt == 6 and nc == len(text)
    b, w_stop, w_len, w_digit, w_special = WEIGHTS
    want = (
        (((b + (w_stop * (ns / nt))) + (w_len * (min(nt, LEN_CAP) / float(LEN_CAP))))
         + (w_digit * (nd / nc)))
        + (w_special * (nsp / nc))
    )
    assert got == want  # bit-identical: same IEEE chain


def test_stats_rollup(spark, docs):
    stats = {r["lang"]: r for r in quality_score_stats(docs).collect()}
    assert stats["en"]["n_docs"] == 5
    keeps = sum(
        1 for r in quality_score(docs).collect() if r["q_keep"]
    )
    assert stats["en"]["n_keep"] == keeps


def test_no_shuffle_scoring_plan(spark, docs):
    plan = (
        quality_score(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # one scan, map-side only


class TestScoreBuckets:
    def _corpus(self, spark, n=30):
        # n docs per lang with strictly increasing stopword mass → strictly
        # ordered scores (no score ties, so bucket assignment is forced)
        rows = []
        for lang in ("en", "de"):
            for i in range(n):
                text = " ".join(["the"] * (i + 1) + ["zzz"] * (n - i))
                rows.append((len(rows), text, lang))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )

    def test_ntile_populations_and_labels(self, spark):
        from data_quality_spark.operators.quality_model import score_buckets

        out = score_buckets(self._corpus(spark)).collect()
        for lang in ("en", "de"):
            per = [r for r in out if r.lang == lang]
            sizes = {b: sum(1 for r in per if r.bucket_idx == b)
                     for b in (1, 2, 3)}
            assert sizes == {1: 10, 2: 10, 3: 10}
            # head outscores middle outscores tail, per language
            lo = {b: min(r.q_score for r in per if r.bucket_idx == b)
                  for b in (1, 2, 3)}
            hi = {b: max(r.q_score for r in per if r.bucket_idx == b)
                  for b in (1, 2, 3)}
            assert lo[1] >= hi[2] and lo[2] >= hi[3]
        labels = {r.bucket_idx: r.bucket for r in out}
        assert labels == {1: "head", 2: "middle", 3: "tail"}

    def test_tie_law_is_id_deterministic(self, spark):
        from data_quality_spark.operators.quality_model import score_buckets

        # four identical docs → identical scores; ntile must split 2/1/1
        # in doc_id order
        df = spark.createDataFrame(
            [(i, "same text here", "en") for i in range(4)],
            "doc_id long, text string, lang string",
        )
        got = {r.doc_id: r.bucket_idx
               for r in score_buckets(df).collect()}
        assert got == {0: 1, 1: 1, 2: 2, 3: 3}

    def test_cutoff_scale_path_matches_interior(self, spark):
        from data_quality_spark.operators.quality_model import (
            bucket_by_cutoffs,
            learn_cutoffs,
            score_buckets,
        )

        corpus = self._corpus(spark)
        cuts = learn_cutoffs(corpus)
        assert set(cuts) == {"en", "de"} and all(
            b[0] > b[1] for b in cuts.values()
        )
        exact = {r.doc_id: r.bucket_idx
                 for r in score_buckets(corpus).collect()}
        approx = {r.doc_id: r.bucket_idx
                  for r in bucket_by_cutoffs(corpus, cuts).collect()}
        # boundary docs may straddle (sketch semantics: the learned
        # boundary score itself lands on the head side of <); everything
        # else agrees
        diff = [d for d in exact if exact[d] != approx[d]]
        assert len(diff) <= 4  # ≤ one doc per boundary per lang
        for d in diff:
            assert abs(exact[d] - approx[d]) == 1

    def test_cutoff_path_has_no_exchange(self, spark):
        from data_quality_spark.operators.quality_model import (
            bucket_by_cutoffs,
        )

        corpus = self._corpus(spark)
        plan = (
            bucket_by_cutoffs(corpus, {"en": [0.5, 0.0], "de": [0.4, -0.1]})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestTrainedClassifier:
    """fit_quality_weights / score_with_weights / classifier_report."""

    def test_train_logistic_learns_separable(self):
        from data_quality_spark.operators.quality_model import train_logistic

        # y = 1 iff f0 > 0.5 — trivially separable on one feature
        rows = [
            (i, 1 if f > 0.5 else 0, (f, 0.0, 0.0, 0.0))
            for i, f in enumerate([0.1, 0.2, 0.3, 0.4, 0.6, 0.7, 0.8, 0.9])
        ]
        w = train_logistic(rows, iters=500, lr=2.0)
        assert w[1] > 0  # positive weight on the separating feature
        for _i, y, x in rows:
            z = w[0] + sum(w[j + 1] * x[j] for j in range(4))
            assert (z > 0) == bool(y)

    def test_train_logistic_deterministic_and_order_free(self):
        from data_quality_spark.operators.quality_model import train_logistic

        rows = [
            (3, 1, (0.9, 0.2, 0.0, 0.1)),
            (1, 0, (0.1, 0.8, 0.3, 0.0)),
            (2, 1, (0.7, 0.1, 0.2, 0.0)),
        ]
        w1 = train_logistic(rows, iters=50)
        w2 = train_logistic(list(reversed(rows)), iters=50)
        assert w1 == w2  # spec sorts by id: input order irrelevant

    def test_fit_and_report_end_to_end(self, spark):
        from data_quality_spark.operators.quality_filters import gopher_flags
        from data_quality_spark.operators.quality_model import (
            classifier_report,
            fit_quality_weights,
            score_with_weights,
        )

        docs = spark.createDataFrame(
            [
                (i, ("the and that is " * 20).strip())
                if i % 2 == 0
                else (i, "#### ### ##")
                for i in range(40)
            ],
            "doc_id long, text string",
        )
        flagged = gopher_flags(docs)
        w = fit_quality_weights(flagged, "gopher_pass", sample_n=40, iters=200)
        w2 = fit_quality_weights(flagged, "gopher_pass", sample_n=40, iters=200)
        assert w == w2  # bit-deterministic across runs
        scored = score_with_weights(flagged, w)
        got = {r["doc_id"]: r["clf_keep"] for r in scored.collect()}
        # perfectly separable two-template corpus: classifier = labels
        labels = {r["doc_id"]: r["gopher_pass"] for r in flagged.collect()}
        assert got == labels
        rep = {r["metric"]: r["value"] for r in
               classifier_report(flagged, "gopher_pass", w).collect()}
        assert rep["n"] == 40.0
        assert rep["tp"] + rep["fp"] + rep["fn"] + rep["tn"] == rep["n"]
        assert rep["fp"] == 0.0 and rep["fn"] == 0.0

    def test_scoring_plan_has_no_exchange_or_python(self, spark):
        from data_quality_spark.operators.quality_model import (
            score_with_weights,
        )

        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string"
        )
        plan = (
            score_with_weights(docs, (0.1, 1.0, -1.0, 0.5, 0.0))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_calibration_curve(self, spark):
        from data_quality_spark.operators.quality_filters import gopher_flags
        from data_quality_spark.operators.quality_model import (
            classifier_calibration,
            fit_quality_weights,
        )

        # graded corpus: stopword mass (and thus score) rises with i
        docs = spark.createDataFrame(
            [
                (i, ("the and that is " * (3 + i) + "xq zk " * (40 - i)).strip())
                for i in range(40)
            ],
            "doc_id long, text string",
        )
        flagged = gopher_flags(docs)
        w = fit_quality_weights(flagged, "gopher_pass", sample_n=40)
        cal = classifier_calibration(flagged, "gopher_pass", w, n_buckets=4)
        rows = cal.collect()
        assert [r["bucket"] for r in rows] == [1, 2, 3, 4]
        assert sum(r["n_docs"] for r in rows) == 40
        # buckets ordered best-first: min_score of bucket b >= max of b+1
        for a, b in zip(rows, rows[1:]):
            assert a["min_score"] >= b["max_score"]
        # pass counts reconcile with the corpus label total
        total_pass = sum(r["n_pass"] for r in rows)
        labels = flagged.collect()
        assert total_pass == sum(1 for r in labels if r["gopher_pass"])
        for r in rows:
            assert r["pass_rate"] == r["n_pass"] / r["n_docs"]

    def test_gate_distill_composition(self, spark):
        """Text-only classifier trained on the audio gate's labels: must
        reconcile with the gate keep count and stay conservative enough
        to be useful (no catastrophic keep loss on the seeded corpus)."""
        from pyspark.sql import functions as F

        import __spark_entry__ as e
        from data_quality_spark.operators.quality_model import (
            classifier_report,
            fit_quality_weights,
        )
        from data_quality_spark.pipeline import gate

        slim = (
            gate(e._clips_df(spark, n=300))
            .select(
                "clip_id",
                "transcript",
                (F.col("decision") == F.lit("keep")).alias("keep"),
            )
            .persist()
        )
        n_keep = slim.filter("keep").count()
        w = fit_quality_weights(
            slim, "keep", id_col="clip_id", text_col="transcript"
        )
        rep = {r["metric"]: r["value"] for r in classifier_report(
            slim, "keep", w, text_col="transcript").collect()}
        slim.unpersist()
        assert rep["n"] == 300.0
        assert rep["tp"] + rep["fn"] == float(n_keep)
        # prefilter property: keep recall stays high (text features are a
        # subset of the gate's own transcript signals)
        assert rep["tp"] / (rep["tp"] + rep["fn"]) >= 0.95


def test_bucket_by_cutoffs_unknown_group_is_unknown(spark):
    """A group absent from the learned cutoffs (or NULL) must NOT land
    in 'head' silently (regression)."""
    from data_quality_spark.operators.quality_model import bucket_by_cutoffs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en"),
         (2, "ein neuer unbewerteter text ohne cutoffs", "xx"),
         (3, "texte sans groupe", None)],
        "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in bucket_by_cutoffs(
        docs, {"en": [0.2, 0.8]}).collect()}
    assert out[1]["bucket"] in ("head", "middle", "tail")
    assert out[2]["bucket"] == "unknown" and out[2]["bucket_idx"] is None
    assert out[3]["bucket"] == "unknown"
