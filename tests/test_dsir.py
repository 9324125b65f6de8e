"""DSIR importance weighting: selection pressure toward the target
distribution, fold determinism under repartitioning, and edge cases."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.dsir import (
    bucket_counts,
    dsir_log_weights,
    dsir_select,
    learn_log_ratio_weights,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # target speaks "alpha beta gamma"; raw mixes that with "noise junk"
    target_rows = [(i, "alpha beta gamma alpha beta") for i in range(20)]
    raw_rows = [
        (100 + i, "alpha beta gamma alpha beta" if i % 2 == 0
         else "noise junk filler noise junk")
        for i in range(40)
    ] + [(999, None), (998, "   ")]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    return target, raw


def test_targetlike_docs_outweigh_noise(spark, corpora):
    target, raw = corpora
    w = dsir_log_weights(raw, target=target)
    rows = {r["doc_id"]: r["log_w"] for r in w.collect()}
    target_like = [v for k, v in rows.items() if 100 <= k < 140 and k % 2 == 0]
    noise = [v for k, v in rows.items() if 100 <= k < 140 and k % 2 == 1]
    assert min(target_like) > max(noise)


def test_empty_and_null_docs_score_zero(spark, corpora):
    target, raw = corpora
    w = {r["doc_id"]: r for r in dsir_log_weights(raw, target=target).collect()}
    for d in (998, 999):
        assert w[d]["n_grams"] == 0
        assert w[d]["log_w"] == 0.0


def test_fold_bitstable_under_repartition(spark, corpora):
    target, raw = corpora
    ws = learn_log_ratio_weights(target, raw)
    a = dsir_log_weights(raw, weights=ws).collect()
    b = dsir_log_weights(raw.repartition(7), weights=ws).collect()
    assert sorted((r["doc_id"], r["log_w"]) for r in a) == sorted(
        (r["doc_id"], r["log_w"]) for r in b
    )


def test_bucket_counts_total(spark, corpora):
    target, _ = corpora
    # 20 docs x (5 unigrams + 4 bigrams) = 180 grams
    total = sum(r["cnt"] for r in bucket_counts(target).collect())
    assert total == 180


def test_select_deterministic_and_gumbel(spark, corpora):
    target, raw = corpora
    # exclude the empty/NULL docs: their log_w is exactly 0 ("looks like
    # raw"), which legitimately outranks negative-weight noise docs
    w = dsir_log_weights(raw, target=target).where("n_grams > 0")
    top = dsir_select(w, k=10).collect()
    assert len(top) == 10
    # all deterministic top-10 are target-like
    assert all(r["doc_id"] % 2 == 0 and r["doc_id"] < 140 for r in top)
    noisy = dsir_select(w, k=10, gumbel_seed=7).collect()
    assert len(noisy) == 10
    again = dsir_select(w, k=10, gumbel_seed=7).collect()
    assert sorted(r["doc_id"] for r in noisy) == sorted(
        r["doc_id"] for r in again
    )


def test_weights_validation(spark, corpora):
    _, raw = corpora
    with pytest.raises(ValueError):
        dsir_log_weights(raw)
    with pytest.raises(ValueError):
        dsir_log_weights(raw, weights=[0.0] * 5)


def test_sliced_learning_matches_two_pass(spark, corpora):
    import pyspark.sql.functions as F

    from data_quality_spark.operators.dsir import (
        learn_log_ratio_weights,
        learn_log_ratio_weights_sliced,
    )

    target, raw = corpora
    union = raw.withColumn("is_t", F.lit(False)).unionByName(
        target.withColumn("is_t", F.lit(True))
    )
    two_pass = learn_log_ratio_weights(target, union.drop("is_t"))
    one_pass = learn_log_ratio_weights_sliced(union, F.col("is_t"))
    assert one_pass == two_pass  # bit-identical doubles
