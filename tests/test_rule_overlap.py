"""Filter-redundancy matrix: pair-count law on constructed flag
relations, Jaccard fixed-point exactness (incl. the subset and disjoint
and identical cases), zero-denominator guard, single-aggregate plan
shape, and the query's seeded overlap structure."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.rule_overlap import JACCARD_SCALE, rule_overlap


def _mat(spark, rows, cols):
    df = spark.createDataFrame(rows, ["doc_id"] + cols)
    return {
        (r["rule_a"], r["rule_b"]): r
        for r in rule_overlap(df, cols).collect()
    }


def test_pair_counts_and_jaccard(spark):
    rows = [
        (1, True, True, False),
        (2, True, False, False),
        (3, True, True, False),
        (4, False, False, False),
    ]
    m = _mat(spark, rows, ["a", "b", "c"])
    ab = m[("a", "b")]
    assert (ab["n_a"], ab["n_b"], ab["n_both"]) == (3, 2, 2)
    assert ab["jaccard_q"] == (2 * JACCARD_SCALE) // 3  # subset: 2/3
    ac = m[("a", "c")]
    assert ac["n_both"] == 0 and ac["jaccard_q"] == 0  # disjoint
    bc = m[("b", "c")]
    assert bc["jaccard_q"] == 0  # c never fires → denom = n_b, both = 0


def test_identical_rules_jaccard_one(spark):
    rows = [(i, i % 2 == 0, i % 2 == 0) for i in range(10)]
    m = _mat(spark, rows, ["x", "y"])
    assert m[("x", "y")]["jaccard_q"] == JACCARD_SCALE


def test_zero_denominator_guard(spark):
    rows = [(1, False, False)]
    m = _mat(spark, rows, ["x", "y"])
    assert m[("x", "y")]["jaccard_q"] == 0


def test_single_aggregate_plan(spark):
    """One partial/final aggregate pair; the matrix never shuffles rows."""
    df = spark.createDataFrame([(1, True, False)], ["doc_id", "a", "b"])
    plan = rule_overlap(df, ["a", "b"])._jdf.queryExecution() \
        .executedPlan().toString()
    # exactly one exchange: the single-row partial->final aggregate merge
    assert plan.count("Exchange") <= 2, plan


def test_query_structure(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["rule_overlap"](spark, sf_dir).collect()
    assert len(rows) == 21  # C(7,2)
    m = {(r["rule_a"], r["rule_b"]): r for r in rows}
    # injected floods are one giant word: mean_word_len fires on every
    # entropy-flagged doc → both entropy classes are strict subsets
    lo = m[("fail_mean_word_len", "is_low_entropy")]
    assert lo["n_both"] == lo["n_b"] > 0
    hi = m[("fail_mean_word_len", "is_high_entropy")]
    assert hi["n_both"] == hi["n_b"] > 0
    # the two entropy classes are disjoint by construction
    d = m[("is_low_entropy", "is_high_entropy")]
    assert d["n_both"] == 0
