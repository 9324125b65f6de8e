"""Robust outlier audit (operators/outliers.py).

Correctness model: the lower-median/MAD law must equal a plain-Python
replay (odd AND even group sizes), the fence must be the exact integer
cross-multiplication, NULLs are never outliers, MAD-0 groups flag
exactly the non-median values, and the relation is deterministic under
repartitioning.
"""

from __future__ import annotations

import pytest

from data_quality_spark.operators.outliers import (
    robust_outlier_audit,
    robust_outlier_flags,
)


def _py_law(rows, k_num=5, k_den=1):
    """(value, id) rows of ONE group -> (med, mad, {id: flag})."""
    vals = sorted((v, i) for i, v in rows if v is not None)
    med = vals[(len(vals) + 1) // 2 - 1][0]
    devs = sorted((abs(v - med), i) for v, i in vals)
    mad = devs[(len(devs) + 1) // 2 - 1][0]
    flags = {i: abs(v - med) * k_den > k_num * mad for v, i in vals}
    flags.update({i: False for i, v in rows if v is None})
    return med, mad, flags


class TestRobustOutliers:
    def test_matches_python_law_odd_and_even(self, spark):
        rows = [
            # group a: odd size with one wild value
            (0, "a", 10), (1, "a", 12), (2, "a", 11), (3, "a", 9),
            (4, "a", 500),
            # group b: even size + a NULL
            (5, "b", 100), (6, "b", 101), (7, "b", 99), (8, "b", 4000),
            (9, "b", None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, g string, v long")
        got = {r["doc_id"]: r for r in robust_outlier_flags(
            df, "v", by=["g"], id_col="doc_id").collect()}
        for g in ("a", "b"):
            grp = [(i, v) for i, gg, v in rows if gg == g]
            med, mad, flags = _py_law(grp)
            for i, v in grp:
                r = got[i]
                assert r["is_outlier"] == flags[i], (g, i)
                if v is not None:
                    assert (r["med"], r["mad"]) == (med, mad)
                else:
                    assert r["med"] is None and not r["is_outlier"]

    def test_audit_summary(self, spark):
        rows = [(i, "x", 10) for i in range(9)] + [(9, "x", 10000),
                                                   (10, "x", None)]
        df = spark.createDataFrame(rows, "doc_id long, g string, v long")
        a = robust_outlier_audit(df, "v", by=["g"], id_col="doc_id")
        r = a.collect()[0]
        assert (r["n"], r["n_null"]) == (11, 1)
        assert (r["med"], r["mad"]) == (10, 0)
        # MAD 0: exactly the non-median values flag
        assert r["n_outliers"] == 1 and r["worst"] == 9990

    def test_partitioning_invariance_and_global_group(self, spark):
        import random

        rng = random.Random(3)
        rows = [(i, rng.randrange(50, 70)) for i in range(200)]
        rows += [(500 + j, 100000 + j) for j in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, v long")
        a = robust_outlier_audit(df, "v", by=(), id_col="doc_id").collect()
        b = robust_outlier_audit(
            df.repartition(13), "v", by=(), id_col="doc_id").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert a[0]["n_outliers"] == 3
