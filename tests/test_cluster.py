"""Connected components + duplicate resolution.

Correctness model: the star algorithm's fixed point must equal the closure
an independent union-find computes, on adversarial shapes — long chains
(where naive label propagation needs diameter rounds), stars, cliques, and
random graphs — and the result must be invariant to input partitioning and
edge orientation.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.cluster import (
    cluster_members,
    connected_components,
    resolve_duplicates,
)


def _uf(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _got(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_long_chain(self, spark):
        # diameter 59: label propagation would need ~59 rounds; the star
        # algorithm must close it within the O(log n) budget
        pairs = [(i, i + 1) for i in range(59)]
        got = _got(spark, pairs)
        assert got == {i: 0 for i in range(60)}

    def test_two_cliques_and_a_bridgeless_star(self, spark):
        pairs = (
            [(a, b) for a in range(5) for b in range(a + 1, 5)]
            + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
            + [(100, x) for x in (101, 102, 103)]
        )
        got = _got(spark, pairs)
        want = _uf(pairs)
        assert got == want
        assert set(got.values()) == {0, 10, 100}

    def test_random_graph_vs_union_find(self, spark):
        rng = random.Random(7)
        nodes = list(range(0, 400, 3))  # non-contiguous ids
        pairs = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(180)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _got(spark, pairs) == _uf(pairs)

    def test_orientation_and_partitioning_invariance(self, spark):
        pairs = [(i, i + 1) for i in range(30)] + [(50, 31), (31, 30)]
        flipped = [(b, a) for a, b in pairs]
        df = spark.createDataFrame(flipped, "id_a long, id_b long")
        a = {r["node"]: r["component"]
             for r in connected_components(df).collect()}
        b = {r["node"]: r["component"]
             for r in connected_components(df.repartition(13)).collect()}
        assert a == b == _uf(pairs)

    def test_nonconvergence_raises(self, spark):
        df = spark.createDataFrame(
            [(i, i + 1) for i in range(59)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(df, max_rounds=1)


class TestClusterMembers:
    def test_sizes(self, spark):
        pairs = [(1, 2), (2, 3), (10, 11)]
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["node"]: (r["component"], r["cluster_size"])
            for r in cluster_members(df).collect()
        }
        assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3),
                       10: (10, 2), 11: (10, 2)}


class TestResolve:
    def test_longest_text_wins_ties_to_min_id(self, spark):
        docs = spark.createDataFrame(
            [(1, "aa"), (2, "aaaa"), (3, "aaaa"), (10, "z"), (11, "zz"),
             (99, "untouched")],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
        )
        out = resolve_duplicates(docs, "doc_id", pairs).collect()
        keep = {r["doc_id"]: r["keep"] for r in out}
        # 2 and 3 tie on length 4 -> min id 2 wins; 11 beats 10 on length
        assert keep == {1: False, 2: True, 3: False, 10: False, 11: True}
        # unclustered docs are absent (kept unconditionally by the caller)
        assert 99 not in keep

    def test_custom_preference(self, spark):
        docs = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 1.0)], "doc_id long, score double"
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
        out = resolve_duplicates(
            docs, "doc_id", pairs, prefer=F.col("score")
        ).collect()
        assert {r["doc_id"]: r["keep"] for r in out} == {
            1: False, 2: True, 3: False}


class TestSplitByCluster:
    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(i, f"text {i}", "en", "s") for i in range(n)],
            "doc_id long, text string, lang string, source string",
        )

    def _pairs(self, spark):
        # two chains: 0-1-2 and 10-11; plus isolated pair 20-21
        return spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11), (20, 21)], "id_a long, id_b long"
        )

    def test_no_pair_straddles_the_split(self, spark):
        from data_quality_spark.operators.cluster import split_by_cluster

        got = split_by_cluster(
            self._docs(spark), "doc_id", self._pairs(spark), 0.5, seed=3
        )
        by_id = {r["doc_id"]: r["split"] for r in got.collect()}
        for a, b in [(0, 1), (1, 2), (0, 2), (10, 11), (20, 21)]:
            assert by_id[a] == by_id[b], (a, b)

    def test_portable_twin_and_singleton_stability(self, spark):
        import hashlib

        from data_quality_spark.operators.cluster import split_by_cluster
        from data_quality_spark.operators.sampling import (
            fraction_threshold_hex,
        )

        docs = self._docs(spark)
        got = {
            r["doc_id"]: r["split"]
            for r in split_by_cluster(
                docs, "doc_id", self._pairs(spark), 0.3, seed=7
            ).collect()
        }
        comp = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 20: 20, 21: 20}
        th = fraction_threshold_hex(0.3)
        for did in range(60):
            rep = str(comp.get(did, did))
            want = (
                "val"
                if hashlib.md5(f"{rep}:7".encode()).hexdigest() < th
                else "train"
            )
            assert got[did] == want, did
        # growing the corpus never reassigns existing singleton docs
        bigger = split_by_cluster(
            self._docs(spark, n=90), "doc_id", self._pairs(spark), 0.3, seed=7
        )
        got2 = {r["doc_id"]: r["split"] for r in bigger.collect()}
        assert all(got2[d] == got[d] for d in got), "existing rows reassigned"


class TestBalanceByCluster:
    def _docs(self, spark, n=40):
        return spark.createDataFrame(
            [(i, f"text {i}") for i in range(n)], "doc_id long, text string"
        )

    def _pairs(self, spark):
        # one 5-chain, one triangle, one pair
        return spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
             (20, 21)],
            "id_a long, id_b long",
        )

    def test_cap_law_vs_python_twin(self, spark):
        import hashlib

        from data_quality_spark.operators.cluster import balance_by_cluster

        got = balance_by_cluster(
            self._docs(spark), "doc_id", self._pairs(spark), cap=2,
            seed=9, portable=True,
        ).collect()
        comp = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 10: 10, 11: 10, 12: 10,
                20: 20, 21: 20}
        groups: dict[str, list[int]] = {}
        for did in range(40):
            groups.setdefault(str(comp.get(did, did)), []).append(did)
        want_keep = {}
        for rep, members in groups.items():
            order = sorted(
                members,
                key=lambda d: (
                    hashlib.md5(f"{d}:9".encode()).hexdigest(), d),
            )
            for rank, d in enumerate(order, start=1):
                want_keep[d] = rank <= 2
        by_id = {r["doc_id"]: r for r in got}
        assert len(by_id) == 40
        for did, r in by_id.items():
            assert r["cluster_rep"] == str(comp.get(did, did)), did
            assert r["keep"] == want_keep[did], did
            assert r["cluster_size"] == len(groups[r["cluster_rep"]]) if \
                did in comp else r["cluster_size"] == 1
        # cap respected, singletons always kept at cap>=1
        kept = [d for d, r in by_id.items() if r["keep"]]
        for rep, members in groups.items():
            assert sum(1 for d in members if d in kept) == min(
                2, len(members))

    def test_partition_invariance_and_bad_cap(self, spark):
        from data_quality_spark.operators.cluster import balance_by_cluster

        docs = self._docs(spark)
        a = balance_by_cluster(
            docs, "doc_id", self._pairs(spark), cap=1, seed=4)
        b = balance_by_cluster(
            docs.repartition(17), "doc_id", self._pairs(spark), cap=1,
            seed=4)
        ka = {r["doc_id"]: r["keep"] for r in a.collect()}
        kb = {r["doc_id"]: r["keep"] for r in b.collect()}
        assert ka == kb
        with pytest.raises(ValueError):
            balance_by_cluster(docs, "doc_id", self._pairs(spark), cap=0)


def test_semantic_prune_keeps_one_per_cluster(spark):
    import numpy as np

    from data_quality_spark.operators.similarity import semantic_prune

    rng = np.random.default_rng(5)
    base = rng.standard_normal((6, 16)).astype("float32")
    rows = []
    vid = 0
    for b in base:
        for _ in range(3):  # three near-identical copies per base
            v = b + rng.standard_normal(16).astype("float32") * 0.01
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_prune(df, dim=16, threshold=0.95).collect()
    assert len(out) == 18
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], []).append(r)
    for comp, members in by_comp.items():
        keeps = [r for r in members if r["keep"]]
        assert len(keeps) == 1  # exactly one representative per cluster
        assert keeps[0]["vec_id"] == comp == min(r["vec_id"] for r in members)
        assert all(r["cluster_size"] == len(members) for r in members)
    # the three copies of each base should mostly collapse (same SRP bucket)
    assert sum(1 for r in out if r["keep"]) <= 12


class TestDecisionConsistency:
    def _members(self, spark):
        # components: c1 = {a, b, c}, c9 = {x, y}
        rows = [("a", "c1", 3), ("b", "c1", 3), ("c", "c1", 3),
                ("x", "c9", 2), ("y", "c9", 2)]
        return spark.createDataFrame(
            rows, "node string, component string, cluster_size long")

    def test_mixed_flag_and_boundary_ids(self, spark):
        from data_quality_spark.operators.cluster import decision_consistency

        decided = spark.createDataFrame(
            [("a", "keep"), ("b", "drop"), ("c", "drop"),
             ("x", "keep"), ("y", "keep")],
            "clip_id string, decision string")
        out = {r["component"]: r for r in decision_consistency(
            self._members(spark), decided).collect()}
        c1, c9 = out["c1"], out["c9"]
        assert (c1["n_keep"], c1["n_drop"], c1["mixed"]) == (1, 2, True)
        assert (c1["first_keep"], c1["first_drop"]) == ("a", "b")
        assert (c9["n_keep"], c9["n_drop"], c9["mixed"]) == (2, 0, False)
        assert c9["first_drop"] is None

    def test_undecided_members_do_not_count(self, spark):
        from data_quality_spark.operators.cluster import decision_consistency

        # "c" never reached the gate: cluster_size stays 3, n_decided = 2
        decided = spark.createDataFrame(
            [("a", "drop"), ("b", "drop"), ("x", "drop"), ("y", "drop")],
            "clip_id string, decision string")
        out = {r["component"]: r for r in decision_consistency(
            self._members(spark), decided).collect()}
        c1 = out["c1"]
        assert (c1["cluster_size"], c1["n_decided"]) == (3, 2)
        assert (c1["n_keep"], c1["mixed"]) == (0, False)
        assert c1["first_keep"] is None and c1["first_drop"] == "a"

    def test_fully_undecided_cluster_still_reported(self, spark):
        from data_quality_spark.operators.cluster import decision_consistency

        # c9's members never reached the gate: the cluster must appear
        # (n_decided 0, nothing mixed) — the report stays reconcilable
        # against cluster_members
        decided = spark.createDataFrame(
            [("a", "keep"), ("b", "drop"), ("c", "drop")],
            "clip_id string, decision string")
        out = {r["component"]: r for r in decision_consistency(
            self._members(spark), decided).collect()}
        assert set(out) == {"c1", "c9"}
        c9 = out["c9"]
        assert (c9["cluster_size"], c9["n_decided"]) == (2, 0)
        assert (c9["n_keep"], c9["n_drop"], c9["mixed"]) == (0, 0, False)
        assert c9["first_keep"] is None and c9["first_drop"] is None

    def test_three_way_gate_with_explicit_drop_value(self, spark):
        from data_quality_spark.operators.cluster import decision_consistency

        # decide3 output: 'review' must NOT count as a drop nor flip
        # mixed when drop_value is explicit; it lands in n_other.
        decided = spark.createDataFrame(
            [("a", "accept"), ("b", "review"), ("c", "reject"),
             ("x", "accept"), ("y", "review")],
            "clip_id string, decision string")
        out = {r["component"]: r for r in decision_consistency(
            self._members(spark), decided,
            keep_value="accept", drop_value="reject").collect()}
        c1, c9 = out["c1"], out["c9"]
        assert (c1["n_keep"], c1["n_drop"], c1["n_other"]) == (1, 1, 1)
        assert (c1["mixed"], c1["first_drop"]) == (True, "c")
        # c9 has accept + review only: not mixed under the explicit law
        assert (c9["n_keep"], c9["n_drop"], c9["n_other"]) == (1, 0, 1)
        assert c9["mixed"] is False and c9["first_drop"] is None

    def test_three_way_default_counts_review_as_drop(self, spark):
        from data_quality_spark.operators.cluster import decision_consistency

        # documented two-outcome default: every decided non-keep verdict
        # is a drop (so 'review' tallies into n_drop and can mark mixed)
        decided = spark.createDataFrame(
            [("x", "accept"), ("y", "review")],
            "clip_id string, decision string")
        out = {r["component"]: r for r in decision_consistency(
            self._members(spark), decided,
            keep_value="accept").collect()}
        c9 = out["c9"]
        assert (c9["n_keep"], c9["n_drop"], c9["mixed"]) == (1, 1, True)
        assert "n_other" not in c9.asDict()


def test_connected_components_reports_rounds(spark):
    """The stats hook surfaces the converged star-round count — a chain
    of length 64 must close in O(log n) rounds, far under the rail."""
    from data_quality_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long")
    stats = {}
    comp = connected_components(edges, stats=stats)
    assert comp.select("component").distinct().count() == 1
    assert 1 <= stats["rounds"] <= 10


def test_digest_chain_pairs_random_families(spark):
    """Randomized differential: for random digest assignments, the chain
    edges must close to exactly the digest families (plain-Python
    grouping as the oracle), across several seeds and shapes."""
    import random

    from data_quality_spark.operators.cluster import (
        connected_components,
        digest_chain_pairs,
    )

    for seed in (1, 7, 23):
        rng = random.Random(seed)
        n = rng.randint(30, 120)
        n_digests = rng.randint(3, 12)
        rows = [(i, rng.randrange(n_digests)) for i in range(n)]
        df = spark.createDataFrame(rows, "__id long, __d long")
        edges = digest_chain_pairs(df)
        fams: dict[int, list[int]] = {}
        for i, d in rows:
            fams.setdefault(d, []).append(i)
        want_edges = sorted(
            (min(m), x)
            for m in fams.values() if len(m) > 1
            for x in m if x != min(m)
        )
        got_edges = sorted(
            (r["id_a"], r["id_b"]) for r in edges.collect())
        assert got_edges == want_edges, seed
        # closure: every multi-member family is one component labeled
        # by its min id
        comp = {r["node"]: r["component"]
                for r in connected_components(edges).collect()}
        for m in fams.values():
            if len(m) > 1:
                assert {comp[x] for x in m} == {min(m)}, seed
