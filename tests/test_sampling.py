"""Deterministic sampling + skew audit.

Correctness model: sample membership must be a pure function of
(row id, seed) — never of partitioning or task order — so every test
doubles as a reproducibility proof: re-running or repartitioning the input
must select byte-identical rows.  The portable order is additionally
checked against Python's hashlib.md5, the third engine after Spark and the
DuckDB oracle twin.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.sampling import (
    capped_sample,
    capped_sample_audit,
    deterministic_sample,
    fraction_threshold_hex,
    sample_order_col,
    skew_audit,
    stratified_sample,
)


def _docs(spark, n=500, n_langs=5, seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    langs = [f"l{i}" for i in range(n_langs)]
    # zipf-ish skew: lang l0 dominates
    p = np.array([1.0 / (i + 1) for i in range(n_langs)])
    p /= p.sum()
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "lang": rng.choice(langs, size=n, p=p),
        "val": rng.integers(0, 1000, size=n),
    })
    return spark.createDataFrame(pdf), pdf


def _md5_twin(doc_id, seed):
    return hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()


class TestPortableOrder:
    def test_md5_order_matches_hashlib(self, spark):
        df, pdf = _docs(spark, 50)
        got = df.select(
            "doc_id",
            sample_order_col(F.col("doc_id"), 7, portable=True).alias("h"),
        ).toPandas().set_index("doc_id")["h"]
        for did in pdf["doc_id"]:
            assert got[did] == _md5_twin(did, 7)

    def test_threshold_hex(self):
        assert fraction_threshold_hex(0.25) == "4" + "0" * 31
        assert fraction_threshold_hex(0.0) == "0" * 32
        assert len(fraction_threshold_hex(0.1)) == 32
        with pytest.raises(ValueError):
            fraction_threshold_hex(1.5)


class TestCappedSample:
    def test_per_key_counts(self, spark):
        df, pdf = _docs(spark)
        out = capped_sample(df, ["lang"], 30, "doc_id", seed=1).toPandas()
        per_key_in = pdf.groupby("lang").size()
        per_key_out = out.groupby("lang").size()
        for lang, n_in in per_key_in.items():
            assert per_key_out.get(lang, 0) == min(30, n_in)
        assert (out["sample_rank"] >= 1).all()
        assert (out["sample_rank"] <= 30).all()

    def test_partitioning_invariance(self, spark):
        df, _ = _docs(spark)
        a = capped_sample(df, ["lang"], 20, "doc_id", seed=5)
        b = capped_sample(df.repartition(17, "val"), ["lang"], 20,
                          "doc_id", seed=5)
        ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
        ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
        assert ids_a == ids_b

    def test_seed_changes_membership(self, spark):
        df, _ = _docs(spark)
        a = {r.doc_id for r in
             capped_sample(df, ["lang"], 20, "doc_id", seed=1)
             .select("doc_id").collect()}
        b = {r.doc_id for r in
             capped_sample(df, ["lang"], 20, "doc_id", seed=2)
             .select("doc_id").collect()}
        assert a != b

    def test_presample_bit_identical_to_exact(self, spark):
        # cap 50, factor 2: per-key undershoot odds ~exp(-50/4) — the
        # threshold and order share one hash, so survival of the cap-th
        # smallest hash implies identical output
        df, _ = _docs(spark, n=2000)
        exact = capped_sample(df, ["lang"], 50, "doc_id", seed=3)
        fast = capped_sample(df, ["lang"], 50, "doc_id", seed=3,
                             presample_factor=2.0)
        rows_e = sorted(map(tuple, exact.collect()))
        rows_f = sorted(map(tuple, fast.collect()))
        assert rows_e == rows_f

    def test_audit_all_exact(self, spark):
        df, _ = _docs(spark, n=2000)
        out = capped_sample(df, ["lang"], 50, "doc_id", seed=3,
                            presample_factor=2.0)
        audit = capped_sample_audit(df, out, ["lang"], 50).toPandas()
        assert audit["exact"].all()

    def test_portable_matches_python_selection(self, spark):
        df, pdf = _docs(spark, n=400)
        out = capped_sample(df, ["lang"], 10, "doc_id", seed=7,
                            portable=True).toPandas()
        # independent pure-pandas twin
        pdf = pdf.assign(h=[_md5_twin(d, 7) for d in pdf["doc_id"]])
        want = (
            pdf.sort_values(["h", "doc_id"])
            .groupby("lang").head(10)
        )
        assert set(out["doc_id"]) == set(want["doc_id"])


class TestStratified:
    def test_mapping_caps(self, spark):
        df, pdf = _docs(spark)
        caps = {("l0",): 5, ("l1",): 10}
        out = stratified_sample(df, ["lang"], caps, "doc_id").toPandas()
        assert set(out["lang"]) <= {"l0", "l1"}
        sizes = out.groupby("lang").size()
        assert sizes["l0"] == min(5, (pdf["lang"] == "l0").sum())
        assert sizes["l1"] == min(10, (pdf["lang"] == "l1").sum())

    def test_empty_caps_raises(self, spark):
        df, _ = _docs(spark, 50)
        with pytest.raises(ValueError):
            stratified_sample(df, ["lang"], {}, "doc_id")


class TestDeterministicSample:
    def test_membership_matches_md5_twin(self, spark):
        df, pdf = _docs(spark, n=1000)
        out = deterministic_sample(df, 0.25, "doc_id", seed=3)
        got = {r.doc_id for r in out.select("doc_id").collect()}
        thresh = fraction_threshold_hex(0.25)
        want = {d for d in pdf["doc_id"] if _md5_twin(d, 3) < thresh}
        assert got == want
        # ~25% within binomial noise
        assert abs(len(want) / 1000 - 0.25) < 0.06

    def test_no_shuffle_in_plan(self, spark):
        df, _ = _docs(spark, 100)
        plan = deterministic_sample(df, 0.5, "doc_id")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan


class TestSkewAudit:
    def test_values_against_pandas(self, spark):
        df, pdf = _docs(spark, n=1500)
        out = skew_audit(df, ["lang"], top_n=3).toPandas()
        counts = pdf.groupby("lang").size().sort_values(ascending=False)
        total, n_keys = counts.sum(), len(counts)
        assert list(out["lang"]) == list(counts.index[:3])
        for _, row in out.iterrows():
            c = counts[row["lang"]]
            assert row["cnt"] == c
            assert row["share"] == c / total
            assert row["ratio_to_mean"] == (c * n_keys) / total
        assert list(out["rank"]) == [1, 2, 3]


class TestTokenBudget:
    def test_budget_law(self, spark):
        from data_quality_spark.operators.sampling import token_budget_sample

        df, pdf = _docs(spark)
        sel = token_budget_sample(
            df, "val", 900, strata=["lang"], id_col="doc_id", seed=3
        ).toPandas()
        assert (sel["cum_before"] < 900).all()
        totals = pdf.groupby("lang")["val"].sum()
        for lang, g in sel.groupby("lang"):
            # reaches the budget whenever the stratum can (boundary row in)
            assert int(g["val"].sum()) >= min(900, int(totals[lang]))

    def test_partitioning_invariance(self, spark):
        from data_quality_spark.operators.sampling import token_budget_sample

        df, _ = _docs(spark)
        a = token_budget_sample(
            df.coalesce(1), "val", 700, ["lang"], "doc_id", seed=5
        ).select("doc_id").toPandas()
        b = token_budget_sample(
            df.repartition(13), "val", 700, ["lang"], "doc_id", seed=5
        ).select("doc_id").toPandas()
        assert sorted(a["doc_id"]) == sorted(b["doc_id"])

    def test_presample_exactness_audited(self, spark):
        from data_quality_spark.operators.sampling import (
            token_budget_audit,
            token_budget_sample,
        )

        df, _ = _docs(spark)
        exact = token_budget_sample(df, "val", 800, ["lang"], "doc_id", seed=9)
        e_ids = sorted(r["doc_id"] for r in exact.collect())

        # generous factor: survivor prefix reaches the budget in every
        # stratum -> bit-identical to the exact path, audit green
        fast = token_budget_sample(
            df, "val", 800, ["lang"], "doc_id", seed=9, presample_factor=8.0
        )
        assert e_ids == sorted(r["doc_id"] for r in fast.collect())
        audit = token_budget_audit(df, fast, "val", 800, ["lang"])
        assert all(r["exact"] for r in audit.collect())

        # tight factor: this seed truncates one stratum's prefix under
        # budget — the result is still a PREFIX subset of the exact
        # selection (never reordered, never overshot) and the audit is
        # exactly the detector that flags the starved stratum
        tight = token_budget_sample(
            df, "val", 800, ["lang"], "doc_id", seed=9, presample_factor=3.0
        )
        t_ids = sorted(r["doc_id"] for r in tight.collect())
        assert set(t_ids) < set(e_ids)
        a2 = {r["lang"]: r["exact"]
              for r in token_budget_audit(df, tight, "val", 800,
                                          ["lang"]).collect()}
        assert not all(a2.values()) and any(a2.values())

    def test_portable_matches_hashlib_order(self, spark):
        from data_quality_spark.operators.sampling import token_budget_sample

        df, pdf = _docs(spark, n=120)
        sel = token_budget_sample(
            df, "val", 600, ["lang"], "doc_id", seed=4, portable=True
        ).toPandas()
        for lang, g in pdf.groupby("lang"):
            g = g.copy()
            g["h"] = [_md5_twin(i, 4) for i in g["doc_id"]]
            g = g.sort_values(["h", "doc_id"])
            cum, want = 0, []
            for _, r in g.iterrows():
                if cum < 600:
                    want.append(int(r["doc_id"]))
                cum += int(r["val"])
            got = sorted(int(v) for v in sel[sel["lang"] == lang]["doc_id"])
            assert got == sorted(want), lang


def test_mixture_sample_budgets_and_exclusion(spark):
    from data_quality_spark.operators.sampling import (
        mixture_audit,
        mixture_budgets,
        mixture_sample,
    )

    rows = [(i, "a" * 10, ["x", "y", "z"][i % 3], 10) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    mix = {"x": 0.5, "y": 0.25}  # z excluded; x over-asked vs avail 300
    budgets = mixture_budgets(400, mix)
    assert budgets == {"x": 200, "y": 100}
    sel = mixture_sample(df, "n_chars", 400, mix, "lang", "doc_id", seed=3)
    by = {}
    for r in sel.collect():
        by.setdefault(r["lang"], []).append(r)
    assert "z" not in by  # absent stratum excluded entirely
    # boundary-row convention: selection reaches (or just crosses) budget
    assert sum(r["n_chars"] for r in by["x"]) >= 200
    assert sum(r["n_chars"] for r in by["y"]) >= 100
    aud = {r["stratum"]: r for r in mixture_audit(
        df, "n_chars", 400, mix, "lang", "doc_id", seed=3).collect()}
    assert set(aud) == {"x", "y"}
    assert aud["x"]["avail_weight"] == 300 and aud["x"]["filled"]
    assert aud["y"]["filled"]
    # infeasible quota surfaces as filled=False
    aud2 = {r["stratum"]: r for r in mixture_audit(
        df, "n_chars", 2000, {"x": 0.5}, "lang", "doc_id").collect()}
    assert aud2["x"]["budget"] == 1000
    assert aud2["x"]["sel_weight"] == 300 and not aud2["x"]["filled"]


def test_mixture_sample_deterministic_and_portable(spark):
    import hashlib

    from data_quality_spark.operators.sampling import mixture_sample

    rows = [(i, "t", "x", 7) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars long")
    sel = mixture_sample(df, "n_chars", 100, {"x": 0.5}, "lang", "doc_id",
                         seed=7, portable=True)
    got = sorted(r["doc_id"] for r in sel.collect())
    # hashlib twin of the portable md5 ordering
    order = sorted(range(40), key=lambda d: (
        hashlib.md5(f"{d}:7".encode()).hexdigest(), d))
    cum, want = 0, []
    for d in order:
        if cum < 50:
            want.append(d)
        cum += 7
    assert got == sorted(want)


class TestTemperatureMixture:
    def test_budget_law_and_upweighting(self):
        import math

        from data_quality_spark.operators.sampling import temperature_budgets

        weights = {"en": 90000, "de": 9000, "sw": 900}
        total = 10000
        b = temperature_budgets(weights, total, alpha=0.5)
        qs = {k: math.isqrt(n << 20) for k, n in weights.items()}
        qsum = sum(qs.values())
        assert b == {k: total * q // qsum for k, q in qs.items()}
        # alpha=0.5 upweights low-resource strata vs corpus share
        share = {k: n / sum(weights.values()) for k, n in weights.items()}
        bshare = {k: v / total for k, v in b.items()}
        assert bshare["sw"] > share["sw"] and bshare["en"] < share["en"]

    def test_isqrt_equals_floor_sqrt_below_2_53(self):
        # the engine-exactness claim the strict SQL twin relies on
        import math
        import random

        rng = random.Random(7)
        for _ in range(20000):
            x = rng.randrange(0, 1 << 53)
            assert math.isqrt(x) == int(math.floor(math.sqrt(x))), x

    def test_audit_selection_and_boundary(self, spark):
        from data_quality_spark.operators.sampling import temperature_audit

        rows = [(i, ["hi", "lo"][i % 2 == 0 and i < 10], 100)
                for i in range(100)]
        # 95 docs in 'hi' (9500 chars), 5 in 'lo' (500 chars)
        rows = [(i, "hi" if i >= 5 else "lo", 100) for i in range(100)]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, n_chars long")
        audit = {r["stratum"]: r for r in temperature_audit(
            df, "n_chars", 9000, "lang", "doc_id", seed=3, portable=True
        ).collect()}
        hi, lo = audit["hi"], audit["lo"]
        # every stratum present; lo exhausts its data (budget > avail,
        # sqrt-upweighted: 500/10000 of the corpus gets ~19% of budget)
        assert lo["avail_weight"] == 500
        assert lo["budget"] > 500 and not lo["filled"]
        assert lo["sel_weight"] == 500 and lo["n_sel"] == 5
        # hi fills: selected weight >= budget, overshoot < one row
        assert hi["filled"]
        assert hi["budget"] <= hi["sel_weight"] < hi["budget"] + 100
        # invariance under repartitioning
        again = {r["stratum"]: r for r in temperature_audit(
            df.repartition(7), "n_chars", 9000, "lang", "doc_id",
            seed=3, portable=True).collect()}
        assert {k: tuple(v) for k, v in audit.items()} == {
            k: tuple(v) for k, v in again.items()}


def test_temperature_audit_null_stratum(spark):
    """Regression: NULL strata are their own stratum (sentinel-
    normalized internally), reported back as NULL — not a crash, not a
    silent drop."""
    from data_quality_spark.operators.sampling import temperature_audit

    rows = [(i, "en" if i < 20 else None, 50) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    audit = {r["stratum"]: r for r in temperature_audit(
        df, "n_chars", 800, "lang", "doc_id", seed=2, portable=True
    ).collect()}
    assert set(audit) == {"en", None}
    null_row = audit[None]
    assert null_row["avail_weight"] == 500
    assert null_row["n_sel"] > 0  # NULL-stratum rows are selectable
    total_sel = sum(r["sel_weight"] for r in audit.values())
    assert total_sel >= 800 - 100  # budgets filled modulo flooring


def test_temperature_audit_sentinel_collision_refused(spark):
    """A REAL stratum value equal to the internal NULL marker must be
    refused, never silently merged with the NULL stratum's budget."""
    import pytest

    from data_quality_spark.operators.sampling import temperature_audit

    rows = [(0, "\x00null", 50), (1, None, 50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    with pytest.raises(ValueError, match="sentinel"):
        temperature_audit(df, "n_chars", 80, "lang", "doc_id", seed=2,
                          portable=True)


class TestEvalManifest:
    """eval_manifest: per-language balanced eval set over keep∧val
    candidates, + reconciliation against the training manifest."""

    def _manifest(self, spark):
        rows = []
        # 3 langs; lang 'a' overflows a 100ms cap, 'b' fits, 'c' empty
        for i in range(6):
            rows.append((f"a{i}", "keep", "val", "a", 40))
        rows.append(("b0", "keep", "val", "b", 50))
        # non-candidates: dropped, or train split
        rows.append(("x0", "drop", "val", "a", 40))
        rows.append(("x1", "keep", "train", "a", 40))
        return spark.createDataFrame(
            rows,
            "clip_id string, decision string, split string, "
            "lang_pred string, dur_ms long",
        )

    def test_candidates_caps_and_accounting(self, spark):
        from data_quality_spark.operators.sampling import eval_manifest

        out = eval_manifest(self._manifest(spark), 100, seed=3).collect()
        got = {r["clip_id"]: r for r in out}
        # only keep∧val rows appear
        assert set(got) == {f"a{i}" for i in range(6)} | {"b0"}
        # lang a: 40ms each, cap 100 -> prefix sums 0,40,80,120,... ->
        # exactly 3 selected (boundary row at cum_before 80 included)
        a_sel = [r for r in out if r["lang_pred"] == "a" and r["in_eval"]]
        assert len(a_sel) == 3
        assert sorted(r["cum_before_ms"] for r in a_sel) == [0, 40, 80]
        # the excluded rows remain as audit surface
        a_out = [r for r in out if r["lang_pred"] == "a"
                 and not r["in_eval"]]
        assert len(a_out) == 3
        assert got["b0"]["in_eval"] and got["b0"]["cum_before_ms"] == 0

    def test_membership_is_growth_stable(self, spark):
        """Adding rows to another language never changes an existing
        language's selection (per-lang prefix is a pure function)."""
        from data_quality_spark.operators.sampling import eval_manifest

        base = self._manifest(spark)
        grown = base.union(spark.createDataFrame(
            [("c0", "keep", "val", "c", 70)], base.schema))
        sel_base = {
            r["clip_id"]: r["in_eval"]
            for r in eval_manifest(base, 100, seed=3).collect()
        }
        sel_grown = {
            r["clip_id"]: r["in_eval"]
            for r in eval_manifest(grown, 100, seed=3).collect()
        }
        assert all(sel_grown[k] == v for k, v in sel_base.items())
        assert sel_grown["c0"] is True

    def test_per_lang_cap_dict(self, spark):
        from data_quality_spark.operators.sampling import eval_manifest

        out = eval_manifest(
            self._manifest(spark), {"a": 45}, seed=3, default_cap_ms=0
        ).collect()
        sel = [r["clip_id"] for r in out if r["in_eval"]]
        # a: 45ms cap -> prefix 0 and 40 both under cap -> 2 clips;
        # b: default 0 -> none
        assert len(sel) == 2 and all(c.startswith("a") for c in sel)

    @pytest.mark.slow
    def test_reconciles_with_training_manifest(self, spark):
        """Flagship reconciliation: every eval candidate is a keep∧val
        row of the training manifest and no in_eval clip is
        train_ready; in_eval durations respect the per-lang cap up to
        one boundary clip."""
        import __spark_entry__ as e

        sf = "/root/testdata/sf0.001"
        tm = {r["clip_id"]: r
              for r in e.q_training_manifest(spark, sf).collect()}
        em = e.q_eval_manifest(spark, sf).collect()
        assert len(em) > 0
        max_dur = {}
        totals = {}
        for r in em:
            t = tm[r["clip_id"]]
            assert t["decision"] == "keep" and t["split"] == "val"
            assert not t["train_ready"]
            assert r["component"] == t["component"]
            assert r["dur_ms"] == t["dur_ms"]
            if r["in_eval"]:
                totals[r["lang_pred"]] = (
                    totals.get(r["lang_pred"], 0) + r["dur_ms"])
                max_dur[r["lang_pred"]] = max(
                    max_dur.get(r["lang_pred"], 0), r["dur_ms"])
        for lg, tot in totals.items():
            assert tot < 30_000 + max_dur[lg]


class TestGeneralAlphaTemperature:
    """Engine-exact temperature for rational α = p/q via integer q-th
    roots — never float pow."""

    def test_iroot_floor_law_property(self):
        import random

        from data_quality_spark.operators.sampling import _iroot

        rng = random.Random(7)
        for _ in range(300):
            k = rng.randint(2, 12)
            x = rng.randint(0, 1 << rng.randint(1, 200))
            r = _iroot(x, k)
            assert r ** k <= x and (r + 1) ** k > x

    def test_iroot_exact_powers(self):
        from data_quality_spark.operators.sampling import _iroot

        for k in (2, 3, 10):
            for b in (1, 2, 17, 10 ** 6):
                assert _iroot(b ** k, k) == b
                assert _iroot(b ** k - 1, k) == b - 1 if b > 1 else True

    def test_alpha_fraction(self):
        from data_quality_spark.operators.sampling import _alpha_fraction

        assert _alpha_fraction(0.5) == (1, 2)
        assert _alpha_fraction(0.3) == (3, 10)
        assert _alpha_fraction(0.7) == (7, 10)
        assert _alpha_fraction(0.25) == (1, 4)
        with pytest.raises(ValueError):
            _alpha_fraction(0.123456789)

    def test_general_path_matches_isqrt_at_half(self):
        """α=1/2 through the generic q-th-root machinery must equal the
        original isqrt special case — the published artifacts depend on
        it."""
        from data_quality_spark.operators.sampling import (
            _alpha_fraction,
            _iroot,
            _temperature_q,
        )

        p, q = _alpha_fraction(0.5)
        for n in (0, 1, 2, 3, 10, 999, 12345, 10 ** 9, 10 ** 12):
            generic = _iroot((n ** p) << (q * 10), q)
            assert generic == _temperature_q(n, 0.5, 20)

    def test_integer_root_beats_float_pow_on_boundaries(self):
        """The exact class of defect the law excludes: float pow lands
        one ulp under an exact power and floor() flips the budget."""
        from data_quality_spark.operators.sampling import _temperature_q

        # scan exact 10th powers: q_l for n = b^10 at α=7/10 must be
        # exactly b^7 * 2^10; assert the engine law delivers it
        for b in (3, 7, 11, 101, 1001):
            n = b ** 10
            assert _temperature_q(n, 0.7, 20) == (b ** 7) << 10
            # and the float formulation is wrong for at least one of
            # these (documents why the integer law exists; do not
            # assert which — ulp behavior is platform arithmetic)

    def test_budgets_upweight_low_resource(self):
        from data_quality_spark.operators.sampling import (
            temperature_budgets,
        )

        w = {"big": 1_000_000, "small": 10_000}
        b = temperature_budgets(w, 100_000, alpha=0.7)
        assert sum(b.values()) <= 100_000
        # α<1 gives 'small' more than its proportional share
        prop_small = 100_000 * 10_000 // 1_010_000
        assert b["small"] > prop_small
        # and α=0.7 sits between α=0.5 and proportional for 'big'
        b5 = temperature_budgets(w, 100_000, alpha=0.5)
        assert b5["small"] > b["small"] > prop_small
