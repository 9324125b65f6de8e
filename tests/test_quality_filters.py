"""Gopher rules, repetition filters, and decontamination.

Style per the reference's test strategy (SURVEY.md §5): seed tiny frames
with KNOWN defects, assert each rule fires exactly where intended, and
differential-check the heavier operators against a hand-computed or pure-
Python twin.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.quality_filters import (
    decontaminate,
    decontamination_report,
    gopher_flags,
    gopher_quality,
    repetition_stats,
    word_ngrams,
)

PASSING = (
    "the quick brown fox jumps over a lazy dog near the old river bank "
    "and keeps running while birds watch from tall trees in the morning"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s0") for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )


class TestGopherFlags:
    def _flags(self, spark, text, **kw):
        kw.setdefault("min_words", 5)
        kw.setdefault("max_words", 50)
        row = gopher_flags(_docs(spark, [text]), **kw).collect()[0]
        return {k: row[k] for k in row.asDict() if k.startswith(("fail_", "gopher"))}

    def test_clean_doc_passes_every_rule(self, spark):
        f = self._flags(spark, PASSING)
        assert not any(v for k, v in f.items() if k.startswith("fail_"))
        assert f["gopher_pass"]

    def test_word_count_bounds(self, spark):
        assert self._flags(spark, "too few words here")["fail_word_count"]
        assert self._flags(spark, " ".join(["w"] * 60))["fail_word_count"]
        assert not self._flags(spark, PASSING)["fail_word_count"]

    def test_mean_word_length_bounds(self, spark):
        # mean 1 char/word < 3
        short = self._flags(spark, " ".join(["a b c d e"] * 2))
        assert short["fail_mean_word_len"]
        # mean 12 chars/word > 10
        longw = self._flags(spark, " ".join(["antidisestabl"] * 6))
        assert longw["fail_mean_word_len"]

    def test_symbol_ratio(self, spark):
        # 3 symbols over 8 words > 1/10
        t = "the code # uses # tags and ... more"
        assert self._flags(spark, t)["fail_symbol_ratio"]
        assert not self._flags(spark, PASSING)["fail_symbol_ratio"]

    def test_alpha_word_fraction(self, spark):
        t = "1 2 3 4 5 6 7 8 the end"  # 2/10 alpha words < 4/5
        assert self._flags(spark, t)["fail_alpha_frac"]
        assert not self._flags(spark, PASSING)["fail_alpha_frac"]

    def test_stopword_rule(self, spark):
        t = "quantum flux capacitor reverses polarity instantly everywhere"
        assert self._flags(spark, t)["fail_stopword"]
        assert not self._flags(spark, PASSING)["fail_stopword"]

    def test_null_and_empty_text_are_total(self, spark):
        df = spark.createDataFrame(
            [(0, None, "en", "s"), (1, "   ", "en", "s")],
            "doc_id long, text string, lang string, source string",
        )
        rows = gopher_flags(df, min_words=5, max_words=50).collect()
        for r in rows:
            assert r["fail_word_count"] and not r["gopher_pass"]

    def test_aggregate_counts(self, spark):
        docs = _docs(spark, [PASSING, "tiny doc", " ".join(["a b"] * 10)])
        got = {
            r["lang"]: r.asDict()
            for r in gopher_quality(docs, min_words=5, max_words=50).collect()
        }["en"]
        assert got["n_docs"] == 3
        assert got["fail_word_count"] == 1  # "tiny doc"
        assert got["fail_mean_word_len"] == 1  # the a-b doc
        assert got["n_pass"] == 1


class TestWordNgrams:
    def test_exact_grams(self, spark):
        df = _docs(spark, ["A b c d"])
        got = sorted(
            r["gram"] for r in word_ngrams(df, "doc_id", "text", 2).collect()
        )
        assert got == ["a b", "b c", "c d"]

    def test_short_docs_emit_nothing(self, spark):
        df = _docs(spark, ["one two three"])
        assert word_ngrams(df, "doc_id", "text", 4).count() == 0

    def test_partitioning_invariance(self, spark):
        df = _docs(spark, ["a b c d e f g h"] * 3)
        one = word_ngrams(df.coalesce(1), "doc_id", "text", 3).collect()
        many = word_ngrams(df.repartition(7), "doc_id", "text", 3).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, many))


class TestRepetitionStats:
    def test_dup_token_and_top_gram_laws(self, spark):
        # doc 0: "x y x y x y" → nt=6, dup=4 (10·4>3·6 fails dup rule);
        # top bigram "x y" occurs 3 times, chars 3·3=9 > nc=11/5 → fails
        # doc 1: all-distinct tokens, no repeated bigram → clean
        docs = _docs(spark, ["x y x y x y", "q w e r t u i o p"])
        got = repetition_stats(docs).collect()[0].asDict()
        assert got["n_docs"] == 2
        assert got["total_tokens"] == 6 + 9
        assert got["total_dup_extra"] == 4
        assert got["n_fail_dup_tokens"] == 1
        assert got["n_fail_top_gram"] == 1

    def test_single_occurrence_grams_dont_count(self, spark):
        # every bigram unique → top_chars 0 → cannot fail the gram rule
        docs = _docs(spark, ["a b c d a"])  # dup token 'a' but no dup bigram
        got = repetition_stats(docs).collect()[0].asDict()
        assert got["n_fail_top_gram"] == 0

    def test_python_twin_on_random_docs(self, spark):
        import random

        rng = random.Random(7)
        vocab = ["red", "blue", "green", "dot", "line"]
        rows = [
            " ".join(rng.choice(vocab) for _ in range(rng.randrange(2, 30)))
            for _ in range(40)
        ]
        docs = _docs(spark, rows)
        got = repetition_stats(docs).collect()[0].asDict()

        tot = dup = f_dup = f_top = 0
        for t in rows:
            toks = t.lower().split()
            nt, nc = len(toks), len(t)
            d = nt - len(set(toks))
            grams: dict[str, int] = {}
            for i in range(nt - 1):
                g = toks[i] + " " + toks[i + 1]
                grams[g] = grams.get(g, 0) + 1
            tc = max(
                (c * len(g) for g, c in grams.items() if c > 1), default=0
            )
            tot += nt
            dup += d
            f_dup += 10 * d > 3 * nt
            f_top += 5 * tc > nc
        assert (
            got["total_tokens"],
            got["total_dup_extra"],
            got["n_fail_dup_tokens"],
            got["n_fail_top_gram"],
        ) == (tot, dup, f_dup, f_top)


class TestDecontaminate:
    def test_flags_only_overlapping_docs(self, spark):
        bench = _docs(spark, ["alpha beta gamma delta epsilon"])
        corpus = spark.createDataFrame(
            [
                (10, "xx alpha beta gamma delta yy", "en", "s1"),  # 1 shared 4-gram
                (11, "beta gamma delta epsilon tail here", "en", "s1"),  # 1
                (12, "totally unrelated words in this doc", "en", "s1"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        got = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, bench).collect()}
        assert got == {10: 1, 11: 1}

    def test_distinct_grams_counted_once(self, spark):
        bench = _docs(spark, ["a b c d"])
        corpus = spark.createDataFrame(
            [(10, "a b c d and a b c d again", "en", "s1")],
            "doc_id long, text string, lang string, source string",
        )
        got = decontaminate(corpus, bench).collect()
        assert [(r["doc_id"], r["n_hits"]) for r in got] == [(10, 1)]

    def test_hash_grams_variant_matches_exact(self, spark):
        bench = _docs(spark, ["alpha beta gamma delta epsilon zeta"])
        corpus = spark.createDataFrame(
            [
                (i, txt, "en", "s1")
                for i, txt in enumerate(
                    [
                        "alpha beta gamma delta trailing",
                        "gamma delta epsilon zeta more",
                        "no overlap at all right here",
                    ]
                )
            ],
            "doc_id long, text string, lang string, source string",
        )
        exact = sorted(map(tuple, decontaminate(corpus, bench).collect()))
        hashed = sorted(
            map(tuple, decontaminate(corpus, bench, hash_grams=True).collect())
        )
        assert exact == hashed

    def test_report_excludes_benchmark_source(self, spark):
        df = spark.createDataFrame(
            [
                (0, "one two three four five", "en", "src0"),
                (1, "one two three four shared", "en", "srcA"),
                (2, "nothing in common whatsoever here", "en", "srcB"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        got = {r["source"]: r.asDict() for r in decontamination_report(df, "src0").collect()}
        assert set(got) == {"srcA", "srcB"}
        assert got["srcA"]["n_contaminated"] == 1
        assert got["srcB"]["n_contaminated"] == 0

    def test_null_source_rows_stay_in_scope(self, spark):
        """A NULL source is ordinary corpus (eqNullSafe scope law): the row
        must be scanned for contamination and reported under source=NULL,
        matching the twins' IS DISTINCT FROM semantics."""
        df = spark.createDataFrame(
            [
                (0, "one two three four five", "en", "src0"),
                (1, "one two three four shared", "en", None),
                (2, "nothing in common whatsoever here", "en", "srcB"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        got = {
            r["source"]: r.asDict()
            for r in decontamination_report(df, "src0").collect()
        }
        assert set(got) == {None, "srcB"}
        assert got[None]["n_contaminated"] == 1
        assert got[None]["n_docs"] == 1


class TestPlanShape:
    def test_gopher_flags_has_no_exchange(self, spark):
        df = _docs(spark, [PASSING] * 4)
        plan = gopher_flags(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_decontaminate_broadcasts_benchmark(self, spark):
        bench = _docs(spark, ["a b c d e"])
        corpus = _docs(spark, ["a b c d x", "u v w x y"])
        plan = (
            decontaminate(corpus, bench)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestCorpusFunnel:
    """Each funnel stage must cut exactly the doc seeded to fail it, and
    the stage columns must be monotonically non-increasing."""

    def _corpus(self, spark):
        contaminated = "alpha beta gamma delta " + PASSING
        rows = [
            # (doc_id, text, lang, source)
            (0, "alpha beta gamma delta epsilon", "en", "src0"),  # benchmark
            (1, PASSING, "en", "sA"),                 # survives everything
            (2, PASSING, "en", "sA"),                 # exact dup of 1 → dedup cut
            (3, "tiny doc", "en", "sA"),              # gopher word-count cut
            (4, " ".join(["the quick brown fox jumps"] * 5), "en", "sA"),  # repetition cut
            (5, contaminated, "en", "sA"),            # decontamination cut
            (6, None, "en", "sA"),                    # NULL text: sentinel keeps it
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def test_stage_by_stage(self, spark):
        from data_quality_spark.operators.quality_filters import corpus_funnel

        got = corpus_funnel(
            self._corpus(spark), "src0", n=4, min_words=5, max_words=50
        ).collect()
        assert len(got) == 1
        r = got[0].asDict()
        # 6 non-benchmark docs; doc 2 collapses into 1; docs 3,6 fail gopher
        # (NULL text has 0 words); doc 4 fails repetition; doc 5 is contaminated.
        assert r == {
            "lang": "en",
            "n_raw": 6,
            "n_after_dedup": 5,
            "n_after_gopher": 3,
            "n_after_repetition": 2,
            "n_clean": 1,
        }

    def test_monotone_and_null_sentinel(self, spark):
        from data_quality_spark.operators.quality_filters import corpus_funnel

        # two NULL-text docs must NOT collapse in the dedup stage
        df = spark.createDataFrame(
            [(0, "b x", "en", "src0"), (1, None, "en", "s"), (2, None, "en", "s")],
            "doc_id long, text string, lang string, source string",
        )
        r = corpus_funnel(df, "src0", n=4, min_words=1, max_words=9).collect()[0]
        assert r["n_after_dedup"] == 2  # sentinels keep both NULL rows
        vals = [
            r["n_raw"], r["n_after_dedup"], r["n_after_gopher"],
            r["n_after_repetition"], r["n_clean"],
        ]
        assert vals == sorted(vals, reverse=True)

    def test_repetition_flags_threshold_parameter(self, spark):
        from data_quality_spark.operators.quality_filters import repetition_flags

        # "x y x y x y": nt=6, dup=4 → fraction 2/3. Fails at 3/10, passes at 7/10.
        docs = _docs(spark, ["x y x y x y"])
        strict = repetition_flags(docs).collect()[0]
        loose = repetition_flags(docs, dup_num=7, dup_den=10).collect()[0]
        assert strict["fail_dup_tokens"] and not loose["fail_dup_tokens"]

    def test_corpus_clean_returns_survivors(self, spark):
        from data_quality_spark.operators.quality_filters import corpus_clean

        docs = self._corpus(spark)
        got = corpus_clean(
            docs, "src0", n=4, min_words=5, max_words=50
        ).collect()
        assert [r["doc_id"] for r in got] == [1]
        assert [c for c in got[0].asDict()] == docs.columns


class TestBoilerplate:
    def _corpus(self, spark):
        boiler = "call now to subscribe today"
        rows = [
            (0, boiler + " alpha beta gamma", "en", "sA"),
            (1, boiler + " delta epsilon zeta", "en", "sA"),
            (2, "unique words only in this document", "en", "sA"),
            (3, boiler, "en", "sB"),
            (4, "an other fully distinct text body", "en", "sB"),
            (5, "xy", "en", "sB"),  # < n tokens: zero positions
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def test_lexicon_is_cross_doc_frequent_grams(self, spark):
        from data_quality_spark.operators.quality_filters import boilerplate_ngrams

        got = {
            r["gram"]: r["gram_docs"]
            for r in boilerplate_ngrams(self._corpus(spark), n=3, min_docs=3).collect()
        }
        # exactly the 3 grams of the shared boilerplate sentence, in 3 docs each
        assert got == {
            "call now to": 3,
            "now to subscribe": 3,
            "to subscribe today": 3,
        }

    def test_per_source_stats(self, spark):
        from data_quality_spark.operators.quality_filters import boilerplate_stats

        got = {
            r["source"]: r.asDict()
            for r in boilerplate_stats(
                self._corpus(spark), n=3, min_docs=3, flag_num=1, flag_den=2
            ).collect()
        }
        # doc0/doc1: 6 grams, 3 boiler → exactly half, not > 1/2 → no flag;
        # doc3: 3 grams, all boiler → flagged; doc5: 0 positions → never flags
        assert got["sA"] == {
            "source": "sA", "n_docs": 3, "total_grams": 6 + 6 + 4,
            "boiler_grams": 6, "n_flagged": 0,
        }
        assert got["sB"] == {
            "source": "sB", "n_docs": 3, "total_grams": 3 + 4 + 0,
            "boiler_grams": 3, "n_flagged": 1,
        }

    def test_occurrences_counted_not_distinct(self, spark):
        from data_quality_spark.operators.quality_filters import boilerplate_stats

        # the boiler gram occurs twice in doc 0: both positions count
        docs = spark.createDataFrame(
            [
                (0, "spam spam spam spam", "en", "s"),
                (1, "spam spam spam other", "en", "s"),
            ],
            "doc_id long, text string, lang string, source string",
        )
        r = boilerplate_stats(docs, n=3, min_docs=2).collect()[0]
        # grams doc0: (spam spam spam)x2; doc1: (spam spam spam), (spam spam other)
        assert r["total_grams"] == 4 and r["boiler_grams"] == 3


class TestFrequentLineRemoval:
    def _docs(self, spark):
        boiler = "subscribe now"
        rows = [
            (1, "alpha beta\n" + boiler + "\ngamma delta", "en"),
            (2, "epsilon zeta\n  " + boiler + "  ", "en"),   # trimmed match
            (3, boiler + "\nunique line three", "en"),
            (4, "totally original content", "en"),
            (5, None, "en"),
            (6, boiler, "en"),                               # only boiler
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )

    def test_removal_and_rebuild(self, spark):
        from data_quality_spark.operators.quality_filters import (
            remove_frequent_lines,
        )

        out = {
            r["doc_id"]: r
            for r in remove_frequent_lines(self._docs(spark), min_docs=3)
            .collect()
        }
        assert out[1]["text"] == "alpha beta\ngamma delta"
        assert out[1]["n_lines_removed"] == 1
        # trimmed form matched, raw line (with spaces) removed
        assert out[2]["text"] == "epsilon zeta"
        assert out[3]["text"] == "unique line three"
        assert out[4]["text"] == "totally original content"
        assert out[4]["n_lines_removed"] == 0
        assert out[5]["text"] is None and out[5]["n_lines_removed"] == 0
        assert out[6]["text"] == "" and out[6]["n_lines_removed"] == 1

    def test_lexicon_threshold(self, spark):
        from data_quality_spark.operators.quality_filters import (
            frequent_lines,
        )

        lex = {r["line"]: r["line_docs"]
               for r in frequent_lines(self._docs(spark), min_docs=3).collect()}
        assert lex == {"subscribe now": 4}


class TestSourceReputation:
    def _corpus(self, spark):
        # src_good: 4 clean docs.  src_farm: 4 gopher-junk docs.
        # src_dup: 3 copies of one template + 1 clean (dup share 3/4).
        # One cross-source copy of the template lands in src_good so
        # corpus-wide (not per-source) dup grouping is exercised.
        template = "subscribe now and join our newsletter list today"
        rows = [
            *[(i, PASSING + f" variant {i}", "en", "src_good")
              for i in range(3)],
            (3, template, "en", "src_good"),        # cross-source dup
            *[(10 + i, "### ### ###", "en", "src_farm") for i in range(4)],
            *[(20 + i, template, "en", "src_dup") for i in range(3)],
            (23, PASSING + " tail", "en", "src_dup"),
            (30, None, "en", "src_null"),
            (31, "   ", "en", "src_null"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        )

    def test_signals_and_flags(self, spark):
        from data_quality_spark.operators.quality_filters import (
            source_reputation,
        )

        out = {
            r.source: r
            for r in source_reputation(
                self._corpus(spark), min_words=5, max_words=50
            ).collect()
        }
        good = out["src_good"]
        # the cross-source template copy is one dup and one gopher fail:
        # 1/4 misses the 7/10 quality law but meets the 1/5 dup law
        assert good.n_gopher_fail == 1 and good.n_dup == 1
        assert not good.flag_quality and good.flag_dup
        farm = out["src_farm"]
        assert farm.n_gopher_fail == 4 and farm.flag_quality
        assert farm.n_dup == 4 and farm.flag_dup  # identical junk = dups
        dup = out["src_dup"]
        assert dup.n_dup == 3 and dup.flag_dup
        nul = out["src_null"]
        assert nul.n_null_empty == 2 and nul.n_dup == 0  # blanks never dup
        assert nul.flag_quality  # NULL/blank docs fail gopher wholesale

    def test_junk_within_source_is_itself_dup(self, spark):
        # identical junk docs within one source ARE corpus-wide dups —
        # the farm flags on BOTH axes
        from data_quality_spark.operators.quality_filters import (
            source_reputation,
        )

        out = {
            r.source: r
            for r in source_reputation(
                self._corpus(spark), min_words=5, max_words=50
            ).collect()
        }
        farm = out["src_farm"]
        assert farm.n_dup == 4 and farm.flag_dup
