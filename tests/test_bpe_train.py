"""Distributed BPE trainer: the written spec checked by hand.

The Sennrich'16 worked example (low/lower/newest/widest) has
hand-computable merges including a three-way count tie that exercises
the lexicographic tie-break law; the encoder law is checked on a word
the trainer never saw.
"""

from __future__ import annotations

from collections import Counter

import pytest

from data_quality_spark.operators.bpe_train import (
    END_WORD,
    bpe_encode_stats,
    capture_vocab,
    encode_word,
    learn_bpe,
    learn_merges,
    merges_report,
    word_counts,
)

# Sennrich'16 example counts
VOCAB = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_hand_computed_merges():
    merges = learn_merges(VOCAB, num_merges=5)
    # count 9 three-way tie (e,s)/(s,t)/(t,</w>) -> lexicographic picks (e,s)
    assert merges[0] == ("e", "s", "es", 9)
    assert merges[1] == ("es", "t", "est", 9)
    assert merges[2] == ("est", END_WORD, "est" + END_WORD, 9)
    # count 7 tie (l,o)/(o,w) -> (l,o)
    assert merges[3] == ("l", "o", "lo", 7)
    assert merges[4] == ("lo", "w", "low", 7)


def test_min_count_stops():
    merges = learn_merges([("ab", 1)], num_merges=10, min_count=2)
    assert merges == []
    merges = learn_merges([("ab", 3)], num_merges=10, min_count=2)
    assert merges[0] == ("a", "b", "ab", 3)


def test_encoder_on_unseen_word():
    merges = learn_merges(VOCAB, num_merges=5)
    ranks = {(l, r): i for i, (l, r, _m, _n) in enumerate(merges)}
    # "lowest" was never in the vocab; greedy lowest-rank-first yields
    # low + est</w>
    assert encode_word("lowest", ranks) == ["low", "est" + END_WORD]
    # no applicable merge -> chars + end symbol
    assert encode_word("zq", {}) == ["z", "q", END_WORD]


def test_encoder_reassembly_property():
    merges = learn_merges(VOCAB, num_merges=50)
    ranks = {(l, r): i for i, (l, r, _m, _n) in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest", "newer",
              "wide", "slowest"]:
        toks = encode_word(w, ranks)
        joined = "".join(toks)
        assert joined.endswith(END_WORD)
        assert joined[: -len(END_WORD)] == w


def test_word_counts_matches_counter(spark):
    rows = [("a b  c",), ("b\tc\nc",), ("",), ("  a ",)]
    df = spark.createDataFrame(rows, "text string")
    got = {r["word"]: r["n"] for r in word_counts(df).collect()}
    exp = Counter()
    for (t,) in rows:
        exp.update(w for w in t.replace("\t", " ").replace("\n", " ")
                   .split(" ") if w)
    assert got == dict(exp)


def test_capture_vocab_deterministic_order(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("a",), ("c",), ("c",)], "text string"
    )
    vocab = capture_vocab(word_counts(df), top_words=2)
    # ties on count=2 break on word ASC
    assert vocab == [("a", 2), ("c", 2)]


def test_learn_bpe_and_stats_end_to_end(spark):
    corpus = [("en", " ".join(["low"] * 5 + ["lower"] * 2)),
              ("de", " ".join(["newest"] * 6 + ["widest"] * 3))]
    df = spark.createDataFrame(corpus, "lang string, text string")
    merges = learn_bpe(df, num_merges=5, min_count=2)
    assert [m[:2] for m in merges] == [
        ("e", "s"), ("es", "t"), ("est", END_WORD), ("l", "o"),
        ("lo", "w"),
    ]
    rep = merges_report(spark, merges)
    assert rep.columns == ["rank", "left", "right", "merged", "pair_count"]
    assert rep.count() == 5

    stats = {r["lang"]: r.asDict() for r in
             bpe_encode_stats(df, merges).collect()}
    ranks = {(l, r): i for i, (l, r, _m, _n) in enumerate(merges)}
    for lang, words in [("en", ["low"] * 5 + ["lower"] * 2),
                        ("de", ["newest"] * 6 + ["widest"] * 3)]:
        assert stats[lang]["n_docs"] == 1
        assert stats[lang]["total_words"] == len(words)
        assert stats[lang]["total_chars"] == sum(len(w) for w in words)
        assert stats[lang]["total_tokens"] == sum(
            len(encode_word(w, ranks)) for w in words
        )


def test_trainer_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = learn_bpe(docs, num_merges=30)
    b = learn_bpe(docs, num_merges=30)
    assert a == b and len(a) > 0


def test_twin_matches_operator(sf_dir):
    """The independently-written oracle trainer must reproduce the
    operator's merges exactly on real corpus data."""
    from data_quality_spark.oracles import _bpe_twin_learn
    from data_quality_spark.session import get_spark

    spark = get_spark("dq-tests", master="local[4]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert learn_bpe(docs) == _bpe_twin_learn(sf_dir)
