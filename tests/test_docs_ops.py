"""Text-analysis operator semantics: BPE-ish subword counting and the
stopword-ratio quality signal (the length/punct/stopword quality triad)."""

from __future__ import annotations


def test_bpe_token_stats_fragmentation(spark):
    from data_quality_spark.operators.docs import bpe_token_stats

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", "en", "s", 0),
            (2, "user@example.com costs $5.99 now!", "en", "s", 0),
            (3, None, "de", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r.lang: r for r in bpe_token_stats(docs).collect()}
    en = rows["en"]
    # "the quick brown fox": 4 ws tokens, 4 letter-run subwords
    # "user@example.com costs $5.99 now!": 4 ws tokens but 12 subword units
    #   (user|@|example|.|com|costs|$|5|.|99|now|!)
    assert en.total_ws_tokens == 8
    assert en.total_subwords == 16
    assert en.max_subwords == 12
    assert en.subwords_per_token > 1.5
    assert rows["de"].total_subwords == 0  # NULL text → zero units


def test_stopword_stats_flags_junk(spark):
    from data_quality_spark.operators.docs import stopword_stats

    docs = spark.createDataFrame(
        [
            (1, "the world and the people think good time", "en", "s", 0),
            (2, "zxq qqq vvv kkk mmm nnn", "en", "s", 0),   # ≥5 tokens, 0 stopwords
            (3, "hi", "en", "s", 0),                         # short: not flagged
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = stopword_stats(docs).collect()[0]
    assert r.n_docs == 3 and r.total_tokens == 8 + 6 + 1
    # frequency, not distinct hits: "the" counts twice + "and" once
    assert r.stopword_tokens == 3
    assert r.n_stopword_free == 1
