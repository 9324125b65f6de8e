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


def test_encoding_audit_detects_each_class(spark):
    from data_quality_spark.operators.docs import encoding_audit

    rows = [
        (1, "clean normal prose here", "en"),
        (2, "broken caf�e record", "en"),        # replacement char
        (3, "stray bell\x07inside", "en"),             # C0 control
        (4, "double encoded cafÃ© and donâ€™t", "en"),  # mojibake
        (5, None, "en"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = encoding_audit(docs).collect()[0]
    assert r["n_docs"] == 5
    assert r["n_replacement_docs"] == 1 and r["total_replacement"] == 1
    assert r["n_control_docs"] == 1 and r["total_control"] == 1
    assert r["n_mojibake_docs"] == 1 and r["total_mojibake"] == 2
    assert r["n_suspect"] == 3


def test_encoding_audit_injection_nonzero(spark, sf_dir):
    """The oracled query's inject_every plants one defect per class —
    the audit must see all three classes on the clean corpus."""
    from data_quality_spark.operators.docs import encoding_audit

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = encoding_audit(docs, inject_every=50).groupBy().sum().collect()[0]
    assert agg["sum(total_replacement)"] > 0
    assert agg["sum(total_control)"] > 0
    assert agg["sum(total_mojibake)"] > 0
    # and the raw corpus is clean
    clean = encoding_audit(docs).groupBy().sum().collect()[0]
    assert clean["sum(n_suspect)"] == 0


def test_vocab_stats_head(spark):
    from data_quality_spark.operators.docs import vocab_stats

    docs = spark.createDataFrame(
        [(1, "apple banana apple", "en"),
         (2, "apple cherry", "en"),
         (3, None, "en"),
         (4, "   ", "en")],
        "doc_id long, text string, lang string",
    )
    rows = vocab_stats(docs, top_k=2).collect()
    assert [r["token"] for r in rows] == ["apple", "banana"]  # tie: token asc
    assert rows[0]["freq"] == 3 and rows[0]["doc_freq"] == 2
    assert rows[1]["freq"] == 1


def test_length_histogram_buckets(spark):
    from data_quality_spark.operators.docs import length_histogram

    docs = spark.createDataFrame(
        [(1, "", "en"), (2, None, "en"), (3, "a", "en"), (4, "abc", "en"),
         (5, "x" * 1024, "en"), (6, "y" * 1025, "en")],
        "doc_id long, text string, lang string",
    )
    rows = {r["bucket_lo"]: r for r in length_histogram(docs).collect()}
    assert rows[0]["n_docs"] == 2              # empty + NULL
    assert rows[1]["n_docs"] == 1              # len 1
    assert rows[2]["n_docs"] == 1              # len 3 → bucket 2
    assert rows[1024]["n_docs"] == 2           # 1024 and 1025
    assert rows[1024]["total_chars"] == 2049


def test_lang_confusion_and_outliers(spark):
    from data_quality_spark.operators.docs import lang_confusion, lang_outliers

    rows = [
        (1, "the and of to in this that with", "en"),   # en markers
        (2, "der und die das nicht mit ein", "de"),     # de markers
        (3, "the and of to in this that with", "de"),   # mislabeled: en text
        (4, "zz qq ww ee rr tt", "en"),                 # no markers -> und
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    conf = {(r["lang"], r["pred_lang"]): r["n_docs"]
            for r in lang_confusion(df).collect()}
    assert conf[("en", "en")] == 1
    assert conf[("de", "de")] == 1
    assert conf[("de", "en")] == 1   # the mislabeled doc lands off-diagonal
    assert conf[("en", "und")] == 1  # markerless doc never counted as noise
    out = lang_outliers(df).collect()
    assert [(r["doc_id"], r["lang"], r["pred_lang"]) for r in out] == [
        (3, "de", "en")
    ]
