"""Template-spam audit (operators/spam.py) on a constructed clips corpus.

Seeds the three situations the witness logic must separate:
- one caption pasted on many DISTINCT recordings  -> spam,
- one recording re-uploaded byte-identically many times -> NOT spam
  (one witness, however many rows),
- normalization variants (case / whitespace) of one template collapse
  to the same template identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_spark.operators.spam import (
    caption_spam,
    normalize_template_col,
    template_spam,
)


def _clips(spark):
    rows = []
    # 6 distinct recordings, all carrying the same placeholder caption
    for i in range(6):
        rows.append((f"spam{i}", bytes([i, 1, 2, 3]), "No Transcript  Available."))
    # one recording re-uploaded 8 times (same bytes), same caption
    for i in range(8):
        rows.append((f"dup{i}", b"\x09\x09\x09", "identical re-upload caption"))
    # normalization variants of one template over distinct payloads
    variants = [
        "Click  Here To Subscribe",
        "click here to subscribe",
        " CLICK HERE\tTO SUBSCRIBE ",
        "click\nhere to subscribe",
        "Click Here to Subscribe",
    ]
    for i, v in enumerate(variants):
        rows.append((f"var{i}", bytes([40 + i]), v))
    # honest unique rows
    for i in range(10):
        rows.append((f"uniq{i}", bytes([100 + i]), f"a genuinely unique caption {i}"))
    return spark.createDataFrame(
        rows, "clip_id string, bytes binary, transcript string"
    )


def test_caption_spam_separates_witnesses(spark):
    out = caption_spam(_clips(spark), min_support=5, min_witness=3)
    rows = {r["template_head"]: r.asDict() for r in out.collect()}
    # 3 groups reach support 5: the pasted caption, the re-upload, the variants
    assert len(rows) == 3

    spam = rows["no transcript available."]
    assert spam["n_rows"] == 6 and spam["n_witness"] == 6
    assert spam["is_spam"] is True
    assert spam["sample_id"] == "spam0"

    dup = rows["identical re-upload caption"]
    assert dup["n_rows"] == 8 and dup["n_witness"] == 1
    assert dup["is_spam"] is False  # one recording: duplication, not spam

    var = rows["click here to subscribe"]
    assert var["n_rows"] == 5 and var["n_witness"] == 5
    assert var["is_spam"] is True


def test_support_floor(spark):
    out = caption_spam(_clips(spark), min_support=7, min_witness=3)
    rows = [r["template_head"] for r in out.collect()]
    assert rows == ["identical re-upload caption"]  # only group with >=7 rows


def test_normalization_law(spark):
    df = spark.createDataFrame(
        [(" A\t\tB ",), ("a b",), ("A\nB",), (None,)], "t string"
    )
    vals = [
        r[0] for r in df.select(normalize_template_col(F.col("t"))).collect()
    ]
    assert vals == ["a b", "a b", "a b", ""]


def test_generic_witness_column(spark):
    # same text across 4 sources but only 2 DISTINCT sources -> not spam
    df = spark.createDataFrame(
        [(i, "mirrored body", f"src{i % 2}") for i in range(6)],
        "doc_id long, text string, source string",
    )
    out = template_spam(
        df, "doc_id", "text", "source", min_support=5, min_witness=3
    ).collect()
    assert len(out) == 1
    assert out[0]["n_witness"] == 2 and out[0]["is_spam"] is False
    assert out[0]["sample_id"] == 0
