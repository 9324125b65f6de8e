"""Trained Stupid-Backoff LM: fixed-point log law, hand-replayed scoring
on a seeded corpus (hit / backoff / floor / OOV / short-doc paths), the
exact high_ppl cross-multiplication, and the CPython-vs-DuckDB libm-ln
parity the strict twin rests on."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_quality_spark.operators.lm import (
    LN_SCALE,
    ln_fx,
    lm_perplexity,
    score_backoff,
    train_backoff_lm,
)

DOCS = [
    # train split (doc_id % 10 != 0)
    (1, "the cat sat on the mat"),
    (2, "the cat ran to the mat"),
    (3, "the dog sat on the rug"),
    (4, "a dog ran to a rug"),
    (11, "the cat sat on the mat"),
    # held-out split
    (10, "the cat sat on the mat"),        # all-hit path
    (20, "mat the zzz"),                    # backoff (mat,the) + floor (the,zzz) + oov
    (30, "hi"),                             # short doc: zeros
    (40, None),                             # NULL text: zeros
]


def _counts():
    """Pure-Python replay of training (min_count=1)."""
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    n = 0
    for doc_id, text in DOCS:
        if doc_id % 10 == 0 or not text:
            continue
        toks = text.strip().lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
            n += 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, n


def _expected_row(text, uni, big, n):
    """Replay of score_backoff for one doc (Python ints throughout)."""
    a_fx = ln_fx(0.4)
    ln_n = ln_fx(float(n))
    toks = text.strip().lower().split() if text else []
    nll = 0
    oov = 0
    pairs = list(zip(toks, toks[1:]))
    for w1, w2 in pairs:
        if (w1, w2) in big:
            q = ln_fx(float(big[(w1, w2)])) - ln_fx(float(uni[w1]))
        elif w2 in uni:
            q = a_fx + ln_fx(float(uni[w2])) - ln_n
        else:
            q = a_fx - ln_n
            oov += 1
        nll -= q
    return len(pairs), oov, nll


def test_ln_fx_law():
    assert ln_fx(1.0) == 0
    # ·2^20 is an exact exponent shift: ln_fx(2) is round-half-up of ln2·2^20
    assert ln_fx(2.0) == int(math.floor(math.log(2.0) * LN_SCALE + 0.5))
    assert ln_fx(0.4) < 0  # negative logs floor correctly


def test_score_paths_match_python_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, big, n = _counts()
    lm = train_backoff_lm(
        df.where(F.col("doc_id") % 10 != 0), min_count=1
    )
    assert lm.n_tokens == n
    got = {
        r["doc_id"]: r
        for r in score_backoff(
            df.where(F.col("doc_id") % 10 == 0), lm
        ).collect()
    }
    for doc_id, text in DOCS:
        if doc_id % 10 != 0:
            continue
        nb, oov, nll = _expected_row(text, uni, big, n)
        row = got[doc_id]
        assert row["n_bigrams"] == nb, doc_id
        assert row["oov_bigrams"] == oov, doc_id
        assert row["nll_fx"] == nll, doc_id
        # exact cross-multiplied flag
        assert row["high_ppl"] == (nb > 0 and nll > ln_fx(64.0) * nb), doc_id
    # path coverage: doc 10 all-hit, doc 20 exercises backoff+floor+oov,
    # docs 30/40 are the zero rows
    assert got[10]["oov_bigrams"] == 0 and got[10]["n_bigrams"] == 5
    assert got[20]["oov_bigrams"] == 1 and got[20]["n_bigrams"] == 2
    assert got[30]["n_bigrams"] == 0 and got[30]["nll_fx"] == 0
    assert got[40]["n_bigrams"] == 0 and not got[40]["high_ppl"]


def test_min_count_prunes_to_backoff(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    # min_count=3 prunes most bigrams: every surviving unigram has c>=3
    lm = train_backoff_lm(df.where(F.col("doc_id") % 10 != 0), min_count=3)
    uni, big, n = _counts()
    kept_uni = {w for w, c in uni.items() if c >= 3}
    kept_big = {p for p, c in big.items() if c >= 3}
    assert {(r["w1"], r["w2"]) for r in lm.bigram_scores.collect()} == kept_big
    assert {r["w"] for r in lm.unigram_scores.collect()} == kept_uni


def test_lm_perplexity_end_to_end(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = lm_perplexity(df, min_count=1).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [10, 20, 30, 40]
    assert out[0]["n_bigrams"] == 5


def test_libm_ln_parity_python_vs_duckdb():
    """The strict twin's only cross-engine float op: L(c) for integer
    counts (plus ln 0.4 / ln 64).  Sweep the realistic count domain —
    bit equality of the fixed-point law, not approximate closeness."""
    import duckdb

    vals = (
        list(range(1, 20_001))
        + [10**k for k in range(5, 13)]
        + [3**k for k in range(9, 26)]
        + [123456789, 987654321987, 2**40 + 7]
    )
    con = duckdb.connect()
    con.execute(  # sql-ok: numeric literals rendered into a VALUES fixture
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ",".join(f"({v})" for v in vals)
        + ") t(c)"
    )
    got = dict(
        con.execute(
            "SELECT c, floor(ln(c) * 1048576.0 + 0.5)::BIGINT FROM v"
        ).fetchall()
    )
    for v in vals:
        assert got[v] == ln_fx(float(v)), v
    a, t = con.execute(
        "SELECT floor(ln(0.4)*1048576.0+0.5)::BIGINT,"
        " floor(ln(64.0)*1048576.0+0.5)::BIGINT"
    ).fetchone()
    assert a == ln_fx(0.4) and t == ln_fx(64.0)
