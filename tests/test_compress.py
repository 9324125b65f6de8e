"""Compression-ratio quality signal: fixed-point law, class separation
(prose / template spam / base64 garbage), short-doc guard, NULL text,
Spark-vs-Python exactness, injection byte-parity, and the issue
contract."""

from __future__ import annotations

import base64
import hashlib
import zlib

import pytest

from data_quality_spark.operators.compress import (
    RANDOM_MIN_BYTES,
    RANDOM_Q,
    REPETITIVE_Q,
    Z_LEVEL,
    compression_flags,
    compression_issues,
    compression_stats,
)
from data_quality_spark.oracles import compression_inject

PROSE = (
    "the quick brown fox jumps over the lazy dog while the river "
    "carries the morning light past the old stone bridge and the "
    "market square fills slowly with carts and quiet conversation "
    "about the coming harvest and the price of winter grain"
)


def _ratio_q(t: str) -> int:
    b = t.encode("utf-8")
    return (len(b) << 20) // len(zlib.compress(b, Z_LEVEL))


def test_class_separation_margins():
    assert RANDOM_Q < _ratio_q(PROSE) < REPETITIVE_Q
    spam = " ".join(["buy cheap now"] * 80)
    assert _ratio_q(spam) >= REPETITIVE_Q
    junk = "".join(
        base64.b64encode(
            bytes.fromhex(hashlib.md5(f"9#{i}".encode()).hexdigest())
        ).decode()
        for i in range(10)
    )
    assert len(junk.encode()) >= RANDOM_MIN_BYTES
    assert _ratio_q(junk) <= RANDOM_Q


def test_inject_rule():
    assert compression_inject(3, "x") != "x"  # spam class
    assert compression_inject(9, "x") != "x"  # garbage class
    assert compression_inject(4, "keep") == "keep"
    assert _ratio_q(compression_inject(20, "")) >= REPETITIVE_Q
    assert _ratio_q(compression_inject(26, "")) <= RANDOM_Q


def test_spark_exactness_and_flags(spark):
    rows = [
        (1, PROSE),
        (3, None),  # NULL text → empty
        (20, compression_inject(20, "")),   # spam
        (26, compression_inject(26, "")),   # garbage
        (7, "hi"),  # short: never random-flags despite poor ratio
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in compression_flags(df).collect()}
    for doc_id, text in rows:
        b = (text or "").encode("utf-8")
        z = len(zlib.compress(b, Z_LEVEL))
        r = got[doc_id]
        assert (r["n_bytes"], r["z_bytes"]) == (len(b), z), doc_id
        assert r["ratio_q"] == (len(b) << 20) // z
    assert not got[1]["is_repetitive"] and not got[1]["is_random"]
    assert got[20]["is_repetitive"] and not got[20]["is_random"]
    assert got[26]["is_random"] and not got[26]["is_repetitive"]
    assert not got[7]["is_random"]  # short-doc guard
    issues = {r["issue_type"]: r for r in compression_issues(
        compression_flags(df)).collect()}
    assert issues["compress_repetitive"]["count"] == 1
    assert issues["compress_random"]["count"] == 1
    assert issues["compress_repetitive"]["severity"] == "warning"
    assert issues["compress_repetitive"]["total"] == len(rows)


def test_query_matches_twin(spark, sf_dir):
    import __spark_entry__ as e
    from data_quality_spark.oracles import _compression_expected, _read_documents

    got = e.queries()["compression_ratio"](spark, sf_dir).collect()
    exp = _compression_expected(_read_documents(sf_dir))
    assert len(got) == len(exp["doc_id"])
    n_rep = n_rnd = 0
    for i, r in enumerate(got):
        for col in ("doc_id", "n_bytes", "z_bytes", "ratio_q",
                    "is_repetitive", "is_random"):
            assert r[col] == exp[col][i], (r["doc_id"], col)
        n_rep += int(r["is_repetitive"])
        n_rnd += int(r["is_random"])
    assert n_rep > 0 and n_rnd > 0  # both injected classes fire
