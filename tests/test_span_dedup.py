"""Exact-substring span dedup (operators/span_dedup.py) vs a brute-force
pure-Python twin: duplicated k-gram discovery, interval merge, and the
order-exact cleaned-text rebuild."""

from __future__ import annotations

import hashlib

import pytest

from data_quality_spark.operators.span_dedup import (
    duplicated_spans,
    remove_duplicated_spans,
    span_dedup_stats,
)


def _brute_spans(texts: dict[int, str | None], k: int, min_count: int = 2):
    """Independent twin: count k-grams with a dict, mark starts, merge
    intervals with plain Python."""
    toks = {
        i: ([] if t is None or not t.strip() else t.split())
        for i, t in texts.items()
    }
    counts: dict[str, int] = {}
    for arr in toks.values():
        for s in range(len(arr) - k + 1):
            g = " ".join(arr[s : s + k])
            counts[g] = counts.get(g, 0) + 1
    spans: dict[int, list[tuple[int, int]]] = {}
    for i, arr in toks.items():
        starts = [
            s
            for s in range(len(arr) - k + 1)
            if counts[" ".join(arr[s : s + k])] >= min_count
        ]
        merged: list[list[int]] = []
        for s in starts:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], s + k)
            else:
                merged.append([s, s + k])
        spans[i] = [(a, b) for a, b in merged]
    return toks, spans


def _brute_clean(arr: list[str], spans: list[tuple[int, int]]) -> str:
    covered = set()
    for a, b in spans:
        covered.update(range(a, b))
    return " ".join(t for j, t in enumerate(arr) if j not in covered)


CORPUS = {
    # docs 1 and 2 share a 6-token run; doc 3 repeats a 4-token run
    # internally twice; doc 4 is clean; doc 5 NULL; doc 6 blank.
    1: "a b c d e f g h i j unique1 tail1 x1 y1 z1",
    2: "lead2 a b c d e f g h i j other2 w2",
    3: "p q r s GAP1 GAP2 p q r s end3 m3 n3",
    4: "totally fresh words nothing shared here at all ok fine",
    5: None,
    6: "   ",
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, t, "en") for i, t in CORPUS.items()]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_spans_match_bruteforce(spark, docs):
    for k in (3, 4, 6):
        toks, exp = _brute_spans(CORPUS, k)
        got = {
            (r["__id"], r["start"], r["end"])
            for r in duplicated_spans(docs, k=k, id_col="doc_id").collect()
        }
        want = {(i, a, b) for i, sp in exp.items() for a, b in sp}
        assert got == want, f"k={k}"


def test_stats_and_md5_match_bruteforce(spark, docs):
    k = 4
    toks, exp = _brute_spans(CORPUS, k)
    out = {r["doc_id"]: r for r in span_dedup_stats(docs, k=k).collect()}
    assert set(out) == set(CORPUS)
    for i, arr in toks.items():
        r = out[i]
        assert r["total_tokens"] == len(arr)
        assert r["n_spans"] == len(exp[i])
        assert r["dup_tokens"] == sum(b - a for a, b in exp[i])
        if CORPUS[i] is None:
            assert r["clean_md5"] is None
        else:
            clean = _brute_clean(arr, exp[i])
            assert r["clean_md5"] == hashlib.md5(clean.encode()).hexdigest()


def test_transform_rebuild_order_exact(spark, docs):
    k = 4
    toks, exp = _brute_spans(CORPUS, k)
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, k=k).collect()}
    for i, arr in toks.items():
        if CORPUS[i] is None:
            assert out[i]["text"] is None
            assert out[i]["n_spans_removed"] == 0
        else:
            assert out[i]["text"] == _brute_clean(arr, exp[i]), i
            assert out[i]["n_tokens_removed"] == sum(b - a for a, b in exp[i])
    # other columns pass through
    assert out[1]["lang"] == "en"


def test_overlapping_windows_merge_to_one_span(spark):
    # one 8-token duplicated run with k=4 -> 5 overlapping windows -> 1 span
    t = "s1 s2 c1 c2 c3 c4 c5 c6 c7 c8 e1 e2"
    u = "z1 c1 c2 c3 c4 c5 c6 c7 c8 z2"
    df = spark.createDataFrame([(1, t), (2, u)], "doc_id long, text string")
    spans = {
        r["__id"]: (r["start"], r["end"])
        for r in duplicated_spans(df, k=4).collect()
    }
    assert spans == {1: (2, 10), 2: (1, 9)}


def test_within_doc_repeat_counts_as_duplicate(spark):
    df = spark.createDataFrame(
        [(1, "r1 r2 r3 mid1 mid2 r1 r2 r3 tail")],
        "doc_id long, text string",
    )
    got = duplicated_spans(df, k=3).collect()
    assert {(r["start"], r["end"]) for r in got} == {(0, 3), (5, 8)}


def test_hash_vs_string_gram_keys_agree(spark, docs):
    a = span_dedup_stats(docs, k=4, hash_grams=True).collect()
    b = span_dedup_stats(docs, k=4, hash_grams=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_max_gram_docs_guard(spark):
    # a gram in 3 distinct docs is excluded when max_gram_docs=2
    rows = [(i, "g1 g2 g3 g4 pad%d" % i) for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicated_spans(df, k=4, max_gram_docs=2).count() == 0
    assert duplicated_spans(df, k=4).count() == 3
