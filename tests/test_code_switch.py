"""Within-document code-switch detection: seeded bilingual docs flag,
monolingual lexicon docs never do, window/fold laws behave at the edges."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.code_switch import (
    CONF_MIN,
    MIN_TAIL,
    WINDOW_TOKENS,
    doc_windows,
    fold_windows,
    snippet,
)


def test_doc_windows_law():
    toks = " ".join(str(i) for i in range(44))
    ws = doc_windows(toks)
    # 44 tokens -> 20 + 24 (the 4-token tail merges into window 2)
    assert [len(w.split()) for w in ws] == [20, 24]
    # a MIN_TAIL-sized tail stands alone
    ws5 = doc_windows(" ".join(str(i) for i in range(45)))
    assert [len(w.split()) for w in ws5] == [20, 20, 5]
    assert doc_windows("a b c") == []  # under MIN_TAIL: not evaluable
    assert doc_windows(None) == []
    ws2 = doc_windows(" ".join(str(i) for i in range(40)))
    assert [len(w.split()) for w in ws2] == [20, 20]


def test_fold_law_exact():
    st = fold_windows(["en", "es", "en", "es"], [0.9, 0.9, 0.9, 0.9])
    assert st["code_switched"] and st["n_switches"] == 3
    assert st["dominant_lang"] == "en"  # tie -> lexicographically smallest
    assert st["minority_cnt"] == 2
    # one foreign window in 8 is a quote, not a switch (1*4 < 8)
    st = fold_windows(["en"] * 7 + ["es"], [0.9] * 8)
    assert not st["code_switched"]
    # unconfident windows never vote
    st = fold_windows(["en", "es"], [0.9, CONF_MIN - 0.01])
    assert st["n_confident"] == 1 and not st["code_switched"]


@pytest.mark.usefixtures("spark")
def test_scan_seeded_bilingual(spark):
    from data_quality_spark.operators.code_switch import code_switch_scan

    rows = [
        (1, snippet("en", 40) + " " + snippet("es", 40)),   # block switch
        (2, snippet("en", 80)),                             # monolingual
        (3, snippet("ru", 20) + " " + snippet("de", 20)
            + " " + snippet("ru", 20) + " " + snippet("de", 20)),  # interleaved
        (4, "too short"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in code_switch_scan(df).collect()}
    assert got[1]["code_switched"] and got[1]["n_langs"] == 2
    assert got[1]["n_switches"] == 1  # A|B block structure
    assert not got[2]["code_switched"] and got[2]["dominant_lang"] == "en"
    assert got[3]["code_switched"] and got[3]["n_switches"] >= 3  # A|B|A|B
    assert got[4]["n_windows"] == 0 and not got[4]["code_switched"]
    assert got[5]["n_windows"] == 0 and got[5]["dominant_lang"] == "und"
