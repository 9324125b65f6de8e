"""LSH banding sweep: more bands with fewer rows each must be monotonically
more permissive (candidate sets nest upward in recall direction)."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.dedup import lsh_candidates_multi


@pytest.fixture(scope="module")
def corpus(spark):
    base = ("w%d " * 60).strip()
    rows = []
    for d in range(30):
        toks = [f"d{d}w{i}" for i in range(60)]
        rows.append((d, " ".join(toks)))
        # companion with every 8th token replaced (high-J pair)
        rows.append(
            (1000 + d,
             " ".join(f"x{d}r{i}" if i % 8 == 0 else t
                      for i, t in enumerate(toks)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_configs_labelled_and_monotone(spark, corpus):
    out = lsh_candidates_multi(corpus, "doc_id", "text",
                               band_configs=(8, 16, 32)).collect()
    by_bands = {}
    for r in out:
        by_bands.setdefault(r["bands"], set()).add((r["id_a"], r["id_b"]))
    assert set(by_bands) <= {8, 16, 32}
    n8 = len(by_bands.get(8, set()))
    n16 = len(by_bands.get(16, set()))
    n32 = len(by_bands.get(32, set()))
    # finer bands (fewer rows per band) can only be more permissive in
    # expectation; on this high-J corpus the counts must not decrease
    assert n8 <= n16 <= n32
    # the injected high-J pairs are recovered by the permissive config
    rec32 = sum(1 for (a, b) in by_bands.get(32, set()) if b == a + 1000)
    assert rec32 >= 25
