"""Bloom-prefilter decontamination laws.

The guarantees under test: (1) no false negatives — every exact hit
survives the prefilter, on real corpus data; (2) the confirmed_* columns
equal the exact operator's answer exactly; (3) the two membership
implementations (pure-Catalyst binary literal vs vectorized-UDF over a
broadcast) decide identically per gram; (4) the build folds partition
bitsets correctly (set bits == the positions of every key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_quality_spark.operators.bloom_decon import (
    bloom_build,
    bloom_decontamination_report as report,
    bloom_hit_col,
    bloom_hit_udf,
    bloom_positions_col,
)
from data_quality_spark.operators.quality_filters import decontaminate

M, K = 4096, 6


@pytest.fixture(scope="module")
def grams(spark):
    return spark.createDataFrame(
        [(f"tok{i} tok{i+1} tok{i+2} tok{i+3}",) for i in range(40)],
        "gram string",
    )


def test_build_sets_exactly_the_key_positions(spark, grams):
    import numpy as np

    bitset = np.frombuffer(bloom_build(grams, M, K), dtype=np.uint8)
    pos = {
        p
        for r in grams.select(
            bloom_positions_col(F.col("gram"), M, K).alias("p")
        ).collect()
        for p in r["p"]
    }
    set_bits = {
        i * 8 + b for i in range(len(bitset)) for b in range(8)
        if (bitset[i] >> b) & 1
    }
    assert set_bits == pos


def test_catalyst_and_udf_paths_agree(spark, grams):
    bitset = bloom_build(grams, M, K)
    probe = spark.createDataFrame(
        [(f"tok{i} tok{i+1} tok{i+2} tok{i+3}",) for i in range(0, 200, 3)]
        + [(f"zz{i} a b c",) for i in range(100)],
        "gram string",
    ).withColumn("p", bloom_positions_col(F.col("gram"), M, K))
    both = probe.select(
        "gram",
        bloom_hit_col(F.col("p"), bitset).alias("cat"),
        bloom_hit_udf(spark, bitset)(F.col("p")).alias("udf"),
    ).collect()
    assert all(r["cat"] == r["udf"] for r in both)
    # members always hit
    hits = {r["gram"]: r["cat"] for r in both}
    for i in range(0, 40, 3):
        assert hits[f"tok{i} tok{i+1} tok{i+2} tok{i+3}"] is True


def test_no_false_negatives_and_confirmed_equals_exact(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = {r["source"]: r.asDict()
           for r in report(docs, "src0", n=4).collect()}
    for r in rep.values():
        assert r["bloom_docs"] >= r["confirmed_docs"]
        assert r["bloom_grams"] >= r["confirmed_grams"]

    bench = docs.where(F.col("source") == "src0")
    rest = docs.where(F.col("source") != "src0")
    exact = decontaminate(rest, bench, n=4)
    exact_per_src = {
        r["source"]: (r["docs"], r["grams"])
        for r in rest.select("doc_id", "source")
        .join(exact, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_hits").alias("grams"),
        )
        .collect()
    }
    for src, r in rep.items():
        docs_g, grams_g = exact_per_src.get(src, (0, 0))
        assert r["confirmed_docs"] == docs_g
        assert r["confirmed_grams"] == grams_g


def test_tiny_filter_has_false_positives_measured(spark):
    """With a deliberately undersized filter (2 bits/key, k=1) random
    grams collide — the report must count them in bloom_* and keep
    confirmed_* clean."""
    rows = [(0, "src0", "alpha beta gamma delta epsilon")] + [
        (i, "srcX", f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(1, 400)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    rep = report(docs, "src0", n=4, bits_per_key=2, k=1).collect()
    r = rep[0].asDict()
    assert r["confirmed_docs"] == 0 and r["confirmed_grams"] == 0
    assert r["bloom_grams"] > 0  # collisions measured, not hidden
