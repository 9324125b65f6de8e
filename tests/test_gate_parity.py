"""Differential test: Spark gate pipeline vs the pure-pandas oracle.

BASELINE.md invariants: keep/drop F1 ≥ 0.99, scrubbed transcript
byte-for-byte equality, decoded-PCM SNR ≥ 30 dB, resumable without recompute.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.functions import audio as A
from data_quality_spark.operators.gate import (
    run_medallion_checkpoints,
    salted_gate_aggregate,
)
from pyspark.sql import functions as F

from data_quality_spark.pipeline import gate, gate_issues
from data_quality_spark.synth import generate_clips, oracle_gate

N_CLIPS = 1500


@pytest.fixture(scope="module")
def corpus():
    pdf = generate_clips(N_CLIPS, seed=42)
    return pdf, oracle_gate(pdf)


@pytest.fixture(scope="module")
def spark_result(spark, corpus):
    pdf, _ = corpus
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript", "ingest_day"]]
    )
    decided = gate(df)
    rows = decided.select(
        "clip_id", "decision", "scrubbed", "lang_pred", "rms_db", "silence_frac",
        "clip_frac", "lang_conf", "ppl", "token_count", "rep_ratio",
    ).toPandas()
    return decided, rows.set_index("clip_id").sort_index()


def test_keep_drop_f1(corpus, spark_result):
    _, oracle = corpus
    _, spark_rows = spark_result
    o = oracle.set_index("clip_id").sort_index()
    assert len(o) == len(spark_rows)
    y_true = (o["decision"] == "keep").to_numpy()
    y_pred = (spark_rows["decision"] == "keep").to_numpy()
    tp = int((y_true & y_pred).sum())
    fp = int((~y_true & y_pred).sum())
    fn = int((y_true & ~y_pred).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    mismatches = o.index[(y_true != y_pred)].tolist()
    assert f1 >= 0.99, f"F1={f1:.4f}, mismatches={mismatches[:10]}"


def test_scrub_byte_equality(corpus, spark_result):
    _, oracle = corpus
    _, spark_rows = spark_result
    o = oracle.set_index("clip_id").sort_index()
    mismatch = [
        (i, o.loc[i, "scrubbed"], spark_rows.loc[i, "scrubbed"])
        for i in o.index
        if o.loc[i, "scrubbed"] != spark_rows.loc[i, "scrubbed"]
    ]
    assert not mismatch, f"{len(mismatch)} scrub mismatches, first: {mismatch[:3]}"


def test_feature_value_parity(corpus, spark_result):
    """Spark features are the same float64s the oracle computed."""
    _, oracle = corpus
    _, spark_rows = spark_result
    o = oracle.set_index("clip_id").sort_index()
    ok = o["decode_ok"].to_numpy()
    for col in ["rms_db", "silence_frac", "clip_frac", "lang_conf", "ppl"]:
        a = o[col].to_numpy(dtype=float)[ok]
        b = spark_rows[col].to_numpy(dtype=float)[ok]
        assert np.allclose(a, b, rtol=1e-9, atol=1e-12, equal_nan=True), col


def test_decoded_pcm_snr(corpus):
    """Decode through the shared kernels: encode→decode SNR ≥ 30 dB for all
    decodable codecs (µ-law is the lossy floor)."""
    pdf, _ = corpus
    rng = np.random.default_rng(5)
    sample = pdf[pdf["defect"] == "none"].sample(40, random_state=7)
    for _, r in sample.iterrows():
        pcm = A.decode_clip(r["bytes"], r["codec"], r["sr_hz"])
        assert pcm.size > 0
        # re-encode with the same codec: SNR of the round trip
        if r["codec"] == "mulaw":
            y = A.decode_mulaw(A.encode_mulaw(pcm))
        else:
            y = A.decode_pcm16(A.encode_pcm16(pcm))
        snr = 10 * np.log10(np.sum(pcm**2) / max(np.sum((pcm - y) ** 2), 1e-30))
        assert snr >= 30.0


def test_gate_issue_counts_match_decisions(corpus, spark_result):
    decided, spark_rows = spark_result
    issues = {r["issue_type"]: r["count"] for r in gate_issues(decided).collect()}
    n_drop = int((spark_rows["decision"] == "drop").sum())
    # every drop is explained by ≥1 rule violation
    assert sum(issues.values()) >= n_drop
    assert issues.get("decode_failed", 0) > 0


def test_salted_gate_aggregate(spark_result):
    decided, spark_rows = spark_result
    agg = salted_gate_aggregate(decided, salt_buckets=8).toPandas()
    assert int(agg["n_clips"].sum()) == len(spark_rows)
    assert int(agg["n_keep"].sum()) == int((spark_rows["decision"] == "keep").sum())
    assert ((agg["keep_rate"] >= 0) & (agg["keep_rate"] <= 1)).all()
    # skewed keys present: en/pcm16 dominates by construction
    top = agg.sort_values("n_clips", ascending=False).iloc[0]
    assert top["lang_pred"] == "en" and top["codec"] == "pcm16"


def test_medallion_checkpoints(corpus, spark_result):
    pdf, _ = corpus
    decided, _ = spark_result
    bronze = decided.sparkSession.createDataFrame(
        pdf[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]]
    )
    res = run_medallion_checkpoints(bronze, decided)
    b = res["bronze_to_silver"]
    # seeded sr/codec defects are warnings → issues present but no criticals,
    # and success ⇔ zero criticals (ref checkpoints.py:99)
    assert b.success and b.failed_records > 0
    assert any(i["issue_type"] == "sample_rate_enum" for i in b.issues)
    assert any(i["issue_type"] == "codec_enum" for i in b.issues)
    g = res["silver_to_gold"]
    # gate dropped everything the gold rules would flag → gold gate passes
    assert g.success, g.issues


def test_decision_reason_audit_trail(spark):
    from data_quality_spark.pipeline import gate
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(300, seed=29)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    decided = gate(spark.createDataFrame(pdf[cols], CLIPS_SCHEMA)).select(
        "decision", "decision_reason"
    )
    rows = decided.collect()
    # every dropped row names its first violated rule; kept rows carry NULL
    assert all((r.decision == "drop") == (r.decision_reason is not None) for r in rows)
    from data_quality_spark.pipeline import DROP_RULES

    reasons = {r.decision_reason for r in rows if r.decision_reason}
    assert reasons and reasons <= set(DROP_RULES)


def test_three_way_decision(spark):
    from data_quality_spark.pipeline import _text_heuristics, decide, decide3, featurize
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    pdf = generate_clips(300, seed=37)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    feat = _text_heuristics(
        featurize(spark.createDataFrame(pdf[cols], CLIPS_SCHEMA))
    ).cache()
    try:
        d3 = {r.clip_id: r.decision for r in decide3(feat).collect()}
        d2 = {r.clip_id: r.decision for r in decide(feat).collect()}
        assert set(d3.values()) <= {"accept", "graylist", "reject"}
        # 3-way collapses onto the binary gate: accept ⇔ keep
        for cid, dec in d3.items():
            assert (dec == "accept") == (d2[cid] == "keep")
        assert "reject" in d3.values() and "graylist" in d3.values()
    finally:
        feat.unpersist()


def test_clips_funnel_monotone_and_ties_to_gate(spark, corpus):
    """The funnel attributes drops to stages without changing the decision:
    columns non-increasing left-to-right, and the tail equals the gate's
    keep count per codec."""
    from data_quality_spark.pipeline import (
        _text_heuristics,
        clips_funnel,
        featurize,
    )

    pdf, _ = corpus
    df = spark.createDataFrame(
        pdf[["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
             "ingest_day"]]
    )
    feats = _text_heuristics(featurize(df))
    fun = {r["codec"]: r.asDict() for r in clips_funnel(feats).collect()}
    keep = {
        r["codec"]: r["n"]
        for r in gate(df)
        .where("decision = 'keep'")
        .groupBy("codec")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert fun  # corpus covers several codecs
    for codec, row in fun.items():
        seq = [row["n_raw"], row["n_decode_ok"], row["n_signal_ok"],
               row["n_transcript_ok"], row["n_keep"]]
        assert seq == sorted(seq, reverse=True), codec
        assert row["n_keep"] == keep.get(codec, 0), codec
