"""Gate v2 (audio-metric profile) laws.

1. v1-parity: ``featurize_v2`` emits the v1 feature columns from the same
   kernels, bit-identically for the decode-derived fields; every clip the
   v1 gate drops keeps its v1 ``decision_reason`` under v2 (the v2 ladder
   lists the v1 rules first); the v2 keep set is a subset of the v1 keep
   set (monotone: v2 only adds rules).
2. Defect detection: seeded interior-dropout / DC-bias / stuck-sample
   defects that the v1 gate cannot see are dropped by v2 with the right
   reason, while the unmutated clip stays kept under both profiles.
3. Constant sync: the pipeline's speaking-rate band equals the
   ``audio_vad.speaking_rate`` defaults (they are documented as mirrors).
4. Execute-once: gate_v2 decodes each clip exactly once per job.
"""

from __future__ import annotations

import inspect

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_quality_spark.pipeline import (
    DROP_RULES,
    DROP_RULES_V2,
    FEATURES_TYPE,
    SPEAK_MAX_CPS,
    SPEAK_MIN_CPS,
    SPEAK_MIN_SPEECH_MS,
    featurize,
    featurize_v2,
    gate,
    gate_v2,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import generate_clips

N = 300
COLS = [f.name for f in CLIPS_SCHEMA.fields]


@pytest.fixture(scope="module")
def corpus_pdf():
    return generate_clips(N, seed=42)


@pytest.fixture(scope="module")
def clips(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf[COLS], CLIPS_SCHEMA).repartition(
        4, "clip_id"
    )


def test_rule_order_is_v1_prefix():
    assert list(DROP_RULES_V2)[: len(DROP_RULES)] == list(DROP_RULES)
    assert all(DROP_RULES_V2[k] == v for k, v in DROP_RULES.items())
    assert set(DROP_RULES_V2.values()) <= {"critical", "warning"}


def test_speaking_rate_constants_match_operator():
    from data_quality_spark.operators.audio_vad import speaking_rate

    sig = inspect.signature(speaking_rate)
    assert sig.parameters["min_cps"].default == SPEAK_MIN_CPS
    assert sig.parameters["max_cps"].default == SPEAK_MAX_CPS
    assert sig.parameters["min_speech_ms"].default == SPEAK_MIN_SPEECH_MS


def test_v1_feature_parity(spark, clips):
    names = [f.name for f in FEATURES_TYPE.fields]
    v1 = (
        featurize(clips).select("clip_id", *names).toPandas()
        .set_index("clip_id").sort_index()
    )
    v2 = (
        featurize_v2(clips).select("clip_id", *names).toPandas()
        .set_index("clip_id").sort_index()
    )
    # decode-derived fields share the exact kernel path: bit-identical
    for c in ("decode_ok", "rms_db", "peak_db", "silence_frac", "clip_frac",
              "n_samples", "lang_pred"):
        a, b = v1[c].to_numpy(), v2[c].to_numpy()
        if a.dtype.kind == "f":
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), c
        else:
            assert (a == b).all(), c
    # langid/ppl sums are batch-composition-stable to ~1e-14 only
    for c in ("lang_conf", "ppl"):
        a, b = v1[c].to_numpy(), v2[c].to_numpy()
        assert np.allclose(a, b, rtol=0, atol=1e-9, equal_nan=True), c


def test_v2_monotone_and_v1_reason_stable(spark, clips):
    v1 = (
        gate(clips).select("clip_id", "decision", "decision_reason")
        .toPandas().set_index("clip_id").sort_index()
    )
    v2 = (
        gate_v2(clips).select("clip_id", "decision", "decision_reason")
        .toPandas().set_index("clip_id").sort_index()
    )
    drop1 = v1["decision"] == "drop"
    assert (v2.loc[drop1, "decision"] == "drop").all()
    assert (
        v2.loc[drop1, "decision_reason"] == v1.loc[drop1, "decision_reason"]
    ).all()
    extra = (v2["decision"] == "drop") & ~drop1
    v2_only = set(DROP_RULES_V2) - set(DROP_RULES)
    assert set(v2.loc[extra, "decision_reason"]) <= v2_only


def _first_kept_pcm16(spark, pdf):
    """A pcm16 clip both gates keep — the mutation canvas."""
    df = spark.createDataFrame(pdf[COLS], CLIPS_SCHEMA)
    kept = set(
        r["clip_id"]
        for r in gate_v2(df).filter(F.col("decision") == "keep")
        .select("clip_id").collect()
    )
    sel = pdf[(pdf["codec"] == "pcm16") & pdf["clip_id"].isin(kept)]
    assert len(sel) > 0, "no kept pcm16 clip in the seeded corpus"
    return sel.iloc[[0]].copy()


def _decisions(spark, mutated):
    mdf = spark.createDataFrame(mutated[COLS], CLIPS_SCHEMA)
    r1 = gate(mdf).select("decision", "decision_reason").first()
    r2 = gate_v2(mdf).select("decision", "decision_reason").first()
    return r1, r2


class TestSeededDefects:
    def test_interior_dropout_only_v2_catches(self, spark, corpus_pdf):
        row = _first_kept_pcm16(spark, corpus_pdf)
        q = np.frombuffer(row["bytes"].iloc[0], dtype="<i2").copy()
        sr = int(row["sr_hz"].iloc[0])
        run = (sr * 30) // 1000 + 64  # just past the 30 ms dropout law
        mid = q.size // 2
        q[mid : mid + run] = 0
        row["bytes"] = [q.tobytes()]
        r1, r2 = _decisions(spark, row)
        assert r1["decision"] == "keep"
        assert r2["decision"] == "drop"
        assert r2["decision_reason"] == "dropout"

    def test_dc_bias_only_v2_catches(self, spark, corpus_pdf):
        row = _first_kept_pcm16(spark, corpus_pdf)
        q = np.frombuffer(row["bytes"].iloc[0], dtype="<i2").astype(np.int32)
        q = np.clip(q + 1500, -32768, 32767).astype(np.int16)  # >2% FS bias
        row["bytes"] = [q.tobytes()]
        r1, r2 = _decisions(spark, row)
        assert r1["decision"] == "keep"
        assert r2["decision"] == "drop"
        assert r2["decision_reason"] == "dc_offset"

    def test_stuck_plateau_only_v2_catches(self, spark, corpus_pdf):
        from data_quality_spark.operators.audio_dropout import (
            STUCK_MIN_DEFAULT,
        )

        row = _first_kept_pcm16(spark, corpus_pdf)
        q = np.frombuffer(row["bytes"].iloc[0], dtype="<i2").copy()
        mid = q.size // 2
        q[mid : mid + STUCK_MIN_DEFAULT + 8] = 7777
        row["bytes"] = [q.tobytes()]
        r1, r2 = _decisions(spark, row)
        assert r1["decision"] == "keep"
        assert r2["decision"] == "drop"
        assert r2["decision_reason"] == "stuck_samples"


def test_gate_v2_single_decode_pass(spark, clips):
    acc = spark.sparkContext.accumulator(0)
    decided = gate_v2(clips, counter=acc)
    n = decided.count()
    assert n == N
    assert acc.value == N


def test_storage_direct_v2_parity(spark, corpus_pdf, tmp_path_factory):
    """gate_files(profile='v2') over partitioned parquet equals gate_v2
    over the same rows read natively — same kernels, same ladder."""
    from data_quality_spark.pipeline import gate_files
    from data_quality_spark.runner import write_clips

    path = str(tmp_path_factory.mktemp("bronze_v2") / "clips")
    write_clips(spark, corpus_pdf, path)
    via_files = (
        gate_files(spark, path, profile="v2")
        .select("clip_id", "decision", "decision_reason")
        .toPandas().set_index("clip_id").sort_index()
    )
    via_frame = (
        gate_v2(spark.read.parquet(path))
        .select("clip_id", "decision", "decision_reason")
        .toPandas().set_index("clip_id").sort_index()
    )
    assert (via_files["decision"] == via_frame["decision"]).all()
    assert (
        via_files["decision_reason"].fillna("")
        == via_frame["decision_reason"].fillna("")
    ).all()


def test_runner_v2_profile(spark, corpus_pdf, tmp_path_factory):
    """run_gate_pipeline(profile='v2'): silver carries the extended audio
    metrics, keep counts match the batch gate, resume still no-ops."""
    import os

    from data_quality_spark.runner import run_gate_pipeline, write_clips

    path = str(tmp_path_factory.mktemp("bronze_v2r") / "clips")
    write_clips(spark, corpus_pdf, path)
    out = str(tmp_path_factory.mktemp("out") / "gate_v2")
    r1 = run_gate_pipeline(spark, path, out, profile="v2")
    assert r1["completed"] and r1["rows_in"] == N
    silver = spark.read.parquet(os.path.join(out, "silver"))
    for c in ("snr_db", "lufs_i", "speech_ms", "hf_db"):
        assert c in silver.columns
    want_keep = (
        gate_v2(spark.read.parquet(path))
        .filter(F.col("decision") == "keep").count()
    )
    assert r1["rows_kept"] == want_keep == silver.count()
    r2 = run_gate_pipeline(spark, path, out, profile="v2")
    assert r2["days"] == 0 and r2["rows_in"] == 0


class TestV2NaNMetricDefaultLaw:
    """A NaN-emitting kernel must hit the explicit no-evidence defaults:
    NaN (like NULL) never fires an audio-metric rule.  Spark's native
    NaN-greatest compare would fire ``loudness_range`` (NaN > LUFS_MAX
    is true) while leaving ``low_snr`` silent — the asymmetry the v1
    gate shipped with; this pins the v2 ladder to the stated law."""

    _SCHEMA = (
        "clip_id string, transcript string, decode_ok boolean, "
        "sr_hz int, dur_ms int, n_samples long, rms_db double, "
        "peak_db double, silence_frac double, clip_frac double, "
        "token_count int, lang_conf double, ppl double, "
        "rep_ratio double, len_ratio double, charclass_frac double, "
        "digit_frac double, speech_ms int, nws_chars int, "
        "snr_db double, lufs_i double, n_dropouts long, "
        "max_const_run long, dc_sum long, bw_rms double, hf_db double"
    )

    def _row(self, clip_id, **overrides):
        healthy = dict(
            clip_id=clip_id, transcript="a clean caption", decode_ok=True,
            sr_hz=16000, dur_ms=1000, n_samples=16000, rms_db=-20.0,
            peak_db=-3.0, silence_frac=0.1, clip_frac=0.0, token_count=3,
            lang_conf=0.99, ppl=50.0, rep_ratio=0.1, len_ratio=20.0,
            charclass_frac=0.0, digit_frac=0.0, speech_ms=0, nws_chars=13,
            snr_db=30.0, lufs_i=-20.0, n_dropouts=0, max_const_run=0,
            dc_sum=0, bw_rms=0.2, hf_db=-10.0,
        )
        healthy.update(overrides)
        return healthy

    def _decide(self, spark, rows):
        from data_quality_spark.pipeline import decide_v2

        df = spark.createDataFrame(
            [tuple(r[k] for k in [f.split(" ")[0] for f in
                                  self._SCHEMA.split(", ")])
             for r in rows],
            self._SCHEMA,
        )
        return {
            r["clip_id"]: (r["decision"], r["decision_reason"])
            for r in decide_v2(df).select(
                "clip_id", "decision", "decision_reason").collect()
        }

    def test_nan_metrics_never_fire_audio_rules(self, spark):
        nan = float("nan")
        got = self._decide(spark, [
            self._row("all_nan", snr_db=nan, lufs_i=nan, bw_rms=nan,
                      hf_db=nan),
            self._row("healthy"),
        ])
        assert got["healthy"] == ("keep", None)
        # the NaN-greatest compare would have dropped this row with
        # reason 'loudness_range'; the explicit law keeps it
        assert got["all_nan"] == ("keep", None)

    def test_real_evidence_still_fires(self, spark):
        from data_quality_spark.operators.audio_audit import (
            LUFS_MAX,
            SNR_MIN_DB,
        )

        got = self._decide(spark, [
            self._row("quiet_snr", snr_db=SNR_MIN_DB - 10.0),
            self._row("too_loud", lufs_i=LUFS_MAX + 10.0),
            self._row("upsampled", bw_rms=0.2, hf_db=-90.0),
        ])
        assert got["quiet_snr"] == ("drop", "low_snr")
        assert got["too_loud"] == ("drop", "loudness_range")
        assert got["upsampled"] == ("drop", "upsampled")

    def test_null_metrics_same_law(self, spark):
        got = self._decide(spark, [
            self._row("all_null", snr_db=None, lufs_i=None, bw_rms=None,
                      hf_db=None),
        ])
        assert got["all_null"] == ("keep", None)

    def test_fallback_inline_defaults_match_projection(self, spark):
        """rule_flags_v2 on a frame WITHOUT the __dqd_* projection (the
        r5 fallback path no production caller exercises anymore) must
        fire identically to the projected path — NaN, NULL, and
        real-evidence rows all agree."""
        from pyspark.sql import functions as F

        from data_quality_spark.pipeline import (
            rule_flags_v2,
            with_metric_defaults,
        )

        nan = float("nan")
        rows = [
            self._row("all_nan", snr_db=nan, lufs_i=nan, bw_rms=nan,
                      hf_db=nan),
            self._row("all_null", snr_db=None, lufs_i=None, bw_rms=None,
                      hf_db=None),
            self._row("quiet_snr", snr_db=-40.0),
            self._row("healthy"),
        ]
        df = spark.createDataFrame(
            [tuple(r[k] for k in [f.split(" ")[0] for f in
                                  self._SCHEMA.split(", ")])
             for r in rows],
            self._SCHEMA,
        )

        def fired(frame):
            flags = rule_flags_v2(frame)
            out = frame.select(
                "clip_id",
                *[F.coalesce(c, F.lit(False)).alias(n)
                  for n, c in flags.items()],
            ).collect()
            return {
                r["clip_id"]: {n for n in flags if r[n]} for r in out
            }

        plain = fired(df)
        projected = fired(with_metric_defaults(df, v2=True))
        assert plain == projected
        assert "low_snr" in plain["quiet_snr"]
        assert not any("loudness_range" in plain[c]
                       for c in ("all_nan", "all_null", "healthy"))
        # idempotence: projecting twice adds nothing and changes nothing
        twice = with_metric_defaults(
            with_metric_defaults(df, v2=True), v2=True)
        assert twice.columns == with_metric_defaults(df, v2=True).columns
        assert fired(twice) == plain

    def test_twin_mdef_agrees_on_nan(self):
        """The oracle twin's _mdef law, exercised directly on NaN: the
        defaulted values must sit exactly on each rule's non-firing
        boundary (the engine's _metric_default constants)."""
        import math

        from data_quality_spark.operators.audio_audit import (
            LUFS_MAX,
            LUFS_MIN,
            SNR_MIN_DB,
        )

        def _mdef(v, default):
            if v is None or (isinstance(v, float) and math.isnan(v)):
                return float(default)
            return float(v)

        nan = float("nan")
        assert not (_mdef(nan, SNR_MIN_DB) < SNR_MIN_DB)
        lufs = _mdef(nan, LUFS_MIN)
        assert not (lufs < LUFS_MIN or lufs > LUFS_MAX)
