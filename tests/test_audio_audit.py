"""Fused audio-audit contract: one decode, à-la-carte-identical metrics.

The differential oracle verifies the flag ladder + fused aggregation;
these tests pin that the fused pass is bit-identical to the standalone
operators and actually decodes once.
"""

from __future__ import annotations

import numpy as np
import pytest

from data_quality_spark.plans.schemas import CLIPS_SCHEMA


@pytest.mark.usefixtures("spark")
class TestAudioAudit:
    def test_matches_a_la_carte_operators(self, spark):
        from data_quality_spark.operators.audio_audit import audio_audit
        from data_quality_spark.operators.audio_dropout import clip_dropout
        from data_quality_spark.operators.audio_loudness import clip_lufs
        from data_quality_spark.operators.audio_snr import clip_snr
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(120, seed=31)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        fused = audio_audit(df).toPandas().set_index("clip_id")
        snr = clip_snr(df).toPandas().set_index("clip_id")
        lufs = clip_lufs(df).toPandas().set_index("clip_id")
        drop = clip_dropout(df).toPandas().set_index("clip_id")
        for cid in fused.index:
            f = fused.loc[cid]
            # same kernels on the same decode: bit-identical or both-NaN
            for a, b in [(f["snr_db"], snr.loc[cid, "snr_db"]),
                         (f["lufs_i"], lufs.loc[cid, "lufs_i"])]:
                assert (a == b) or (np.isnan(a) and np.isnan(b))
            if f["ok"]:  # clip_dropout NULLs its fields for undecodables;
                # the audit reports the empty-signal zeros instead
                assert f["n_dropouts"] == drop.loc[cid, "n_dropouts"]
                assert f["max_const_run"] == drop.loc[cid, "max_const_run"]
                assert f["dc_sum"] == drop.loc[cid, "dc_sum"]

    def test_hum_matches_a_la_carte_and_flags_seeded(self, spark):
        """The fused hum scan is bit-identical to operators.audio_hum and
        the mains_hum issue row catches the seeded 50/60 Hz corpus."""
        from data_quality_spark.operators.audio_audit import (
            audio_audit,
            audit_issues,
        )
        from data_quality_spark.operators.audio_hum import hum_flags
        from data_quality_spark.synth import make_audio_hum_corpus

        pdf = make_audio_hum_corpus(120, seed=7)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        fused = audio_audit(df).toPandas().set_index("clip_id")
        alac = hum_flags(df).toPandas().set_index("clip_id")
        for cid in fused.index:
            for c in ("hum_frac", "hum_contrast", "hum_hz"):
                a, b = fused.loc[cid, c], alac.loc[cid, c]
                assert (a == b) or (np.isnan(a) and np.isnan(b)), (cid, c)
        got = {r["issue_type"]: r for r in
               audit_issues(audio_audit(df)).collect()}
        n_flagged = int(alac["is_hum"].sum())
        assert got["mains_hum"]["count"] == n_flagged > 0
        assert got["mains_hum"]["severity"] == "warning"

    def test_reverb_matches_a_la_carte_and_flags_seeded(self, spark):
        """The fused decay scan is bit-identical to operators.audio_reverb
        and the reverberant issue row catches the seeded RIR corpus."""
        from data_quality_spark.operators.audio_audit import (
            audio_audit,
            audit_issues,
        )
        from data_quality_spark.operators.audio_reverb import reverb_flags
        from data_quality_spark.synth import make_audio_reverb_corpus

        pdf = make_audio_reverb_corpus(120, seed=11)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        fused = audio_audit(df).toPandas().set_index("clip_id")
        alac = reverb_flags(df).toPandas().set_index("clip_id")
        for cid in fused.index:
            assert fused.loc[cid, "n_decays"] == alac.loc[cid, "n_decays"]
            a, b = fused.loc[cid, "rt60_est"], alac.loc[cid, "rt60_est"]
            assert (a == b) or (np.isnan(a) and np.isnan(b)), cid
        got = {r["issue_type"]: r for r in
               audit_issues(audio_audit(df)).collect()}
        n_flagged = int(alac["is_reverberant"].sum())
        assert got["reverberant"]["count"] == n_flagged > 0
        assert got["reverberant"]["severity"] == "warning"

    def test_single_decode_per_row(self, spark):
        from data_quality_spark.operators.audio_audit import (
            audio_audit,
            audit_issues,
        )
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(80, seed=5)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        counter = spark.sparkContext.accumulator(0)
        issues = audit_issues(audio_audit(df, counter=counter))
        rows = issues.collect()
        assert counter.value == 80  # every clip passed the map exactly once
        assert len(rows) == len(
            __import__("data_quality_spark.operators.audio_audit",
                       fromlist=["AUDIT_RULES"]).AUDIT_RULES)
        assert all(r["total"] == 80 for r in rows)

    def test_issue_counts_track_seeded_defects(self, spark):
        from data_quality_spark.operators.audio_audit import (
            audio_audit,
            audit_issues,
        )
        from data_quality_spark.synth import generate_clips

        pdf = generate_clips(300, seed=42)
        df = spark.createDataFrame(
            pdf[[f.name for f in CLIPS_SCHEMA.fields]], CLIPS_SCHEMA)
        wide = audio_audit(df).toPandas().set_index("clip_id")
        got = {r["issue_type"]: r
               for r in audit_issues(audio_audit(df)).collect()}
        defects = pdf.set_index("clip_id")["defect"].reindex(wide.index)
        # every seeded mostly_silence clip is caught; clean clips never are
        seeded = wide[defects == "mostly_silence"]
        assert len(seeded) and (seeded["silence_frac"] > 0.80).all()
        clean = wide[defects == "none"]
        assert (clean["silence_frac"] <= 0.80).all()
        assert (clean["clip_frac"] <= 0.02).all()
        n_clip = int((defects == "clipped").sum())
        assert 0 < got["clipping"]["count"] <= n_clip
        assert got["undecodable"]["severity"] == "critical"
        assert got["stuck_samples"]["count"] == 0
        assert got["stuck_samples"]["severity"] == "info"  # absent → info
