"""Within-clip multi-speaker (diarize-lite) audit.

Kernel: per-class voice counts on the dialog corpus (single / dialog /
3-speaker panel / tone / unvoiced / silence), decision margins, and the
complementarity claim vs the novelty turn scan (pause-separated dialog:
turn scan sees nothing, diarize sees two voices).  Operator: flags and
decode-failure path.
"""

from __future__ import annotations

import numpy as np

from data_quality_spark.functions.voice import DIST2_MAX, segment_voices
from data_quality_spark.operators.audio_diarize import (
    clip_voices,
    multispeaker_flags,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_dialog_corpus

SR = 16000


def test_kernel_counts_per_class():
    pdf = make_audio_dialog_corpus(42)
    margins = []
    for _, r in pdf.iterrows():
        x = np.asarray(np.frombuffer(r["bytes"], dtype="<i2"))
        st = segment_voices(x, r["sr_hz"])
        d = r["defect"]
        if d.startswith("voices_"):
            assert st["n_voices"] == int(d.split("_")[1]), (r["clip_id"], st)
            if st["max_link_d2"] and st["min_cross_d2"]:
                margins.append((st["max_link_d2"], st["min_cross_d2"]))
        elif d == "tone":
            assert st["n_segments"] == 1 and st["n_voices"] == 1
        elif d == "unvoiced":
            assert st["n_voiced_segments"] == 0 and st["n_voices"] == 0
        else:  # silence
            assert st["n_segments"] == 0
    # decision margins: every link well under the threshold, every
    # cross-voice distance well over
    assert margins
    assert max(m[0] for m in margins) < DIST2_MAX / 2
    assert min(m[1] for m in margins) > DIST2_MAX * 2


def test_kernel_degenerate_inputs():
    assert segment_voices(np.zeros(0, dtype=np.int16), SR)["n_segments"] == 0
    assert segment_voices(np.zeros(2 * SR, dtype=np.int16), 0)[
        "n_segments"] == 0


def test_dialog_invisible_to_turn_scan():
    """The complementarity claim measured: a pause-separated A-B-A-B
    dialog shows ZERO novelty turns (the scan's activity guard excludes
    silence edges) yet two voices here."""
    from data_quality_spark.functions.turns import turn_stats

    pdf = make_audio_dialog_corpus(42)
    blind = 0
    for _, r in pdf[pdf.defect == "voices_2"].iterrows():
        x = np.asarray(np.frombuffer(r["bytes"], dtype="<i2"))
        st = segment_voices(x, r["sr_hz"])
        assert st["n_voices"] == 2
        xf = x.astype(np.float64) / 32767.0
        if turn_stats(xf, r["sr_hz"])["n_turns"] == 0:
            blind += 1
    assert blind >= 6  # the turn scan misses (almost) all of them


def test_operator_flags(spark):
    pdf = make_audio_dialog_corpus(42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        4, "clip_id"
    )
    out = {r.clip_id: r for r in
           multispeaker_flags(clip_voices(clips)).collect()}
    label = dict(zip(pdf.clip_id, pdf.defect))
    for cid, r in out.items():
        want_multi = label[cid] in ("voices_2", "voices_3")
        assert r.multi_speaker == want_multi, (cid, r)
        assert r.ok


def test_cli_audit_voices(spark, tmp_path, capsys, monkeypatch):
    import json

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_dialog_corpus(42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "clips.parquet")
    )
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "clips",
         "--kind", "voices", "--format", "json"]
    ) == 0
    issues = json.loads(capsys.readouterr().out)
    by_type = {i["issue_type"]: i for i in issues}
    assert by_type["multi_speaker"]["count"] == 10  # 8 dialogs + 2 panels
    assert by_type["multi_speaker"]["severity"] == "warning"
    assert by_type["no_voice_evidence"]["count"] == 2  # unvoiced+silence
