"""Union-of-axes leakage-safe split.

The identity corpus entangles content (µ-law re-uploads), channel
(shared rooms), and voice (speakers recorded in two rooms); the split
must keep each UNION component on one side, and no single axis may
already find the full component (otherwise the union adds nothing).
Plus the decode-once law: three pair consumers, one mapInArrow pass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_quality_spark.operators.audio_identity import (
    identity_features,
    identity_pairs,
    identity_split,
)
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_identity_corpus


def _clips_df(spark, pdf):
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    return spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )


def test_union_components_and_split_atomicity(spark):
    pdf = make_audio_identity_corpus(42)
    out = identity_split(_clips_df(spark, pdf)).collect()
    assert len(out) == len(pdf)
    label = dict(zip(pdf.clip_id, pdf.defect))
    by_label: dict[str, set] = {}
    by_comp: dict[str, set] = {}
    split_of: dict[str, set] = {}
    for r in out:
        by_label.setdefault(label[r.clip_id], set()).add(r.component)
        by_comp.setdefault(r.component, set()).add(r.clip_id)
        split_of.setdefault(r.component, set()).add(r.split)
    # every expected entangled group closed into ONE component...
    for lab in ("A", "B", "C", "D", "E"):
        assert len(by_label[lab]) == 1, (lab, by_label[lab])
    # ...components are pure (no cross-label merge), singles stay alone
    for comp, members in by_comp.items():
        assert len({label[m] for m in members}) == 1
    for lab in ("single_0", "single_1"):
        (comp,) = by_label[lab]
        assert len(by_comp[comp]) == 1
    # the split never straddles a component
    assert all(len(s) == 1 for s in split_of.values())
    # expected sizes: A = sessions 0+4 + re00 = 7, B = interview
    # session 1 + session 5 = 6, C = 4, D = 3, E = the content-only pair
    sizes = {lab: len(by_comp[next(iter(by_label[lab]))])
             for lab in ("A", "B", "C", "D", "E")}
    assert sizes == {"A": 7, "B": 6, "C": 4, "D": 3, "E": 2}, sizes


def test_each_axis_is_load_bearing(spark):
    """Axis ablation on the collected pair graph: voice is required to
    close A (one speaker, two rooms), channel to close B (interview
    guest — same room, different voice), content to close E (unvoiced
    zero-floor re-upload: no channel or voice evidence at all)."""
    pdf = make_audio_identity_corpus(42)
    feat = identity_features(_clips_df(spark, pdf)).persist()
    pairs = identity_pairs(feat).collect()
    label = dict(zip(pdf.clip_id, pdf.defect))

    def n_components(ids, axes):
        parent = {c: c for c in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs:
            if r.axis in axes and r.id_a in ids and r.id_b in ids:
                parent[find(r.id_a)] = find(r.id_b)
        return len({find(c) for c in ids})

    every = ("content", "channel", "voice")
    A = {c for c, d in label.items() if d == "A"}
    B = {c for c, d in label.items() if d == "B"}
    E = {c for c, d in label.items() if d == "E"}
    for ids in (A, B, E):
        assert n_components(ids, every) == 1
    assert n_components(A, ("content", "channel")) > 1   # voice needed
    assert n_components(B, ("content", "voice")) > 1     # channel needed
    assert n_components(E, ("channel", "voice")) > 1     # content needed
    assert n_components(E, ("content",)) == 1
    feat.unpersist()


def test_identity_split_decodes_once(spark):
    """Three pair consumers + the id projection: exactly ONE decode of
    each clip (the persisted slim feature relation serves them all)."""
    pdf = make_audio_identity_corpus(42)
    acc = spark.sparkContext.accumulator(0)
    identity_split(_clips_df(spark, pdf), counter=acc).collect()
    assert acc.value == len(pdf), acc.value


def test_split_deterministic_across_partitioning(spark):
    pdf = make_audio_identity_corpus(42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    a = identity_split(
        spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(3)
    ).collect()
    b = identity_split(
        spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(1)
    ).collect()
    assert a == b


def test_leakage_audit_clean_vs_naive(spark):
    """The cluster-atomic split audits to ZERO cross pairs on every
    axis; a per-clip i.i.d. coin leaks on at least one axis (the
    entangled corpus guarantees multi-clip components straddle)."""
    from data_quality_spark.operators.audio_identity import (
        split_leakage_audit,
    )
    from data_quality_spark.operators.sampling import (
        fraction_threshold_hex,
        sample_order_col,
    )

    pdf = make_audio_identity_corpus(42)
    clips = _clips_df(spark, pdf)
    atomic = identity_split(clips, val_frac=0.25, seed=11).select(
        "clip_id", "split"
    )
    joined = clips.join(atomic, "clip_id")
    clean = split_leakage_audit(joined).collect()
    assert [r.axis for r in clean] == ["channel", "content", "voice"]
    assert all(r.n_cross_pairs == 0 and r.n_cross_clips == 0
               for r in clean)
    assert sum(r.n_pairs for r in clean) > 0

    naive = clips.withColumn(
        "split",
        F.when(
            sample_order_col(F.col("clip_id"), 7, portable=True)
            < F.lit(fraction_threshold_hex(0.3)),
            F.lit("val"),
        ).otherwise(F.lit("train")),
    )
    leaky = split_leakage_audit(naive).collect()
    assert sum(r.n_cross_pairs for r in leaky) > 0
    # pair totals are split-independent
    assert {r.axis: r.n_pairs for r in leaky} == {
        r.axis: r.n_pairs for r in clean
    }


def test_split_drift_blast_radius(spark):
    """Corpus growth with a component-merging bridge: exactly sg00
    moves (val singleton absorbed into a train component), day-2 clips
    are added, every other existing assignment is bit-stable."""
    from data_quality_spark.operators.audio_identity import split_drift

    both_pdf = make_audio_identity_corpus(42, with_day2=True)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    day1 = _clips_df(spark, both_pdf[both_pdf.ingest_day != "2026-01-03"])
    both = _clips_df(spark, both_pdf)
    out = split_drift(identity_split(day1), identity_split(both)).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r.status, []).append(r.clip_id)
    assert by_status["moved"] == ["sg00"]
    assert sorted(by_status["added"]) == ["nw00", "zz_bridge"]
    assert len(by_status["stable"]) == len(both_pdf) - 3
    moved = next(r for r in out if r.clip_id == "sg00")
    assert (moved.old_split, moved.new_split) == ("val", "train")
    assert moved.old_component == "sg00"
    assert moved.new_component == "id03c00"


def test_split_drift_reports_removed(spark):
    """A clip present only in the old assignment surfaces as 'removed'
    (regression: the left join made deletions invisible)."""
    from data_quality_spark.operators.audio_identity import split_drift

    old = spark.createDataFrame(
        [("a", "x", 2, "train"), ("b", "x", 2, "val"),
         ("gone", "gone", 1, "val")],
        "clip_id string, component string, cluster_size long, split string")
    new = spark.createDataFrame(
        [("a", "x", 2, "train"), ("b", "x", 2, "val"),
         ("fresh", "fresh", 1, "train")],
        "clip_id string, component string, cluster_size long, split string")
    got = {r["clip_id"]: r["status"] for r in split_drift(old, new).collect()}
    assert got == {"a": "stable", "b": "stable", "gone": "removed",
                   "fresh": "added"}


def test_exact_replicas_never_straddle_even_with_hot_buckets(spark):
    """The 1M-smoke finding, reduced: exact re-upload families must land
    on one side of the split even when max_bucket is so small that the
    LSH guard drops EVERY bucket — the exact-digest pre-pass
    (fingerprint_exact_pairs) owns exact identity, bucket heat owns only
    near-dup recall."""
    import pandas as pd

    pdf = make_audio_identity_corpus(42)
    # include an evidence-free family: an UNDECODABLE payload (garbage
    # bytes) has empty fp and no channel/voice profile — only the
    # payload-digest key can hold its copies together
    junk = pdf.iloc[[0]].copy()
    junk["clip_id"] = "junk00"
    junk["bytes"] = [b"\x00\x01 not audio at all"]
    junk["codec"] = "wav"
    pdf = pd.concat([pdf, junk], ignore_index=True)
    replicas = []
    for r in range(3):
        cp = pdf.copy()
        cp["clip_id"] = cp["clip_id"] + f"_{r}"
        replicas.append(cp)
    big = pd.concat(replicas, ignore_index=True)
    # max_bucket=1: every multi-entry LSH bucket is dropped; only the
    # exact-digest edges can hold a replica family together
    out = identity_split(_clips_df(spark, big), max_bucket=1).collect()
    fam_splits: dict[str, set] = {}
    fam_comp: dict[str, set] = {}
    for row in out:
        fam = row["clip_id"].rsplit("_", 1)[0]
        fam_splits.setdefault(fam, set()).add(row["split"])
        fam_comp.setdefault(fam, set()).add(row["component"])
    assert all(len(s) == 1 for s in fam_splits.values()), {
        k: v for k, v in fam_splits.items() if len(v) > 1}
    assert all(len(c) == 1 for c in fam_comp.values())


def test_fingerprint_exact_pairs_shape(spark):
    """k−1 rep→member chain edges per identical-fp family; distinct
    contents never link; empty fingerprints carry no evidence."""
    from data_quality_spark.operators.audio_dedup import (
        fingerprint_exact_pairs,
    )

    rows = [
        ("a", [1, 2, 3]), ("b", [1, 2, 3]), ("c", [1, 2, 3]),
        ("d", [9, 9]), ("e", [1, 2]), ("f", []), ("g", []),
    ]
    df = spark.createDataFrame(rows, "clip_id string, fp array<int>")
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fingerprint_exact_pairs(df).collect()
    )
    assert got == [("a", "b"), ("a", "c")]
