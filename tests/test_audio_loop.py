"""Looped-audio detection (operators/audio_loop.py).

Detection quality on the seeded tiled-payload corpus, the
degenerate-stream guard's behavior, and Spark-vs-twin row equality
(the all-integer decision law means EXACT equality, not approx).
"""

from __future__ import annotations

from data_quality_spark.operators.audio_loop import loop_scan
from data_quality_spark.oracles import _audio_loop_expected
from data_quality_spark.plans.schemas import CLIPS_SCHEMA
from data_quality_spark.synth import make_audio_loop_corpus


def test_detector_catches_seeded_loops_no_false_positives():
    from data_quality_spark.operators.audio_loop import _is_degenerate

    exp = _audio_loop_expected()
    pdf = make_audio_loop_corpus(300, seed=42).set_index("clip_id")
    tp = fn = fp = 0
    degenerate_misses = 0
    for cid, looped, nf, distinct, dominant in zip(
        exp["clip_id"], exp["looped"], exp["n_frames"],
        exp["n_distinct"], exp["n_dominant"],
    ):
        truth = pdf.loc[cid, "defect"] == "looped"
        if truth and looped:
            tp += 1
        elif truth:
            fn += 1
            # the only admissible miss: the degenerate-stream guard
            # (near-silent base → its loop is ALSO degenerate; the
            # silence audit owns that clip, not the loop scan)
            assert _is_degenerate(nf, distinct, dominant), cid
            degenerate_misses += 1
        elif looped:
            fp += 1
    assert fp == 0
    assert tp >= 35
    assert fn == degenerate_misses <= 10


def test_loop_scan_matches_twin_exactly(spark):
    pdf = make_audio_loop_corpus(300, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    clips = spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).repartition(
        8, "clip_id"
    )
    got = {r["clip_id"]: r for r in loop_scan(clips).collect()}
    exp = _audio_loop_expected()
    assert len(got) == len(exp["clip_id"])
    for i, cid in enumerate(exp["clip_id"]):
        r = got[cid]
        for col in ("ok", "n_frames", "n_distinct", "best_lag",
                    "match_num", "match_den", "looped"):
            assert r[col] == exp[col][i], (cid, col)


def test_tiled_payload_best_lag_is_the_period(spark):
    """For a frame-aligned tile of S hops, the reported best lag divides
    into the tiling structure: fp self-matches at lag = S-1 frames (the
    50%-overlap stream has n_hops-1 words per period)."""
    pdf = make_audio_loop_corpus(300, seed=42)
    loops = pdf[pdf["defect"] == "looped"]
    assert len(loops) >= 40
    exp = _audio_loop_expected()
    by_id = {c: (exp["best_lag"][i], exp["looped"][i])
             for i, c in enumerate(exp["clip_id"])}
    # seg hops cycle through 40 + 17·(k mod 3) = 40, 57, 74
    flagged_lags = {by_id[c][0] for c in loops["clip_id"]
                    if by_id[c][1]}
    assert flagged_lags <= {39, 40, 56, 57, 73, 74}, flagged_lags


def test_loop_scan_is_streaming_legal(spark, tmp_path):
    """loop_scan is a stateless per-row map: the same mapInArrow runs on
    a readStream unchanged and emits identical rows per clip."""
    pdf = make_audio_loop_corpus(80, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = tmp_path / "clips"
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(src)
    )
    stream = spark.readStream.schema(CLIPS_SCHEMA).parquet(str(src))
    q = (
        loop_scan(stream)
        .writeStream.format("memory")
        .queryName("loop_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["clip_id"]: r for r in
           spark.sql("SELECT * FROM loop_out").collect()}
    want = {r["clip_id"]: r for r in
            loop_scan(spark.read.parquet(str(src))).collect()}
    assert set(got) == set(want) and len(got) == len(pdf)
    for cid, w in want.items():
        g = got[cid]
        for col in ("ok", "n_frames", "n_distinct", "best_lag",
                    "match_num", "match_den", "looped"):
            assert g[col] == w[col], (cid, col)


def test_alignment_envelope():
    """Measured alignment law from the docstring: hop-grid periods (incl.
    half-hop via the 2-period lag) are caught at fraction 1.0; arbitrary
    sample offsets never frame-align and stay far below the cut."""
    import numpy as np

    from data_quality_spark.functions.spectral import FRAME, fingerprint_i32
    from data_quality_spark.operators.audio_loop import (
        LOOP_FRAC_DEN,
        LOOP_FRAC_NUM,
        _is_degenerate,
    )

    def scan(fp, min_lag=8, min_overlap=16):
        n = fp.size
        best = None
        for lag in range(min_lag, n - min_overlap + 1):
            valid = n - lag
            m = int((fp[:valid] == fp[lag:]).sum())
            if best is None or m * best[1] > best[0] * valid:
                best = (m, valid, lag)
        _, cnts = np.unique(fp, return_counts=True)
        return best, int(cnts.size), int(cnts.max())

    rng = np.random.default_rng(7)
    hop = FRAME // 2
    outcomes = {}
    for seg_len, label in ((40 * hop, "aligned"),
                           (40 * hop + hop // 2, "half_hop"),
                           (40 * hop + 37, "arbitrary")):
        seg = (rng.normal(0, 0.2, seg_len) * 32767).clip(
            -32768, 32767).astype(np.int16)
        reps = -(-16000 * 2 // seg_len)
        q = np.tile(seg, reps)[: 16000 * 2]
        fp = fingerprint_i32(q)
        best, distinct, dominant = scan(fp)
        outcomes[label] = (
            not _is_degenerate(int(fp.size), distinct, dominant)
            and best[0] * LOOP_FRAC_DEN >= LOOP_FRAC_NUM * best[1],
            best[0] / best[1],
        )
    assert outcomes["aligned"][0] and outcomes["aligned"][1] == 1.0
    assert outcomes["half_hop"][0] and outcomes["half_hop"][1] == 1.0
    assert not outcomes["arbitrary"][0]
    assert outcomes["arbitrary"][1] < 0.2


def test_sample_domain_scan_catches_arbitrary_offsets(spark, sf_dir):
    """The arbitrary-offset extension: the sample-domain scan catches
    BOTH hop-aligned and off-grid loop periods (the frame scan's proven
    blind spot), with zero false flags; all misses are the sample-domain
    degenerate guard; Spark rows match the twin exactly."""
    import __spark_entry__ as e
    from data_quality_spark.operators.audio_loop import (
        DOMINANT_DEN,
        DOMINANT_NUM,
        SAMPLE_MIN_DISTINCT,
    )
    from data_quality_spark.oracles import _audio_loop_arbitrary_expected

    got = {r["clip_id"]: r for r in
           e.q_audio_loop_arbitrary(spark, sf_dir).collect()}
    exp = _audio_loop_arbitrary_expected()
    assert len(got) == len(exp["clip_id"])
    for i, cid in enumerate(exp["clip_id"]):
        r = got[cid]
        for col in ("ok", "n_samples", "n_distinct", "n_dominant",
                    "best_lag", "match_num", "match_den", "looped"):
            assert r[col] == exp[col][i], (cid, col)
    pdf = make_audio_loop_corpus(300, seed=42, arbitrary_every=2)
    truth = dict(zip(pdf["clip_id"], pdf["defect"]))
    caught_arbitrary = caught_aligned = fp = 0
    for cid, r in got.items():
        is_loop = str(truth[cid]).startswith("looped")
        if r["looped"] and not is_loop:
            fp += 1
        elif r["looped"] and truth[cid] == "looped_arbitrary":
            caught_arbitrary += 1
        elif r["looped"] and truth[cid] == "looped":
            caught_aligned += 1
        elif is_loop and not r["looped"]:
            # admissible miss: sample-domain degenerate guard only
            assert (r["n_distinct"] < SAMPLE_MIN_DISTINCT
                    or r["n_dominant"] * DOMINANT_DEN
                    > DOMINANT_NUM * r["n_samples"]), cid
    assert fp == 0
    assert caught_arbitrary >= 15  # the frame scan catches ZERO of these
    assert caught_aligned >= 15
