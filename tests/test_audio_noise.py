"""Matcher noise-robustness curve laws.

The audio_noise_robustness query is hash-checked end-to-end by the
driver oracle; this test pins the curve's SHAPE on the pure-Python twin
(no Spark): the codec-invariant fingerprint matcher fails under
broadband noise at every config (its invariance class does not include
additive noise — an honest boundary, not a bug), the landmark matcher
recovers most twins once the hot-hash guard admits this stationary-tone
corpus, and relaxing the guard/threshold buys recall at a monotone
coincidence price.
"""

from __future__ import annotations

from data_quality_spark.oracles import _audio_noise_expected


def test_noise_curve_laws():
    d = _audio_noise_expected()
    rows = list(zip(d["max_bucket"], d["min_votes"], d["snr_db"],
                    d["n_injected"], d["fp_recovered"], d["lm_recovered"],
                    d["lm_extra_pairs"]))
    assert len(rows) == 9
    # fingerprints: noise breaks the band-difference bits at EVERY config
    assert all(fp <= 0.2 * n for _, _, _, n, fp, _, _ in rows)
    # per config: total landmark recall and the coincidence price
    by_cfg = {}
    for mb, mv, snr, n, fp, lm, ex in rows:
        c = by_cfg.setdefault((mb, mv), {"n": 0, "lm": 0, "extra": ex})
        c["n"] += n
        c["lm"] += lm
    strict = by_cfg[(64, 45)]
    mid = by_cfg[(256, 45)]
    loose = by_cfg[(256, 20)]
    # recall strictly improves along the relaxation order…
    assert strict["lm"] < mid["lm"] < loose["lm"]
    # …and the coincidence count is its monotone price
    assert strict["extra"] <= mid["extra"] <= loose["extra"]
    # the relaxed configs actually work: ≥ 70% overall, ≥ 75% at 20 dB
    assert loose["lm"] >= 0.7 * loose["n"]
    top = [lm for mb, mv, snr, n, fp, lm, ex in rows
           if (mb, mv) == (256, 20) and snr == 20][0]
    assert top >= 15
