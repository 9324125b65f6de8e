"""Deterministic crop-window scheduling for audio representation training.

wav2vec-style pretraining consumes fixed-length windows CROPPED at
random offsets from each clip, re-drawn every epoch.  Doing the draw
with a framework RNG makes the training data irreproducible (a resumed
epoch sees different crops than the original run); the curation-side
answer is the same one the repo uses everywhere randomness appears
(augment noise, SpecAugment masks, split assignment): the draw is a
PURE FUNCTION of (clip_id, epoch, crop_idx, seed) through xxhash64, so
any executor, any retry, and any re-run produce the identical schedule
— and an auditor can hash-check the whole epoch.

    start_ms = pmod(xxhash64(clip_id, epoch, crop_idx, seed),
                    dur_ms - win_ms + 1)

Clips shorter than the window emit nothing (the trainer pads from the
batch planner's accounting instead — fabricating a crop that wraps or
repeats is an augmentation decision, not a scheduling one).  NULL
durations are undecodable-clip territory and likewise emit nothing.

Engine shape: one narrow projection + a crops_per_clip explode — a
pure map over clip METADATA (no payload read, no shuffle; the actual
byte slicing is ``audio_vad.extract_segments``'s job downstream).  At
10^12 clips an epoch schedule is a metadata-only job.

Reference analog: none; this is the producer-side scheduling step
between the gate's survivors and a self-supervised trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["crop_schedule"]


def crop_schedule(
    clips: DataFrame,
    win_ms: int,
    crops_per_clip: int = 1,
    epoch: int = 0,
    seed: int = 0,
    id_col: str = "clip_id",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """(clip_id, epoch, crop_idx, start_ms, win_ms) — the epoch's crop
    schedule, deterministic under any partitioning/retry/resume."""
    if win_ms <= 0:
        raise ValueError("win_ms must be positive")
    if crops_per_clip <= 0:
        raise ValueError("crops_per_clip must be positive")
    dur = F.col(dur_col).cast("long")
    eligible = clips.where(dur.isNotNull() & (dur >= win_ms))
    out = eligible.select(
        F.col(id_col),
        F.lit(epoch).cast("int").alias("epoch"),
        F.explode(
            F.array(*[F.lit(j).cast("int")
                      for j in range(crops_per_clip)])
        ).alias("crop_idx"),
        dur.alias("__dur"),
    )
    h = F.xxhash64(F.col(id_col), F.col("epoch"), F.col("crop_idx"),
                   F.lit(seed))
    return out.select(
        id_col,
        "epoch",
        "crop_idx",
        F.pmod(h, F.col("__dur") - F.lit(win_ms) + 1).cast("long")
        .alias("start_ms"),
        F.lit(win_ms).cast("long").alias("win_ms"),
    )
