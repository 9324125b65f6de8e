"""ASR-hallucination text kernels: tail-loop scan + stock-caption match.

The two transcript-side signals every ASR-curation pipeline checks for
(the audio side — VAD speech evidence — comes from ``functions.vad``):

- **tail loop**: a short phrase repeated verbatim at the END of the
  transcript ("thank you. thank you. thank you.") — the canonical
  seq2seq decoder failure mode on silence/music.  Detected by an exact
  token-block law: the largest ``(period p, repeats k)`` such that the
  last ``k`` blocks of ``p`` tokens are all equal to the final block
  (p ≤ ``LOOP_MAX_PERIOD``); maximizing loop mass ``k*p``, ties to the
  smallest period.  Exact integer comparisons — no similarity scores.
- **stock caption**: the WHOLE transcript, after deterministic
  normalization, is one of the known subtitle-credit / outro phrases
  that captioning models emit over non-speech audio.  Membership only
  counts against audio long enough that a genuine utterance of the
  phrase is implausible (``STOCK_MIN_DUR_MS`` of decoded audio).

Both kernels are pure Python over an already-tokenized batch — they run
inside the operator's single Arrow pass next to the audio decode, so the
cost is O(tokens) per clip with zero extra passes.

Reference analog: none (the reference has no audio/ASR path); these
feed the same predicate → severity machinery as its row rules
(/root/reference/src/data_quality/checkpoints.py:178-296).
"""

from __future__ import annotations

import re

__all__ = [
    "LOOP_MAX_PERIOD",
    "LOOP_MIN_REPEATS",
    "LOOP_MIN_TOKENS",
    "STOCK_MIN_DUR_MS",
    "STOCK_PHRASES",
    "TOS_MAX_SPEECH_MS",
    "TOS_MIN_TOKENS",
    "SNT_MIN_SPEECH_MS",
    "normalize_caption",
    "tail_loop",
]

# --- decision-law constants (single source of truth; the differential
# twin imports these and replays the laws independently) ---------------
TOS_MAX_SPEECH_MS = 120    # ≤ this much detected speech counts as "silent"
TOS_MIN_TOKENS = 5         # a transcript this long over silence is invented
SNT_MIN_SPEECH_MS = 1000   # ≥ this much speech with an empty transcript
LOOP_MAX_PERIOD = 4        # phrase length (tokens) the tail scan considers
LOOP_MIN_REPEATS = 4       # tail blocks (incl. the final one) to flag
LOOP_MIN_TOKENS = 8        # minimum loop mass period*repeats to flag
STOCK_MIN_DUR_MS = 3000    # decoded audio this long, captioned ONLY by a
                           # stock phrase, is a hallucinated caption

# Subtitle credits / outro boilerplate that captioning models emit over
# silence or music.  Matched against the normalized WHOLE transcript —
# a transcript that merely contains one of these is fine.  Single-word
# phrases are deliberately absent ("thank you" alone over silence is
# already caught by the text-over-silence law).
STOCK_PHRASES = frozenset(
    {
        "thank you for watching",
        "thanks for watching",
        "please subscribe",
        "like and subscribe",
        "please like and subscribe",
        "see you in the next video",
        "see you next time",
        "subscribe to my channel",
        "subtitles by the amara org community",
        "subtitles created by the community",
        "transcribed by eso translated by",
        "copyright bbc",
        "music playing",
        "no audible dialogue",
    }
)

_NORM_RE = re.compile(r"[^a-z0-9]+")


def normalize_caption(text: str | None) -> str:
    """Deterministic caption normalization for stock-phrase membership:
    lowercase, every non-[a-z0-9] run (punctuation, whitespace, accents'
    leftovers) collapses to one space, leading/trailing stripped."""
    if not text:
        return ""
    return _NORM_RE.sub(" ", text.lower()).strip()


def tail_loop(tokens: list[str]) -> tuple[int, int]:
    """Largest verbatim tail repetition: returns ``(period, repeats)``
    maximizing loop mass ``period*repeats`` over periods 1..LOOP_MAX_PERIOD
    with repeats ≥ 2, ties to the smallest period; ``(0, 0)`` when no
    block repeats.  Exact list equality — no fuzz."""
    n = len(tokens)
    best_p = best_k = 0
    for p in range(1, min(LOOP_MAX_PERIOD, n // 2) + 1):
        tail = tokens[n - p :]
        k = 1
        while n - (k + 1) * p >= 0 and tokens[n - (k + 1) * p : n - k * p] == tail:
            k += 1
        if k >= 2 and k * p > best_k * best_p:
            best_p, best_k = p, k
    return best_p, best_k
