"""Text kernels: language-ID, perplexity, quality heuristics, PII/toxicity scrub.

Built from scratch on public techniques:

- **langid** — fastText-style hashed character-n-gram linear scorer (Joulin et
  al. 2016's bag-of-char-ngrams idea, reduced to a deterministic per-language
  trigram log-probability table with CRC32 feature hashing — no training
  dependency, weights derived from the in-repo lexicons at import time).
- **perplexity** — KenLM-style character bigram log-prob tables with add-one
  smoothing; ppl = exp(−mean log P(cᵢ|cᵢ₋₁)).
- **scrub** — regex PII/toxicity replacement.  Patterns are written in the
  dialect subset common to java.util.regex and Python ``re`` (explicit ASCII
  classes, no lookbehind) so the JVM `regexp_replace` chain in the Spark
  pipeline and the pure-Python oracle produce byte-identical output
  (SURVEY.md §7.3 risk item).  Reference analog: regex deny-lists at
  ``/root/reference/src/data_quality/checkpoints.py:407-581``.

Everything here is deterministic: CRC32 hashing (not the salted builtin
``hash``), float64, fixed iteration order.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "LEXICONS",
    "STOPWORD_MARKERS",
    "PII_PATTERNS",
    "TOXICITY_WORDS",
    "SCRUB_CHAIN",
    "_render_repl",
    "scrub_text",
    "LangIdModel",
    "PerplexityModel",
    "LANGID",
    "PPLM",
    "token_count",
    "rep_ratio",
    "charclass_frac",
]

# ------------------------------------------------------------------ lexicons
# Small per-language lexicons. They serve three purposes: (1) the synthetic
# transcript generator samples from them, (2) the langid trigram profiles are
# built from them, (3) the perplexity tables are built from them. All public
# everyday vocabulary.

LEXICONS: dict[str, list[str]] = {
    "en": (
        "the and for with this that from have what when where which their "
        "about would there could people think good great time year day way "
        "thing world life hand part child eye woman place work week case "
        "point company number house water room mother area money story fact "
        "month right study book job word business issue side kind head"
    ).split(),
    "es": (
        "el la los las una que con por para como pero más este esta cuando "
        "donde quién también muy bien año día tiempo vida mundo país casa "
        "parte trabajo mujer niño ojo lugar semana caso punto empresa número "
        "agua cuarto madre dinero historia hecho mes derecho estudio libro "
        "palabra negocio lado cabeza señor gobierno ciudad noche corazón"
    ).split(),
    "de": (
        "der die das und für mit diese jene von haben was wann wo welche ihre "
        "über würde dort könnte menschen denken gut groß zeit jahr tag weg "
        "ding welt leben hand teil kind auge frau platz arbeit woche fall "
        "punkt firma nummer haus wasser zimmer mutter bereich geld geschichte "
        "tatsache monat recht studie buch wort geschäft seite kopf straße"
    ).split(),
    "fr": (
        "le la les une que avec pour par comme mais plus cette quand où qui "
        "aussi très bien année jour temps vie monde pays maison partie "
        "travail femme enfant œil lieu semaine cas point entreprise nombre "
        "eau chambre mère argent histoire fait mois droit étude livre mot "
        "affaire côté tête monsieur gouvernement ville nuit cœur être avoir"
    ).split(),
    # round-2 widening: the synthetic corpus still samples only the four
    # languages above (LANG_WEIGHTS), but the langid/perplexity models score
    # against all seven — adding a language is just adding a lexicon.
    "it": (
        "il gli della delle questo quella perché anche molto bene anno "
        "giorno tempo vita mondo paese casa parte lavoro donna bambino "
        "occhio posto settimana caso punto azienda numero acqua stanza "
        "madre soldi storia fatto mese diritto studio libro parola affare "
        "lato testa signore governo città notte cuore essere avere fare "
        "dire andare vedere sapere volere dovere potere grande piccolo nuovo"
    ).split(),
    "pt": (
        "você não são uma para porque também muito bem ano dia tempo vida "
        "mundo país casa parte trabalho mulher criança olho lugar semana "
        "caso ponto empresa número água quarto mãe dinheiro história fato "
        "mês direito estudo livro palavra negócio lado cabeça senhor "
        "governo cidade noite coração ser ter fazer dizer ir ver saber "
        "querer dever poder grande pequeno novo velho bom melhor depois"
    ).split(),
    "zh": (
        "的 是 了 在 和 有 我 你 他 们 这 那 不 人 大 小 中 国 年 月 日 时 "
        "分 家 水 火 山 天 地 上 下 学 生 老 师 好 来 去 看 说 话 书 车 电 "
        "脑 音 乐 歌 声 工 作 朋 友 时 间 世 界 生 活 孩 子 地 方 公 司"
    ).split(),
    # round-3 widening: ru/ja/ko (distinct scripts, so the byte-trigram
    # profiles separate cleanly and the SQL marker sets stay disjoint)
    "ru": (
        "это что как она они быть весь этот мочь человек год время дело "
        "жизнь день рука работа слово место вопрос дом сторона страна мир "
        "город вода мать друг книга ночь сердце правительство компания "
        "неделя месяц история деньги голова бизнес точка номер комната "
        "область факт право учёба глаз ребёнок женщина народ земля свет"
    ).split(),
    "ja": (
        "これ それ です ます する ある いる こと もの ひと とき 私 あなた "
        "彼 彼女 日本 時間 世界 生活 仕事 会社 学校 先生 学生 友達 家族 "
        "水 火 山 空 海 年 月 日 今日 明日 昨日 言葉 本 話 音楽 歌 声 "
        "子供 場所 週 お金 物語 事実 権利 勉強 目 女 部屋 母 頭 側"
    ).split(),
    "ko": (
        "이것 그것 있다 없다 하다 되다 사람 시간 세계 생활 일 회사 학교 "
        "선생님 학생 친구 가족 물 불 산 하늘 바다 년 월 일 오늘 내일 어제 "
        "말 책 이야기 음악 노래 소리 아이 장소 주 돈 사실 권리 공부 눈 "
        "여자 방 어머니 머리 쪽 나라 도시 밤 마음 정부 회사 번호 점"
    ).split(),
}

# junk "language" used for defect rows in the synthetic corpus
JUNK_TOKENS = ["xq", "zzz", "qqq", "xkcd9", "vvvv", "##", "@@", "zxzx", "0x0x"]

# Marker stopwords for the SQL-expressible langid heuristic (must stay
# disjoint across languages so the argmax is well-defined in plain SQL).
STOPWORD_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "that", "this", "from", "have"],
    "es": ["el", "los", "las", "que", "por", "como", "pero"],
    "de": ["der", "die", "das", "und", "für", "von", "nicht"],
    "fr": ["le", "les", "une", "avec", "pour", "mais", "dans"],
    "zh": ["的", "是", "了", "在", "和", "有", "我"],
    "ru": ["это", "что", "как", "быть", "весь", "они", "она"],
    "ja": ["これ", "それ", "です", "ます", "する", "ある", "いる"],
    "ko": ["이것", "그것", "있다", "없다", "하다", "되다", "사람"],
}

# ------------------------------------------------------------------ scrub
# ASCII-explicit classes only: identical semantics in java.util.regex
# (Spark regexp_replace) and Python re (oracle).  Order is part of the spec.

PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement) — replacement uses Spark/Java `$n` group
    # syntax as the canonical form; `_render_repl` converts to `\n` for
    # Python re / DuckDB RE2.  ORDER IS PART OF THE SPEC: url_credential must
    # run before email, else the email rule consumes `password@host` first
    # and the credential is never redacted as such.
    (
        # F12, ref secure_db.py:265-268 (_redact_database_url): keep user,
        # mask password.  The reference's `[^:]+`/`[^@]+` classes are applied
        # to lone URL strings; inside free-running transcripts they would
        # match across spaces, so the classes here additionally exclude
        # whitespace (and '/' in the user part) — same behavior on URLs.
        "url_credential",
        r"://([^:/@\s]+):([^@\s]+)@",
        "://$1:***@",
    ),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    (
        "phone",
        r"\b(\+[0-9]{1,2}[ -])?(\([0-9]{3}\)|[0-9]{3})[ -][0-9]{3}[ -][0-9]{4}\b",
        "<PHONE>",
    ),
]


def _render_repl(repl: str, dialect: str) -> str:
    """Replacement-string dialect: Spark/Java regexp_replace consumes `$1`;
    Python ``re.sub`` and DuckDB (RE2) consume `\\1`."""
    if dialect == "spark":
        return repl
    return re.sub(r"\$(\d)", r"\\\1", repl)

# Mild placeholder deny-list (configurable in practice; reference analog is
# the garbage-name list, checkpoints.py:530-545).
TOXICITY_WORDS: list[str] = ["damnit", "hellspawn", "craphead", "scumbag", "moron"]

_TOX_PATTERN = r"(?i)\b(" + "|".join(TOXICITY_WORDS) + r")\b"

# Full chain, applied in order on every engine (replacements in canonical
# `$n` form — render per dialect with `_render_repl`).
SCRUB_CHAIN: list[tuple[str, str]] = [
    (p, r) for _, p, r in PII_PATTERNS
] + [(_TOX_PATTERN, "<TOX>")]

_COMPILED_CHAIN = [
    (re.compile(p), _render_repl(r, "python")) for p, r in SCRUB_CHAIN
]


def scrub_text(text: str | None) -> str | None:
    """Python-side scrub (oracle twin of the Spark regexp_replace chain)."""
    if text is None:
        return None
    out = text
    for pat, repl in _COMPILED_CHAIN:
        out = pat.sub(repl, out)
    return out


def pii_hit_count(text: str | None) -> int:
    if not text:
        return 0
    return sum(len(re.findall(p, text)) for _, p, _ in PII_PATTERNS)


# ------------------------------------------------------------------ langid

_HASH_DIM = 1 << 15
# odd multiplier (FNV-1a prime) — the rolling byte-window hash below.  The
# feature hash only needs to be deterministic and well-spread over the
# low 15 bits; a numpy-vectorizable polynomial hash replaces the original
# per-gram crc32 loop (measured ~5× faster per clip — the langid/ppl pair
# was ~30% of the whole gate budget at 7 languages).
_HASH_MULT = np.uint64(1099511628211)


def _gram_segments(texts, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Hash indices of every byte n-gram of every text, in ONE vectorized
    pass over a single concatenated byte buffer.

    Returns ``(idx, starts, counts)``: ``idx[starts[i]:starts[i]+counts[i]]``
    are text i's gram hash indices (``counts[i]==0`` for empty/NULL texts).
    Boundary windows between adjacent texts never appear: gram *positions*
    are generated per text via the ragged-range construction, not by sliding
    over the joined buffer.  This is the whole-batch formulation — per-text
    numpy calls cost more than the hashing itself at ~50 grams/text.
    """
    datas: list[bytes] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if t is None:
            datas.append(b"")
            continue
        s = t.strip().lower()
        if not s:
            datas.append(b"")
            continue
        d = (" " + s + " ").encode("utf-8")
        if len(d) < n:
            d += b"\x00" * (n - len(d))
        counts[i] = len(d) - n + 1
        datas.append(d)
    lens = np.fromiter((len(d) for d in datas), dtype=np.int64, count=len(datas))
    offs = np.zeros(len(datas) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    total = int(starts[-1])
    if total == 0:
        return np.zeros(0, dtype=np.int64), starts, counts
    buf = np.frombuffer(b"".join(datas), dtype=np.uint8).astype(np.uint64)
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(starts[:-1], counts)
        + np.repeat(offs[:-1], counts)
    )
    acc = np.zeros(total, dtype=np.uint64)
    for j in range(n):
        acc = acc * _HASH_MULT + buf[pos + j]
    return (acc & np.uint64(_HASH_DIM - 1)).astype(np.int64), starts, counts


def _segment_sums(g: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Per-segment row sums of ``g`` (…, G) at boundaries ``starts`` (T+1,
    last == G).  A zero column is appended so every index is in range and
    the final segment's sum is unchanged; ``np.add.reduceat`` reduces each
    segment SEQUENTIALLY, so a text's sum is bit-identical whether it is
    scored alone or inside any batch (the oracle/pipeline parity law).
    Empty segments return garbage (reduceat quirk) — callers mask them via
    ``counts == 0``."""
    gp = np.concatenate([g, np.zeros(g.shape[:-1] + (1,), dtype=g.dtype)], axis=-1)
    return np.add.reduceat(gp, starts[:-1], axis=-1)
    # NOTE: reduceat's within-segment association follows SIMD lane grouping,
    # which depends on the segment's alignment inside the batch buffer — so a
    # text's sum is stable only to ~1e-14 relative across batch compositions.
    # Downstream consumers (softmax confidence rounded to 4 decimals, ppl vs
    # a 2000.0 threshold, conf vs 0.5) are insensitive at that scale; nothing
    # in the pipeline compares these floats bit-for-bit.


class LangIdModel:
    """Hashed byte-trigram multinomial scorer (fastText-style bag of hashed
    n-grams, Joulin et al. 2016; no training file: profiles derive
    deterministically from LEXICONS).  Scoring is whole-batch vectorized —
    measured ~15× fewer µs/clip than the per-text loop, and the langid+ppl
    pair was ~30% of the entire gate budget."""

    def __init__(self, lexicons: dict[str, list[str]], n: int = 3) -> None:
        self.n = n
        self.langs = sorted(lexicons)
        tables = []
        for lang in self.langs:
            counts = np.zeros(_HASH_DIM, dtype=np.float64)
            for word in lexicons[lang]:
                idx, _s, _c = _gram_segments([word], n)
                np.add.at(counts, idx, 1.0)
            total = counts.sum()
            # add-one smoothing over the hashed vocabulary
            logp = np.log((counts + 1.0) / (total + _HASH_DIM))
            tables.append(logp)
        self.tables = np.stack(tables)  # (L, DIM)

    def score_batch(self, texts) -> tuple[list[str], list[float]]:
        texts = list(texts)
        if not texts:
            return [], []
        idx, starts, counts = _gram_segments(texts, self.n)
        if idx.size == 0:
            return ["und"] * len(texts), [0.0] * len(texts)
        sums = _segment_sums(self.tables[:, idx], starts)  # (L, T)
        safe = np.maximum(counts, 1)
        scores = sums / safe
        z = scores - scores.max(axis=0)
        probs = np.exp(z * 20.0)  # temperature sharpens the margin
        probs = probs / probs.sum(axis=0)
        best = np.argmax(probs, axis=0)
        conf = probs[best, np.arange(len(texts))]
        langs = [
            "und" if counts[i] == 0 else self.langs[best[i]]
            for i in range(len(texts))
        ]
        confs = [
            0.0 if counts[i] == 0 else float(conf[i]) for i in range(len(texts))
        ]
        return langs, confs

    def score_one(self, text: str | None) -> tuple[str, float]:
        langs, confs = self.score_batch([text])
        return langs[0], confs[0]


class PerplexityModel:
    """Per-language byte-bigram log-prob tables (KenLM-style, order 2),
    whole-batch scoring: one gather of the predicted-language row per gram."""

    def __init__(self, lexicons: dict[str, list[str]]) -> None:
        self.langs = sorted(lexicons)
        self.row = {lang: i for i, lang in enumerate(self.langs)}
        mats = []
        for lang in self.langs:
            counts = np.zeros(_HASH_DIM, dtype=np.float64)
            corpus = " ".join(lexicons[lang])
            idx, _s, _c = _gram_segments([corpus], 2)
            np.add.at(counts, idx, 1.0)
            total = counts.sum()
            # Lidstone α=0.01: keeps unseen-bigram mass small so ppl
            # magnitudes are interpretable (seen ≈ c/total, unseen tiny)
            alpha = 0.01
            mats.append(np.log((counts + alpha) / (total + alpha * _HASH_DIM)))
        self.table_mat = np.stack(mats)  # (L, DIM)
        # kept for callers that index a single language's table
        self.tables = {lang: self.table_mat[i] for lang, i in self.row.items()}

    def ppl_batch(self, texts, langs) -> list[float]:
        texts = list(texts)
        langs = list(langs)
        if not texts:
            return []
        idx, starts, counts = _gram_segments(texts, 2)
        rows = np.fromiter(
            (self.row.get(l, -1) for l in langs), dtype=np.int64, count=len(langs)
        )
        valid = (counts > 0) & (rows >= 0)
        if idx.size == 0 or not valid.any():
            return [float(_HASH_DIM)] * len(texts)
        g = self.table_mat[np.repeat(np.maximum(rows, 0), counts), idx]
        sums = _segment_sums(g, starts)
        ppl = np.exp(-sums / np.maximum(counts, 1))
        return [
            float(ppl[i]) if valid[i] else float(_HASH_DIM)
            for i in range(len(texts))
        ]

    def ppl_one(self, text: str | None, lang: str) -> float:
        return self.ppl_batch([text], [lang])[0]


# module singletons — built once per process (executors build them on first
# task; ~50 ms, then reused for every Arrow batch)
LANGID = LangIdModel(LEXICONS)
PPLM = PerplexityModel(LEXICONS)


# ------------------------------------------------------ oracle-side heuristics
# Python twins of the JVM Column expressions in pipeline.py. The formulas are
# deliberately restricted to constructs with identical semantics in Spark SQL,
# DuckDB SQL, and Python (ASCII classes, whitespace split).

_WS = re.compile(r"\s+")
_SPECIAL = re.compile(r"[A-Za-z0-9À-ÿ\s]")


def token_count(text: str | None) -> int:
    if text is None:
        return 0
    t = text.strip()
    if not t:
        return 0
    return len(_WS.split(t))


def rep_ratio(text: str | None) -> float:
    """1 − distinct/total tokens: repetition detector."""
    if text is None:
        return 0.0
    t = text.strip()
    if not t:
        return 0.0
    toks = _WS.split(t)
    return 1.0 - len(set(toks)) / len(toks)


def charclass_frac(text: str | None) -> float:
    """Fraction of chars outside [A-Za-z0-9, Latin-1 letters, whitespace]."""
    if not text:
        return 0.0
    kept = _SPECIAL.sub("", text)
    return len(kept) / len(text)
