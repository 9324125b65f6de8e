"""Distributed BPE tokenizer training — learn merges FROM the corpus.

``docs.bpe_token_stats`` measures text with a fixed BPE-ish regex; this
module closes the loop and TRAINS the tokenizer (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") the way
production trainers (SentencePiece, HuggingFace tokenizers) actually do
it at corpus scale — which makes the 100-TB cost profile explicit:

1. **Corpus pass (the only data-scale stage)**: whitespace-split words →
   ``groupBy(word).count()``.  ONE shuffle, and partial aggregation
   collapses hot words (stopwords are the skew keys) map-side, so each
   task emits at most |distinct words in task| rows.  At 10^12 docs this
   relation is bounded by the language's vocabulary (~10^7-10^8 rows),
   not the corpus.
2. **Bounded capture**: ``ORDER BY (n DESC, word ASC) LIMIT top_words``
   — Spark executes TakeOrderedAndProject (per-partition partial top-V;
   the word relation never globally sorts).  The cap is the standard
   trainer practice (HF/SentencePiece train on a word-frequency
   dictionary, usually capped); it is a documented budget, not a
   silent truncation — ``learn_bpe`` reports how much word mass the
   capture covers.
3. **Merge learning (driver-side, written spec below)**: the loop runs
   over ≤ ``top_words`` (word, count) rows — O(V · num_merges) plain
   Python, independent of corpus size, bit-reproducible.
4. **Corpus-wide encoding (map-only)**: the learned merge ranks ship
   back as a closure into a vectorized ``mapInPandas`` encoder with
   per-batch distinct-word memoization — cost ∝ distinct words per
   batch, not tokens; no shuffle until the tiny stats rollup.

Written spec (the twin in ``oracles._bpe_merges_expected`` replays it
independently):

- **Pre-tokenizer law**: words are maximal runs of non-whitespace where
  whitespace is the EXPLICIT class ``[ \\t\\n\\r\\f\\x0B]`` — pinned so
  Java regex (Spark split) and Python ``re`` agree byte-for-byte
  (Python ``\\s`` is Unicode-aware, Java's is not; neither is used).
- **Symbols**: a word starts as its Unicode code points plus one
  trailing end-of-word symbol ``</w>`` (so merged tokens can't leak
  across word boundaries, and ``''.join(tokens)[:-4] == word`` always).
- **Pair counting**: every adjacent symbol pair in a word contributes
  that word's corpus count once per occurrence ("aaa" has (a,a) twice).
- **Selection**: highest total count wins; ties break on the pair
  (left, right) ascending lexicographic.  Stop after ``num_merges``
  merges or when the best count < ``min_count``.
- **Merge application** (training AND encoding): single left-to-right
  pass, non-overlapping — at a match emit the merged symbol and skip
  both inputs.
- **Encoding**: repeatedly apply the lowest-rank merge whose pair is
  present anywhere in the current symbols, until none applies.

Reference parity: the reference has no trainer — this extends its text
measurement surface (``SURVEY.md §2.11``) with the canonical
training-data-pipeline workload the brief asks for (token counting with
a LEARNED vocabulary rather than a fixed regex).
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "WORD_SPLIT_RE", "END_WORD", "word_counts", "capture_vocab",
    "learn_merges", "learn_bpe", "merges_report", "encode_word",
    "bpe_encode_stats",
]

# explicit ASCII whitespace class — identical semantics in Java regex
# (Spark split) and Python re; never \s (Unicode-aware in Python only)
WORD_SPLIT_RE = "[ \\t\\n\\r\\f\\x0B]+"
END_WORD = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the one data-scale stage.

    split + explode + groupBy: partial aggregation collapses hot words
    (the skew keys) map-side before the single exchange."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), WORD_SPLIT_RE)).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def capture_vocab(
    word_df: DataFrame, top_words: int
) -> list[tuple[str, int]]:
    """Deterministic bounded capture: (n DESC, word ASC) LIMIT V.

    Runs as TakeOrderedAndProject — per-partition partial top-V, no
    global sort; the driver sees at most ``top_words`` rows."""
    rows = (
        word_df.orderBy(F.desc("n"), F.asc("word"))
        .limit(top_words)
        .collect()
    )
    return [(r["word"], r["n"]) for r in rows]


def _apply_merge(
    symbols: list[str], left: str, right: str, merged: str
) -> list[str]:
    """Single left-to-right non-overlapping pass (the spec's merge law)."""
    out: list[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def learn_merges(
    vocab: Iterable[tuple[str, int]],
    num_merges: int = 100,
    min_count: int = 2,
) -> list[tuple[str, str, str, int]]:
    """The written-spec merge loop over a (word, count) dictionary.

    Returns [(left, right, merged, pair_count), ...] in rank order.
    O(V · num_merges); independent of corpus size."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END_WORD], c) for w, c in vocab
    ]
    merges: list[tuple[str, str, str, int]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + c
        if not counts:
            break
        # highest count; ties on (left, right) ascending
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_count:
            break
        merged = left + right
        merges.append((left, right, merged, n))
        words = [
            (_apply_merge(syms, left, right, merged), c)
            for syms, c in words
        ]
    return merges


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    top_words: int = 50_000,
    min_count: int = 2,
) -> list[tuple[str, str, str, int]]:
    """Corpus word count (Spark) → bounded capture → spec merge loop."""
    vocab = capture_vocab(word_counts(docs, text_col), top_words)
    return learn_merges(vocab, num_merges=num_merges, min_count=min_count)


def merges_report(
    spark: SparkSession, merges: list[tuple[str, str, str, int]]
) -> DataFrame:
    """Learned merge table: (rank, left, right, merged, pair_count)."""
    schema = T.StructType(
        [T.StructField("rank", T.IntegerType(), False),
         T.StructField("left", T.StringType(), False),
         T.StructField("right", T.StringType(), False),
         T.StructField("merged", T.StringType(), False),
         T.StructField("pair_count", T.LongType(), False)]
    )
    rows = [(i, l, r, m, n) for i, (l, r, m, n) in enumerate(merges)]
    return spark.createDataFrame(rows, schema)


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first encoding (the spec's encoder law)."""
    syms = list(word) + [END_WORD]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = _apply_merge(
            syms, best_pair[0], best_pair[1], best_pair[0] + best_pair[1]
        )
    return syms


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str, str, int]],
    text_col: str = "text",
    by: str = "lang",
) -> DataFrame:
    """Per-group tokenizer yield under the LEARNED merges — exact ints.

    (group, n_docs, total_words, total_tokens, total_chars): chars count
    word code points (whitespace excluded), tokens include the ``</w>``
    end symbols.  Map-only ``mapInPandas`` with per-batch distinct-word
    memoization (cost ∝ distinct words per batch, not corpus tokens),
    then one tiny map-side-combined rollup."""
    import re as _re

    ranks = {(l, r): i for i, (l, r, _m, _n) in enumerate(merges)}
    word_re = _re.compile(WORD_SPLIT_RE)
    out_schema = T.StructType(
        [T.StructField("grp", T.StringType(), True),
         T.StructField("n_words", T.LongType(), False),
         T.StructField("n_tokens", T.LongType(), False),
         T.StructField("n_chars", T.LongType(), False)]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, int] = {}

        def tok_len(word: str) -> int:
            n = cache.get(word)
            if n is None:
                n = len(encode_word(word, ranks))
                cache[word] = n
            return n

        for pdf in batches:
            grps, nw, nt, nc = [], [], [], []
            for grp, text in zip(pdf[by], pdf[text_col]):
                words = [w for w in word_re.split(text or "") if w]
                grps.append(grp)
                nw.append(len(words))
                nt.append(sum(tok_len(w) for w in words))
                nc.append(sum(len(w) for w in words))
            yield pd.DataFrame(
                {"grp": grps, "n_words": nw, "n_tokens": nt, "n_chars": nc}
            )

    per_doc = docs.select(by, text_col).mapInPandas(run, out_schema)
    return (
        per_doc.groupBy(F.col("grp").alias(by))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy(by)
    )
