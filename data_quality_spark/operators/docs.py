"""Text-analysis operators over a documents table: token stats, quality
scoring, SQL-expressible language-ID, fingerprinting, PII scrub audit.

These are the training-data text layer of the engine.  The *kernels* for
langid/perplexity live in ``functions.text`` (Arrow pandas UDFs via
``pipeline.py``); the operators here are the pure-Catalyst subset whose
semantics are deliberately restricted to constructs with identical behavior
in Spark SQL and ANSI SQL (DuckDB) so each has a differential oracle:
whitespace `split`, ASCII regex classes, exact integer counts, and divisions
of exact integers (bit-stable across engines).

Reference analogs: garbage-text deny-lists and format rules
(``/root/reference/src/data_quality/checkpoints.py:407-581``), threshold
bucketing (``advanced_analysis.py:331-339``).

Scale notes: every operator here is a single scan + one (or zero) shuffle on
a low-cardinality group key; token arrays never shuffle — aggregates are
computed before the exchange (map-side partial agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import SCRUB_CHAIN, STOPWORD_MARKERS

__all__ = [
    "token_count_col",
    "token_stats_by_lang",
    "BPE_PRETOKEN_REGEX",
    "bpe_token_stats",
    "stopword_stats",
    "quality_buckets",
    "langid_sql",
    "langid_pred_col",
    "lang_confusion",
    "lang_outliers",
    "fingerprint_stats",
    "scrub_audit",
    "encoding_audit",
    "vocab_stats",
    "length_histogram",
]

# BPE-style pre-tokenization units (the GPT-2 pre-tokenizer's shape, minus
# the lookahead RE2 lacks): a letter run, a digit run, or a punctuation run
# each count as one unit — the subword-budget estimator a training pipeline
# sizes batches with.  \p{L}/\p{N} behave identically in java.util.regex
# (Spark) and RE2 (DuckDB), keeping the operator oracle-checkable.
BPE_PRETOKEN_REGEX = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"


def token_count_col(text: Column) -> Column:
    """Whitespace token count; NULL/blank → 0.  Twin of
    functions.text.token_count and of the SQL
    ``len(regexp_split_to_array(trim(text), '\\s+'))``."""
    t = F.trim(text)
    return (
        F.when(text.isNull() | (F.length(t) == 0), F.lit(0))
        .otherwise(F.size(F.split(t, r"\s+")))
        .cast("int")
    )


def token_stats_by_lang(docs: DataFrame) -> DataFrame:
    """Per-language token statistics (exact-integer aggregates only)."""
    toks = token_count_col(F.col("text"))
    return (
        docs.withColumn("__nt", toks)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.min("__nt").cast("int").alias("min_tokens"),
            F.max("__nt").cast("int").alias("max_tokens"),
        )
        .orderBy("lang")
    )


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Token counting, BPE-ish: whitespace tokens AND regex pre-token units
    per language (exact-integer aggregates).  ``subwords_per_token`` is the
    fragmentation signal — prose sits near 1, digit/punct floods blow it up.
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    n_ws = token_count_col(F.col("text"))
    n_bpe = F.regexp_count(text, F.lit(BPE_PRETOKEN_REGEX)).cast("int")
    return (
        docs.withColumn("__ws", n_ws)
        .withColumn("__bpe", n_bpe)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__ws").cast("long").alias("total_ws_tokens"),
            F.sum("__bpe").cast("long").alias("total_subwords"),
            F.max("__bpe").cast("int").alias("max_subwords"),
            # exact-integer division: identical double in any engine; NULL
            # for token-free groups (ANSI mode raises on x/0 otherwise)
            F.when(
                F.sum("__ws") > 0,
                F.sum("__bpe").cast("double") / F.sum("__ws").cast("double"),
            )
            .alias("subwords_per_token"),
        )
        .orderBy("lang")
    )


# one global marker union: per-row stopword membership without branching on
# the (possibly wrong) declared language column
_ALL_STOPWORDS = sorted({m for ms in STOPWORD_MARKERS.values() for m in ms})


def stopword_stats(docs: DataFrame) -> DataFrame:
    """Stopword-ratio quality signal per language: total tokens, stopword
    token FREQUENCY (not distinct hits), and the count of stopword-free
    docs with ≥5 tokens — natural prose virtually always carries function
    words, so zero stopwords over a non-trivial length flags junk/generated
    text (the third leg of the length/punct/stopword quality triad)."""
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )
    stop_arr = F.array(*[F.lit(m) for m in _ALL_STOPWORDS])
    n_tok = token_count_col(F.col("text"))
    n_stop = F.when(n_tok == 0, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    )
    return (
        docs.withColumn("__nt", n_tok)
        .withColumn("__ns", n_stop)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.sum("__ns").cast("long").alias("stopword_tokens"),
            F.sum(
                F.when((F.col("__nt") >= 5) & (F.col("__ns") == 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_stopword_free"),
        )
        .orderBy("lang")
    )


def quality_buckets(docs: DataFrame) -> DataFrame:
    """Heuristic doc quality score → bucket counts per language.

    Signals (all exact-int ratios): token count, mean token length, digit
    fraction, special-char fraction.  Bucketing mirrors the reference's
    threshold categories (advanced_analysis.py:331-339).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    n_chars = F.length(text)
    n_tok = token_count_col(F.col("text"))
    digits = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    specials = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    digit_frac = F.when(n_chars > 0, digits.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    special_frac = F.when(n_chars > 0, specials.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    bucket = (
        F.when(n_tok < 5, F.lit("too_short"))
        .when(digit_frac > 0.3, F.lit("digit_heavy"))
        .when(special_frac > 0.2, F.lit("symbol_heavy"))
        .when(n_tok >= 40, F.lit("long_form"))
        .otherwise(F.lit("ok"))
    )
    return (
        docs.withColumn("quality_bucket", bucket)
        .groupBy("lang", "quality_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "quality_bucket")
    )


def langid_pred_col(text: Column) -> Column:
    """Per-doc SQL-expressible language prediction: distinct-marker
    stopword voting, argmax with alphabetical tie order, 'und' when all
    votes are 0."""
    toks = F.array_distinct(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+")
    )
    langs = sorted(STOPWORD_MARKERS)
    votes = {
        lang: F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(m) for m in STOPWORD_MARKERS[lang]])
            )
        )
        for lang in langs
    }
    best = F.greatest(*votes.values()) if len(votes) > 1 else list(votes.values())[0]
    pred = F.lit("und")
    # build the when-chain in reverse alphabetical order so earlier languages
    # win ties (the chain's first match is the last .when applied here)
    for lang in reversed(langs):
        pred = F.when(
            (best > 0) & (votes[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return pred


def langid_sql(docs: DataFrame) -> DataFrame:
    """SQL-expressible language-ID: distinct-marker-stopword voting.

    This is the cheap JVM-only prefilter; the hashed-n-gram model
    (functions.text.LangIdModel) is the real scorer in the clips pipeline.
    Returns (pred_lang, n_docs).
    """
    return (
        docs.withColumn("pred_lang", langid_pred_col(F.col("text")))
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("pred_lang")
    )


def lang_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Metadata-vs-content language confusion matrix: the declared
    ``label_col`` against the content-detected language.  Off-diagonal
    mass (pred != label, pred != 'und') is metadata label noise — the
    text analog of the cross-modal transcript/audio label_noise audit.
    One scan, one tiny-key aggregate (|langs|² cells max)."""
    return (
        docs.groupBy(
            F.col(label_col).alias("lang"),
            langid_pred_col(F.col(text_col)).alias("pred_lang"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "pred_lang")
    )


def lang_outliers(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The per-doc working set behind :func:`lang_confusion`: docs whose
    detected language confidently ('und' excluded) contradicts the
    declared label.  Map-side filter, no shuffle."""
    pred = langid_pred_col(F.col(text_col))
    return docs.select(
        F.col(id_col), F.col(label_col).alias("lang"), pred.alias("pred_lang")
    ).where((F.col("pred_lang") != "und") & (F.col("pred_lang") != F.col("lang")))


def fingerprint_stats(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplicate fingerprint profile (md5 digest)."""
    return (
        docs.withColumn("__fp", F.md5(F.col("text")))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct(F.col("__fp")).cast("long").alias("n_unique"),
            (F.count(F.lit(1)) - F.count_distinct(F.col("__fp")))
            .cast("long")
            .alias("n_dup_extra"),
        )
        .orderBy("source")
    )


def scrub_col(col: Column) -> Column:
    """Chained regexp_replace over the shared PII/toxicity patterns
    (same chain as pipeline.scrub_col; patterns in the Java↔RE2↔Python
    common dialect, replacements rendered for Spark's `$n` group syntax)."""
    from ..functions.text import _render_repl

    out = col
    for pattern, repl in SCRUB_CHAIN:
        out = F.regexp_replace(out, pattern, _render_repl(repl, "spark"))
    return out


def scrub_audit(docs: DataFrame, inject_every: int | None = None) -> DataFrame:
    """Run the scrub chain and report per-language counts of changed docs.

    ``inject_every=N`` appends a synthetic PII snippet to every Nth doc_id
    first — used by the differential tests to prove the chain fires (the
    testdata corpus contains no natural PII).
    """
    text = F.col("text")
    if inject_every:
        text = F.when(
            F.col("doc_id") % inject_every == 0,
            F.concat(F.col("text"), F.lit(" reach me at jane.doe@example.com")),
        ).otherwise(F.col("text"))
    scrubbed = scrub_col(text)
    return (
        docs.withColumn("__changed", (scrubbed != text).cast("long"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__changed").cast("long").alias("n_scrubbed"),
        )
        .orderBy("lang")
    )


# encoding-hygiene patterns, restricted to the Java↔RE2 shared dialect:
# explicit \xNN escapes and literal BMP codepoints only (no \p classes).
REPLACEMENT_PATTERN = "�"
CONTROL_PATTERN = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"  # C0 minus \t\n\r
# UTF-8-decoded-as-Latin-1 double-encoding signatures: Ã/Â followed by a
# non-space (é→Ã©, ü→Ã¼, NBSP→Â ) and the â€ prefix of curly quotes/dashes
MOJIBAKE_PATTERN = "(Ã[^ ]|Â[^ ]|â€)"


def encoding_audit(
    docs: DataFrame, inject_every: int | None = None
) -> DataFrame:
    """Per-language encoding-hygiene audit: U+FFFD replacement characters
    (a decoder already gave up once), stray C0 control bytes, and
    UTF-8-as-Latin-1 mojibake signatures (Ã©/â€™-style double encodings).

    A crawled corpus accumulates all three; every downstream text metric
    (langid, perplexity, tokenization) degrades on such rows, so the
    audit belongs BEFORE the quality gate.  One scan, zero shuffles
    beyond the per-language tally; every count is an exact integer
    (strict DuckDB twin).

    ``inject_every=N`` plants one defect of each class on deterministic
    doc_id residues first (the synthetic corpus is clean by
    construction) — same pattern as ``scrub_audit``.

    Columns: lang, n_docs, n_replacement_docs, total_replacement,
    n_control_docs, total_control, n_mojibake_docs, total_mojibake,
    n_suspect (any marker present).
    """
    text = F.coalesce(F.col("text"), F.lit(""))
    if inject_every:
        text = (
            F.when(
                F.col("doc_id") % (3 * inject_every) == 0,
                F.concat(text, F.lit(" caf�e")),
            )
            .when(
                F.col("doc_id") % (3 * inject_every) == inject_every,
                F.concat(text, F.lit(" bad\x07ctl")),
            )
            .when(
                F.col("doc_id") % (3 * inject_every) == 2 * inject_every,
                F.concat(text, F.lit(" cafÃ© donâ€™t")),
            )
            .otherwise(text)
        )
    n_repl = F.regexp_count(text, F.lit(REPLACEMENT_PATTERN))
    n_ctl = F.regexp_count(text, F.lit(CONTROL_PATTERN))
    n_moji = F.regexp_count(text, F.lit(MOJIBAKE_PATTERN))
    suspect = (n_repl > 0) | (n_ctl > 0) | (n_moji > 0)
    base = docs.select(
        "lang",
        n_repl.alias("__nr"),
        n_ctl.alias("__nc"),
        n_moji.alias("__nm"),
        suspect.cast("int").alias("__sus"),
    )
    return (
        base.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("__nr") > 0).cast("int")).cast("long")
            .alias("n_replacement_docs"),
            F.sum("__nr").cast("long").alias("total_replacement"),
            F.sum((F.col("__nc") > 0).cast("int")).cast("long")
            .alias("n_control_docs"),
            F.sum("__nc").cast("long").alias("total_control"),
            F.sum((F.col("__nm") > 0).cast("int")).cast("long")
            .alias("n_mojibake_docs"),
            F.sum("__nm").cast("long").alias("total_mojibake"),
            F.sum("__sus").cast("long").alias("n_suspect"),
        )
        .orderBy("lang")
    )


def vocab_stats(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Corpus vocabulary head: the ``top_k`` most frequent tokens with
    frequency and document frequency — the Zipf-head report a curation
    pass eyeballs for tokenizer/stopword sanity (an unexpected token in
    the head = boilerplate or a generator artifact).

    Tokens explode map-side and aggregate on the token (partial counts
    before the exchange — the corpus never shuffles as documents); the
    top-k is a TakeOrdered over the (small) vocabulary relation.
    Deterministic: ties break on the token string ascending.
    """
    toks = F.split(
        F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
    )
    exploded = (
        docs.where(token_count_col(F.col("text")) > 0)
        .select(F.col("doc_id"), F.explode(toks).alias("token"))
    )
    counts = exploded.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.count_distinct("doc_id").cast("long").alias("doc_freq"),
    )
    return (
        counts.orderBy(F.desc("freq"), F.asc("token")).limit(top_k)
    )


# length histogram: power-of-two char buckets; 2^20 caps the ladder (a
# >1 MiB "document" is its own pathology and lands in the top bucket)
_LEN_BUCKET_CAP = 20


def length_histogram(docs: DataFrame) -> DataFrame:
    """Per-language doc-length histogram over power-of-two char buckets:
    (lang, bucket_lo, n_docs, total_chars) — the distribution a curator
    checks before choosing min/max length cuts (Gopher-style bounds are
    corpus-dependent; this is the data they are read off of).

    ``bucket_lo`` is 2^floor(log2(len)) computed in INTEGER bit-length
    arithmetic (no float log — exact at every boundary, engine-portable);
    empty/NULL docs land in bucket_lo = 0.  One scan, one small rollup.
    """
    n = F.length(F.coalesce(F.col("text"), F.lit("")))
    # integer floor-log2 via a when-ladder on boundaries: exact, no float
    bucket = F.lit(0)
    for e in range(_LEN_BUCKET_CAP + 1):
        bucket = F.when(n >= F.lit(1 << e), F.lit(1 << e)).otherwise(bucket)
    return (
        docs.groupBy("lang", bucket.cast("long").alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(n).cast("long").alias("total_chars"),
        )
        .orderBy("lang", "bucket_lo")
    )
