"""Web-scale document quality filters: Gopher-style rules, repetition
filters, and benchmark decontamination.

These are the standard pre-training corpus gates (Rae et al. 2021 "Scaling
Language Models" appendix A1.1; Raffel et al. 2020 C4; Brown et al. 2020
appendix C decontamination), re-expressed as one-pass Catalyst relations in
the same dialect discipline as ``operators/docs.py``: every per-doc signal
is an exact integer, every threshold a cross-multiplied integer comparison
(never a per-row float division), so each operator has a bit-stable DuckDB
twin for the differential gate.

Reference analogs: threshold bucketing / garbage deny-lists
(``/root/reference/src/data_quality/advanced_analysis.py:331-339``,
``checkpoints.py:407-581``) — same shape (per-row predicate → conditional
count → gate), widened to the published corpus-filter rule sets.

Scale notes
-----------
- ``gopher_flags`` is pure map-side column arithmetic: one scan, zero
  shuffles before the per-lang aggregate (map-side partials on a
  5-ish-cardinality key).
- ``repetition_stats`` explodes tokens once; the only shuffles carry
  (doc_id, gram) pairs and per-doc partial rows — never documents.  The
  per-lang rollup keys the SAME doc_id partitioning Catalyst already has,
  so AQE coalesces rather than re-exchanges.
- ``decontaminate`` broadcasts the benchmark n-gram set (eval suites are
  KBs-to-MBs against a 100 TB corpus); the corpus side is one explode +
  one broadcast-hash semi-join + one doc-keyed count — no corpus shuffle
  on anything wider than doc_id.  Grams join on their string value (exact,
  collision-free); at petabyte scale pass ``hash_grams=True`` to join on
  ``xxhash64(gram)`` and shrink shuffle/broadcast width to 8 bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .docs import _ALL_STOPWORDS, token_count_col

__all__ = [
    "gopher_flags",
    "gopher_quality",
    "source_reputation",
    "word_ngrams",
    "repetition_flags",
    "repetition_stats",
    "decontaminate",
    "decontamination_report",
    "boilerplate_ngrams",
    "boilerplate_stats",
    "frequent_lines",
    "remove_frequent_lines",
    "funnel_flags",
    "corpus_funnel",
    "corpus_clean",
]

# Gopher A1.1 defaults (word-soup sandbox corpora pass scaled-down bounds
# via parameters; the semantics stay the published ones).
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3  # mean word length in [3, 10]
MAX_MEAN_WORD_LEN = 10
# symbol-to-word ratio ≤ 0.1 for '#' / '...'; fraction of words with an
# alphabetic character ≥ 0.8; ≥ 2 stop words present
SYMBOL_RATIO_NUM, SYMBOL_RATIO_DEN = 1, 10
ALPHA_FRAC_NUM, ALPHA_FRAC_DEN = 4, 5
MIN_STOP_HITS = 2

# A token counts as "alphabetic" if it contains ≥1 ASCII letter.  The
# scanning regex consumes whole tokens (greedy \S* on both sides, matches
# cannot cross whitespace), so regexp_count == number of such tokens —
# identical in java.util.regex (Spark) and RE2 (DuckDB), no lookarounds.
_ALPHA_WORD_REGEX = r"[^\s]*[A-Za-z][^\s]*"
_SYMBOL_REGEX = r"#|\.\.\."


def gopher_flags(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
) -> DataFrame:
    """Per-doc Gopher rule outcomes: the input relation plus one boolean
    ``fail_*`` column per rule and a ``gopher_pass`` conjunction.

    All signals are exact integers; thresholds are integer
    cross-multiplications, so the flags are bit-identical in any engine.
    One scan, zero shuffles.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    nt = token_count_col(F.col(text_col))
    # total non-whitespace chars (numerator of mean word length)
    nns = F.length(F.regexp_replace(text, r"\s", ""))
    alpha = F.regexp_count(text, F.lit(_ALPHA_WORD_REGEX))
    sym = F.regexp_count(text, F.lit(_SYMBOL_REGEX))
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    stop_arr = F.array(*[F.lit(m) for m in _ALL_STOPWORDS])
    n_stop = F.when(nt == 0, F.lit(0)).otherwise(
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    )
    fails = {
        # word count outside [min_words, max_words]
        "fail_word_count": (nt < min_words) | (nt > max_words),
        # mean word length outside [3, 10]  ⇔  nns outside [3·nt, 10·nt]
        "fail_mean_word_len": (nns < F.lit(MIN_MEAN_WORD_LEN) * nt)
        | (nns > F.lit(MAX_MEAN_WORD_LEN) * nt),
        # '#'/'...' per word > 1/10
        "fail_symbol_ratio": F.lit(SYMBOL_RATIO_DEN) * sym
        > F.lit(SYMBOL_RATIO_NUM) * nt,
        # words containing a letter < 4/5 of words
        "fail_alpha_frac": F.lit(ALPHA_FRAC_DEN) * alpha
        < F.lit(ALPHA_FRAC_NUM) * nt,
        "fail_stopword": n_stop < MIN_STOP_HITS,
    }
    out = docs
    for name, cond in fails.items():
        out = out.withColumn(name, cond)
    gopher_pass = ~fails["fail_word_count"]
    for name in list(fails)[1:]:
        gopher_pass = gopher_pass & ~F.col(name)
    return out.withColumn("gopher_pass", gopher_pass)


def gopher_quality(
    docs: DataFrame,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
) -> DataFrame:
    """Per-language Gopher rule tally: n_docs, one failure count per rule,
    and the count of docs passing every rule.  Map-side partial aggregate
    into a low-cardinality exchange — the only shuffle."""
    flagged = gopher_flags(docs, min_words=min_words, max_words=max_words)
    cnt = lambda c: F.sum(F.col(c).cast("int")).cast("long").alias(c)  # noqa: E731
    return (
        flagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            cnt("fail_word_count"),
            cnt("fail_mean_word_len"),
            cnt("fail_symbol_ratio"),
            cnt("fail_alpha_frac"),
            cnt("fail_stopword"),
            F.sum(F.col("gopher_pass").cast("int")).cast("long").alias("n_pass"),
        )
        .orderBy("lang")
    )


def source_reputation(
    docs: DataFrame,
    by: str = "source",
    text_col: str = "text",
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    fail_num: int = 7,
    fail_den: int = 10,
    dup_num: int = 1,
    dup_den: int = 5,
) -> DataFrame:
    """Per-source (domain/site/feed) reputation rollup — the RefinedWeb /
    C4 URL-level curation analog: instead of judging documents one at a
    time, judge the SOURCE by the aggregate behavior of its documents and
    flag whole sources whose populations are bad.  A domain that is 70%
    Gopher-failures or 20% exact duplicates is a template farm / scraper
    trap; dropping it wholesale is cheaper and safer than per-doc
    filtering (one bad doc from a good domain is noise; a bad domain
    emits bad docs forever).

    Signals per source — all exact integers:

    - ``n_gopher_fail``: docs failing ANY Gopher A1.1 rule
      (``gopher_flags``, integer cross-multiplied thresholds);
    - ``n_dup``: docs whose exact text (md5) appears more than once
      CORPUS-WIDE (cross-source: a template shared across two domains
      counts against both);
    - ``n_null_empty``: NULL/blank documents.

    Flags are integer cross-multiplications: ``flag_quality`` ⇔
    fail share ≥ fail_num/fail_den, ``flag_dup`` ⇔ dup share ≥
    dup_num/dup_den, ``flag_source`` = either.

    Scale shape: gopher flags are map-side column arithmetic on the scan;
    the dup test shuffles a SLIM projection (source, two ints, one
    32-char digest) keyed on the digest — documents themselves never
    move; the rollup keys a low-cardinality source with map-side
    partials.  Two exchanges total, both narrow.
    """
    text = F.col(text_col)
    flagged = gopher_flags(docs, text_col=text_col,
                           min_words=min_words, max_words=max_words)
    null_empty = text.isNull() | (F.length(F.trim(text)) == 0)
    slim = flagged.select(
        F.col(by).alias("__by"),
        (~F.col("gopher_pass")).cast("int").alias("__gf"),
        null_empty.cast("int").alias("__nul"),
        F.coalesce(
            F.when(~null_empty, F.md5(text)),
            F.concat(F.lit("~"), F.col("doc_id").cast("string")),
        ).alias("__fp"),  # sentinel: NULL/blank docs are their own
        # partition — a corpus-wide NULL population must not funnel into
        # ONE window task (same law as funnel_flags' keep key)
        null_empty.alias("__ne"),
    )
    w = Window.partitionBy("__fp")
    marked = slim.withColumn(
        "__dup",
        ((~F.col("__ne")) & (F.count(F.lit(1)).over(w) > 1))
        .cast("int"),
    )
    n_docs = F.count(F.lit(1)).cast("long")
    agg = marked.groupBy(F.col("__by").alias(by)).agg(
        n_docs.alias("n_docs"),
        F.sum("__gf").cast("long").alias("n_gopher_fail"),
        F.sum("__dup").cast("long").alias("n_dup"),
        F.sum("__nul").cast("long").alias("n_null_empty"),
    )
    flag_quality = (
        F.col("n_gopher_fail") * F.lit(fail_den)
        >= F.col("n_docs") * F.lit(fail_num)
    )
    flag_dup = (
        F.col("n_dup") * F.lit(dup_den) >= F.col("n_docs") * F.lit(dup_num)
    )
    return (
        agg.withColumn("flag_quality", flag_quality)
        .withColumn("flag_dup", flag_dup)
        .withColumn("flag_source", flag_quality | flag_dup)
        .orderBy(by)
    )


def word_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    carry: list[str] | None = None,
) -> DataFrame:
    """(id, gram [, carry...]) — every word ``n``-gram per row, lowercased,
    space-joined, NOT deduplicated.  Docs with < n tokens emit nothing.

    One posexplode (map-side) + one window over doc_id: tokens shuffle
    exactly once, on the id — the partitioning every downstream per-doc
    aggregate reuses.  ``carry`` columns ride along to avoid a join back
    against the (heavy) source relation.
    """
    carry = carry or []
    toks = F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
    base = (
        df.where(token_count_col(F.col(text_col)) >= n)
        .select(F.col(id_col).alias("__id"), *carry, F.posexplode(toks))
        .withColumnsRenamed({"pos": "__pos", "col": "__w"})
    )
    w = Window.partitionBy("__id").orderBy("__pos")
    parts = [F.col("__w")] + [
        F.lead("__w", k).over(w).alias(f"__l{k}") for k in range(1, n)
    ]
    grammed = base.select("__id", *carry, *parts)
    gram = F.concat_ws(
        " ", F.col("__w"), *[F.col(f"__l{k}") for k in range(1, n)]
    )
    return (
        grammed.where(F.col(f"__l{n - 1}").isNotNull())
        .select(F.col("__id").alias(id_col), gram.alias("gram"), *carry)
    )


def repetition_flags(
    docs: DataFrame,
    top_gram_n: int = 2,
    dup_num: int = 3,
    dup_den: int = 10,
) -> DataFrame:
    """Per-doc repetition signals and rule outcomes: every ``docs`` column
    plus ``__nt/__nc/__dup/__tc`` (exact integers) and two booleans —

    - ``fail_dup_tokens``: duplicated-token fraction > dup_num/dup_den
      (default 3/10, the Gopher value)
      ⇔ dup_den·dup_extra > dup_num·n_tokens (dup = n_tokens − n_distinct);
    - ``fail_top_gram``: characters covered by the most character-covering
      repeated ``top_gram_n``-gram (the deterministic max over grams of
      count·len, counting only grams seen ≥ 2×) > 1/5 of the doc's chars
      ⇔ 5·top_chars > n_chars.

    Shuffle budget: tokens exchange once on doc_id (the window), gram
    counts aggregate on (doc_id, gram) then doc_id — both partial-agg
    before exchanging; document text itself never moves.
    """
    nt = token_count_col(F.col("text"))
    toks = F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+")
    base = docs.select(
        "*",
        nt.alias("__nt"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("__nc"),
        F.when(nt == 0, F.lit(0))
        .otherwise(nt - F.size(F.array_distinct(toks)))
        .alias("__dup"),
    )
    top = (
        word_ngrams(docs, "doc_id", "text", top_gram_n)
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .where(F.col("__cnt") > 1)  # a gram seen once is not repetition
        .groupBy("doc_id")
        .agg(
            F.max(F.col("__cnt") * F.length("gram")).alias("__top_chars")
        )
    )
    return (
        base.join(top, "doc_id", "left")
        .withColumn("__tc", F.coalesce(F.col("__top_chars"), F.lit(0)))
        .drop("__top_chars")
        .withColumn(
            "fail_dup_tokens",
            F.lit(dup_den) * F.col("__dup") > F.lit(dup_num) * F.col("__nt"),
        )
        .withColumn(
            "fail_top_gram", F.lit(5) * F.col("__tc") > F.col("__nc")
        )
    )


def repetition_stats(docs: DataFrame, top_gram_n: int = 2) -> DataFrame:
    """Per-language repetition-filter tally over ``repetition_flags``:
    corpus-level duplicated-token mass plus per-rule failure counts (see
    the flag docstring for the exact integer laws)."""
    return (
        repetition_flags(docs, top_gram_n)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.sum("__dup").cast("long").alias("total_dup_extra"),
            F.sum(F.col("fail_dup_tokens").cast("int"))
            .cast("long")
            .alias("n_fail_dup_tokens"),
            F.sum(F.col("fail_top_gram").cast("int"))
            .cast("long")
            .alias("n_fail_top_gram"),
        )
        .orderBy("lang")
    )


def funnel_flags(
    docs: DataFrame,
    benchmark_source: str,
    n: int = 4,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    dup_num: int = 3,
    dup_den: int = 10,
) -> DataFrame:
    """Per-doc stage booleans for the quality-filter funnel over the
    non-``benchmark_source`` slice: every input column plus the cumulative
    survival flags ``pass_dedup`` (exact text dedup, first doc_id per md5
    fingerprint wins; NULL texts get a per-row sentinel so they never
    collapse) → ``pass_gopher`` (also passes every Gopher rule) →
    ``pass_repetition`` (also passes both repetition rules) →
    ``pass_clean`` (also shares no word ``n``-gram with the benchmark
    slice).  Each stage is a conjunction of the previous, so the flags are
    monotone per row by construction.

    Execution cost = the union of the component costs: one md5-key exchange
    (the dedup window — Catalyst projects the fingerprint before the
    exchange, so raw text stays put), one doc_id exchange for the
    repetition gram counts (broadcast back onto the unshuffled base), the
    broadcast decontamination semi-join.  Document text never shuffles
    (plan audit in PLANS.md §corpus-funnel).
    """
    bench = docs.where(F.col("source") == benchmark_source)
    # null-safe: a NULL source is ordinary corpus, never the benchmark
    # (plain != would drop those rows from BOTH slices)
    scope = docs.where(~F.col("source").eqNullSafe(benchmark_source))
    flagged = repetition_flags(
        gopher_flags(scope, min_words=min_words, max_words=max_words),
        dup_num=dup_num,
        dup_den=dup_den,
    )
    fp = F.coalesce(
        F.md5(F.col("text")),
        F.concat(F.lit("~"), F.col("doc_id").cast("string")),
    )
    keep = F.col("doc_id") == F.min("doc_id").over(
        Window.partitionBy(fp)
    )
    hits = decontaminate(scope, bench, n=n).withColumnRenamed(
        "n_hits", "__hits"
    )
    rep_ok = ~F.col("fail_dup_tokens") & ~F.col("fail_top_gram")
    return (
        flagged.withColumn("__keep", keep)
        .join(hits, "doc_id", "left")
        .withColumn("pass_dedup", F.col("__keep"))
        .withColumn("pass_gopher", F.col("pass_dedup") & F.col("gopher_pass"))
        .withColumn("pass_repetition", F.col("pass_gopher") & rep_ok)
        .withColumn(
            "pass_clean", F.col("pass_repetition") & F.col("__hits").isNull()
        )
    )


def corpus_funnel(
    docs: DataFrame,
    benchmark_source: str,
    n: int = 4,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    dup_num: int = 3,
    dup_den: int = 10,
) -> DataFrame:
    """Per-language survivor counts through the successive corpus cuts a
    training pipeline applies: ``n_raw`` → ``n_after_dedup`` →
    ``n_after_gopher`` → ``n_after_repetition`` → ``n_clean`` — the
    low-cardinality rollup of :func:`funnel_flags` (see there for stage
    semantics and the shuffle budget).  Columns are monotonically
    non-increasing by construction."""
    full = funnel_flags(
        docs,
        benchmark_source,
        n=n,
        min_words=min_words,
        max_words=max_words,
        dup_num=dup_num,
        dup_den=dup_den,
    )
    cnt = lambda c, name: F.sum(F.col(c).cast("int")).cast("long").alias(name)  # noqa: E731
    return (
        full.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_raw"),
            cnt("pass_dedup", "n_after_dedup"),
            cnt("pass_gopher", "n_after_gopher"),
            cnt("pass_repetition", "n_after_repetition"),
            cnt("pass_clean", "n_clean"),
        )
        .orderBy("lang")
    )


def corpus_clean(
    docs: DataFrame,
    benchmark_source: str,
    n: int = 4,
    min_words: int = MIN_WORDS,
    max_words: int = MAX_WORDS,
    dup_num: int = 3,
    dup_den: int = 10,
) -> DataFrame:
    """The funnel's product: the surviving documents themselves — rows of
    ``docs`` (original columns only) outside ``benchmark_source`` that pass
    every funnel stage.  This is the relation a training pipeline writes
    out; :func:`corpus_funnel` is its audit trail."""
    flags = funnel_flags(
        docs,
        benchmark_source,
        n=n,
        min_words=min_words,
        max_words=max_words,
        dup_num=dup_num,
        dup_den=dup_den,
    )
    return flags.where(F.col("pass_clean")).select(*docs.columns)


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """Cross-document boilerplate vocabulary: every word ``n``-gram that
    appears in ≥ ``min_docs`` DISTINCT documents, with its document
    frequency — the n-gram analog of CCNet/C4-style frequent-line removal
    for corpora without line structure.  Returns ``(gram, gram_docs)``.

    Shuffle budget: gram occurrences exchange once on gram; the distinct
    doc-count is a partial-deduped two-phase aggregate, so the exchange
    carries (gram, doc_id) pairs already deduplicated map-side — never the
    documents.  The survivor set shrinks with ``min_docs``; at corpus scale
    it is the (small) boilerplate lexicon itself.
    """
    return (
        word_ngrams(docs, "doc_id", "text", n)
        .groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("gram_docs"))
        .where(F.col("gram_docs") >= F.lit(min_docs))
    )


def boilerplate_stats(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 5,
    flag_num: int = 1,
    flag_den: int = 2,
) -> DataFrame:
    """Per-source boilerplate mass: how much of each source's token stream
    is covered by cross-document boilerplate ``n``-grams (document
    frequency ≥ ``min_docs``), and how many docs exceed the coverage flag
    threshold ``flag_num/flag_den`` (integer-exact:
    flag_den·boiler_positions > flag_num·total_positions; docs shorter than
    ``n`` words have zero positions and can never flag).

    Columns: ``source, n_docs, total_grams, boiler_grams, n_flagged``.

    Shuffle budget: one gram-keyed exchange for the boilerplate lexicon
    (see :func:`boilerplate_ngrams`), one doc_id-keyed exchange shared by
    both per-doc counts (word_ngrams already partitions the token stream by
    doc_id), a gram-keyed join back (left to AQE — the lexicon is usually
    broadcast-sized but is corpus-derived, so nothing is forced), and the
    tiny per-source rollup.  Document text never shuffles.
    """
    grams = word_ngrams(docs, "doc_id", "text", n)  # source re-joins
    # below on doc_id — carrying it through the gram explode would widen
    # every token row through the exchange for nothing
    lexicon = boilerplate_ngrams(docs, n=n, min_docs=min_docs).select("gram")
    total = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("__npos")
    )
    boiler = (
        grams.join(lexicon, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("__nboiler"))
    )
    perdoc = (
        docs.select("doc_id", "source")
        .join(total, "doc_id", "left")
        .join(boiler, "doc_id", "left")
        .select(
            "source",
            F.coalesce(F.col("__npos"), F.lit(0)).alias("__npos"),
            F.coalesce(F.col("__nboiler"), F.lit(0)).alias("__nboiler"),
        )
    )
    flagged = F.lit(flag_den) * F.col("__nboiler") > F.lit(flag_num) * F.col(
        "__npos"
    )
    return (
        perdoc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__npos").cast("long").alias("total_grams"),
            F.sum("__nboiler").cast("long").alias("boiler_grams"),
            F.sum(flagged.cast("int")).cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix C shape): flag corpus docs
    sharing any word ``n``-gram with an evaluation set.

    Returns (id_col, n_hits) for contaminated docs only — ``n_hits`` is the
    number of DISTINCT benchmark n-grams the doc contains.  Callers
    anti-join this relation to cut the corpus.

    The benchmark gram set is deduplicated and **broadcast** (eval suites
    are tiny against the corpus); the corpus side explodes once and
    semi-joins map-side, so the only exchange carries (doc_id) partial
    counts.  ``hash_grams=True`` swaps the join key for ``xxhash64(gram)``
    (8 bytes instead of the string; collision odds ~2⁻⁶⁴ per pair).
    """
    bench_grams = word_ngrams(benchmark, id_col, text_col, n).select(
        "gram"
    ).distinct()
    doc_grams = word_ngrams(docs, id_col, text_col, n).distinct()
    if hash_grams:
        key = lambda d: d.withColumn("__k", F.xxhash64("gram")).drop("gram")  # noqa: E731
        bench_grams, doc_grams = key(bench_grams), key(doc_grams)
        cond = "__k"
    else:
        cond = "gram"
    return (
        doc_grams.join(F.broadcast(bench_grams), cond, "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )


def decontamination_report(
    docs: DataFrame,
    benchmark_source: str,
    n: int = 4,
) -> DataFrame:
    """Per-source contamination tally treating one ``source`` slice of the
    corpus as the held-out benchmark: for every OTHER source, how many docs
    share an ``n``-gram with it and how many distinct shared grams.

    Exact-integer output; the join back to ``source`` is doc_id-keyed
    against the already-filtered contaminated relation (tiny)."""
    bench = docs.where(F.col("source") == benchmark_source)
    rest = docs.where(~F.col("source").eqNullSafe(benchmark_source))
    hits = decontaminate(rest, bench, n=n)
    return (
        rest.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("n_hits").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
            F.sum(F.coalesce(F.col("n_hits"), F.lit(0)))
            .cast("long")
            .alias("total_shared_grams"),
        )
        .orderBy("source")
    )


def frequent_lines(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The cross-document frequent-LINE lexicon (C4/CCNet's actual
    boilerplate unit, for corpora that do have line structure): every
    trimmed non-empty line appearing in ≥ ``min_docs`` DISTINCT documents,
    with its document frequency.  Returns ``(line, line_docs)``.

    Shuffle budget mirrors :func:`boilerplate_ngrams`: line occurrences
    exchange once on the line, the distinct doc-count partial-dedupes
    map-side, and the survivor set IS the (small) boilerplate lexicon.
    """
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("__pos", "__raw"),
    ).select("__id", "__pos", F.trim(F.col("__raw")).alias("line"))
    return (
        lines.where(F.length("line") > 0)
        .groupBy("line")
        .agg(F.count_distinct("__id").alias("line_docs"))
        .where(F.col("line_docs") >= F.lit(min_docs))
    )


def remove_frequent_lines(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style frequent-line removal as a TRANSFORM: every line that
    appears (trimmed) in ≥ ``min_docs`` distinct documents is deleted from
    every document; remaining lines are rejoined in original order.

    Plan shape: one posexplode (map-side), ONE line-keyed aggregate for the
    lexicon, a line-keyed LEFT ANTI join (the lexicon is corpus-derived —
    broadcast is AQE's call, and at corpus scale the lexicon stays small
    because ``min_docs`` bounds it), then ONE doc-keyed aggregate that
    reassembles text with an order-exact sort_array over (pos, line)
    structs — deterministic under any partitioning.  Documents whose lines
    are all removed come back as empty strings; NULL-text docs pass
    through NULL (nothing to remove).

    Returns the input columns with ``text`` replaced by the cleaned text
    and ``n_lines_removed`` appended.

    Reference analog: none (the reference validates, never repairs text);
    nearest shape is its orphan-repair transform (fix_critical_issues.py).
    C4: Raffel et al. 2020 §2.2 ("three-sentence span" dedup, line form per
    CCNet); public pattern, re-derived here.
    """
    lex = frequent_lines(docs, min_docs, id_col, text_col).select("line")
    lines = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("__pos", "__raw"),
    ).select(
        "__id", "__pos", F.col("__raw"),
        F.trim(F.col("__raw")).alias("line"),
    )
    n_before = lines.groupBy("__id").agg(
        F.count(F.lit(1)).alias("__n_before")
    )
    kept = lines.join(lex, "line", "left_anti")
    rebuilt = (
        kept.groupBy("__id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("__pos", "__raw"))
                    ),
                    lambda s: s["__raw"],
                ),
            ).alias("__clean"),
            F.count(F.lit(1)).alias("__n_after"),
        )
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return (
        docs.join(n_before, docs[id_col] == n_before["__id"], "left")
        .drop("__id")
        .join(rebuilt, docs[id_col] == rebuilt["__id"], "left")
        .drop("__id")
        .select(
            *out_cols,
            F.when(
                F.col(text_col).isNull(), F.lit(None).cast("string")
            ).otherwise(F.coalesce(F.col("__clean"), F.lit("")))
            .alias(text_col),
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(
                F.coalesce(F.col("__n_before"), F.lit(0))
                - F.coalesce(F.col("__n_after"), F.lit(0))
            )
            .cast("int")
            .alias("n_lines_removed"),
        )
    )
