"""Corpus data card: the datasheet relation a dataset release ships.

"Datasheets for Datasets" (Gebru et al.) / model-card practice wants
one auditable table answering: how many documents, how many tokens,
how are they distributed across languages and sources, how many are
empty, how many are exact duplicates, how many pass the baseline
quality bar.  Those numbers exist piecemeal across the profiling and
quality operators; a release needs them in ONE relation computed in
ONE pass, so the card a reviewer signs is internally consistent (same
snapshot, same scan) rather than stitched from jobs that ran hours
apart.

Engine shape: ``GROUPING SETS ((), (lang), (source))`` — a single scan
feeding one Expand + aggregate, so the corpus row and every per-lang /
per-source row come from the same data pass (3× row multiplication
inside the exchange, nothing rescanned).  All metrics are exact
integers: counts, summed chars/tokens, empty-text count, Gopher-pass
count (the shared ``gopher_flags`` integer rule family), and exact
distinct-text count via md5 fingerprints.  ``n_unique`` is the one
shuffle-heavy metric at 10^12 rows — swap ``exact_unique=False`` for
HLL++ (``approx_count_distinct``) on a real run; the default stays
exact because the differential oracle hashes values.

Reference analog: the reference's summary report (C14 / report sinks)
stops at per-table issue counts; the card is its corpus-release twin,
and the strict DuckDB oracle runs the IDENTICAL grouping-sets law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .docs import token_count_col
from .quality_filters import gopher_flags

__all__ = ["data_card", "data_card_drift"]


def data_card(
    docs: DataFrame,
    exact_unique: bool = True,
    min_words: int | None = None,
    max_words: int | None = None,
) -> DataFrame:
    """(dim, grp ▸ n_docs, n_chars, n_tokens, n_empty, n_gopher_pass,
    n_unique) — the corpus row (``dim='corpus'``, ``grp='all'``) plus
    one row per language and per source, all from one scan.

    ``n_unique`` counts distinct non-NULL texts by md5 fingerprint
    (exact; set ``exact_unique=False`` for the HLL++ estimate at
    10^12 scale — every other column is unaffected)."""
    text = F.col("text")
    gk = {}
    if min_words is not None:
        gk["min_words"] = min_words
    if max_words is not None:
        gk["max_words"] = max_words
    flagged = gopher_flags(docs, **gk)
    base = flagged.select(
        "lang",
        "source",
        F.length(F.coalesce(text, F.lit(""))).cast("long").alias("__chars"),
        token_count_col(text).cast("long").alias("__toks"),
        (text.isNull() | (F.length(F.trim(text)) == 0)).cast("long")
        .alias("__empty"),
        F.md5(text).alias("__md5"),  # NULL text -> NULL fp, not counted
        F.col("gopher_pass").cast("long").alias("__pass"),
    )
    uniq = (F.count_distinct(F.col("__md5")) if exact_unique
            else F.approx_count_distinct(F.col("__md5")))
    agg = base.groupingSets([[], ["lang"], ["source"]], "lang",
                            "source").agg(
        F.grouping_id().alias("__gid"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__chars").cast("long").alias("n_chars"),
        F.sum("__toks").cast("long").alias("n_tokens"),
        F.sum("__empty").cast("long").alias("n_empty"),
        F.sum("__pass").cast("long").alias("n_gopher_pass"),
        uniq.cast("long").alias("n_unique"),
    )
    # grouping_id bit i is SET when column i is aggregated away:
    # (lang, source) -> 1 = lang kept, 2 = source kept, 3 = corpus row
    dim = (
        F.when(F.col("__gid") == 1, F.lit("lang"))
        .when(F.col("__gid") == 2, F.lit("source"))
        .otherwise(F.lit("corpus"))
    )
    # group label by the grouping id, NOT by which column is non-NULL —
    # a NULL-valued lang/source group keeps its own '(null)' row instead
    # of colliding with the corpus 'all' row
    grp = (
        F.when(F.col("__gid") == 1,
               F.coalesce(F.col("lang").cast("string"), F.lit("(null)")))
        .when(F.col("__gid") == 2,
              F.coalesce(F.col("source").cast("string"),
                         F.lit("(null)")))
        .otherwise(F.lit("all"))
    )
    return agg.select(
        dim.alias("dim"), grp.alias("grp"), "n_docs", "n_chars",
        "n_tokens", "n_empty", "n_gopher_pass", "n_unique",
    )


def data_card_drift(
    old: DataFrame,
    new: DataFrame,
    exact_unique: bool = True,
    min_words: int | None = None,
    max_words: int | None = None,
) -> DataFrame:
    """Release-to-release datasheet delta: the two corpora's data cards
    full-outer-joined on (dim, grp) —

        dim, grp ▸ status, n_docs_old, n_docs_new, d_docs, d_tokens,
                   d_empty, d_gopher_pass, d_unique

    ``status`` ∈ {added, removed, changed, stable}: a language/source
    present in only one release surfaces as its own added/removed row
    (a silent drop of a whole group is the failure this exists to
    catch); ``changed`` means any counted metric moved.  Deltas are
    new − old on exact integers (missing side counts as 0).

    Shape: two single-scan cards + one join on ≤ (1 + |langs| +
    |sources|) rows — the expensive halves stay the grouping-sets
    scans; the drift join is metadata-sized."""
    a = data_card(old, exact_unique, min_words, max_words)
    b = data_card(new, exact_unique, min_words, max_words)
    metrics = ["n_docs", "n_tokens", "n_empty", "n_gopher_pass",
               "n_unique"]
    ar = a.select("dim", "grp",
                  *[F.col(m).alias(f"{m}_old") for m in metrics])
    br = b.select("dim", "grp",
                  *[F.col(m).alias(f"{m}_new") for m in metrics])
    j = ar.join(br, ["dim", "grp"], "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    changed = None
    for m in metrics:
        c = z(f"{m}_new") != z(f"{m}_old")
        changed = c if changed is None else (changed | c)
    status = (
        F.when(F.col("n_docs_new").isNull(), F.lit("removed"))
        .when(F.col("n_docs_old").isNull(), F.lit("added"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "dim", "grp", status.alias("status"),
        z("n_docs_old").cast("long").alias("n_docs_old"),
        z("n_docs_new").cast("long").alias("n_docs_new"),
        *[(z(f"{m}_new") - z(f"{m}_old")).cast("long").alias(f"d_{m[2:]}")
          for m in metrics],
    )
