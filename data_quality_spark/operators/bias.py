"""Filter-bias audit: per-group keep-rate disparity with Wilson bounds.

A quality gate that silently drops one language (or codec, source,
dialect...) at twice the rate of the rest of the corpus is a data bug
even when every individual decision is correct — the surviving training
mix is skewed.  This audit turns the gate's keep/drop column into the
relation a curation reviewer signs off on:

    group ▸ n, n_keep, keep_rate, Wilson 95% bounds,
    rest-of-corpus keep rate, disparate-impact ratio, biased_low flag

The flag follows the four-fifths rule (selection rate < 4/5 of the
comparator's) but only fires when the group's Wilson UPPER bound sits
below the threshold — a 12-row group with a low observed rate is noise,
not bias, and must not page anyone.  The comparator is the
rest-of-corpus rate (the corpus excluding the group), so a dominant
group cannot dilute its own comparison the way a global rate would.

Engine shape: ONE exchange on the group keys (map-side partial
count/sum), then a single-row total aggregated FROM the tiny group
relation and broadcast back — the corpus is scanned once, and
everything after the first aggregate is O(#groups).  All signals are
exact integer counts; the Wilson algebra is plain IEEE-754 double
arithmetic (div/mul/sqrt are correctly rounded in the JVM, DuckDB and
CPython alike, so a differential twin matches bit-for-bit before any
display rounding).

Reference analog: none (the reference reports per-table percentages but
never a cross-group disparity statistic); the relation shape follows
its QualityIssue percent/severity convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["keep_rate_bias"]

#: z for a central 95% interval.  1.96 is the conventional constant —
#: both engine twins must use this literal, not their own qnorm.
Z_95 = 1.96


def keep_rate_bias(
    df: DataFrame,
    decision: Column | str,
    by: list[str] | tuple[str, ...],
    z: float = Z_95,
    impact_num: int = 4,
    impact_den: int = 5,
    min_n: int = 1,
) -> DataFrame:
    """Per-``by``-group keep-rate disparity audit over ``df``.

    ``decision`` is a boolean column (or name): True = the row survived
    the filter.  Returns one row per group::

        by..., n, n_keep, keep_rate, wilson_low, wilson_up,
        rest_rate, impact_ratio, biased_low

    ``biased_low`` is True iff the group's Wilson(``z``) upper bound is
    below ``impact_num/impact_den`` of the rest-of-corpus keep rate (and
    ``n >= min_n``); groups too small for the interval to clear the bar
    are reported but never flagged.  ``rest_rate``/``impact_ratio`` are
    NULL when the group IS the whole corpus (no comparator exists).
    """
    dec = F.col(decision) if isinstance(decision, str) else decision
    g = df.groupBy(*by).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec.cast("int")).cast("long").alias("n_keep"),
    )
    tot = g.agg(
        F.sum("n").alias("__tot_n"), F.sum("n_keep").alias("__tot_keep")
    )
    j = g.crossJoin(F.broadcast(tot))

    n = F.col("n").cast("double")
    p = F.col("n_keep").cast("double") / n
    z2 = float(z) * float(z)
    denom = F.lit(1.0) + F.lit(z2) / n
    center = p + F.lit(z2) / (F.lit(2.0) * n)
    half = F.lit(float(z)) * F.sqrt(
        p * (F.lit(1.0) - p) / n + F.lit(z2) / (F.lit(4.0) * n * n)
    )
    wilson_low = (center - half) / denom
    wilson_up = (center + half) / denom

    rest_n = (F.col("__tot_n") - F.col("n")).cast("double")
    rest_keep = (F.col("__tot_keep") - F.col("n_keep")).cast("double")
    has_rest = F.col("__tot_n") > F.col("n")
    rest_rate = F.when(has_rest, rest_keep / rest_n)
    impact_ratio = F.when(
        has_rest & (rest_keep > 0), (p / (rest_keep / rest_n))
    )
    # four-fifths rule in cross-multiplied form so the zero-comparator
    # edge (rest_rate == 0 can never be undershot) needs no division
    biased = (
        has_rest
        & (F.col("n") >= F.lit(int(min_n)))
        & (
            wilson_up * rest_n * F.lit(float(impact_den))
            < rest_keep * F.lit(float(impact_num))
        )
    )
    return (
        j.select(
            *by,
            "n",
            "n_keep",
            p.alias("keep_rate"),
            wilson_low.alias("wilson_low"),
            wilson_up.alias("wilson_up"),
            rest_rate.alias("rest_rate"),
            impact_ratio.alias("impact_ratio"),
            biased.alias("biased_low"),
        )
        .orderBy(*by)
    )
