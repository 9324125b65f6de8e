"""Filter-redundancy matrix: pairwise co-fire statistics across rules.

Every curation pipeline accretes filters; nobody deletes one, because
nobody knows what it still uniquely catches.  This operator answers
that as data: for every rule pair, how many documents fire both, and
the fixed-point Jaccard of their fire sets.  Jaccard ≈ 1 means the
rules are redundant (one can go, or its cost can be gated behind the
other); Jaccard ≈ 0 with overlapping intent means they catch DIFFERENT
defects and both earn their keep.  The same accuracy-as-data shape as
``lsh_tuning`` / ``ann_recall`` / ``quality_calibration``, applied to
the rule ladder itself.

Law — exact integers: the single fused aggregate computes, for R rule
columns, R per-rule counts and R·(R−1)/2 pair counts in ONE pass
(count(CASE a AND b)); ``jaccard_q = (n_both << 20) DIV
(n_a + n_b − n_both)`` uses integer division on both engines (Spark
``DIV``, DuckDB ``//``), so the matrix is bit-stable at any corpus
size — no double rounding even at 10^12 rows.

Execution shape: one scan → one Project (the rule expressions) → one
partial/final HashAggregate whose output is a SINGLE wide row; the
pair matrix explodes driver-side from that row.  Adding a rule adds
expressions, not passes — the compile_rules law applied to rule
*interaction* instead of rule evaluation.

Reference analog: none (the reference evaluates rules, never audits
their redundancy); the aggregate shape is scans.py's fused triple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rule_overlap", "JACCARD_SCALE"]

JACCARD_SCALE = 1 << 20


def rule_overlap(flagged: DataFrame, rule_cols: list[str]) -> DataFrame:
    """(rule_a, rule_b, n_a, n_b, n_both, jaccard_q) for every unordered
    rule pair (a < b in ``rule_cols`` order), from ONE fused aggregate
    over the boolean rule columns."""
    pairs = [
        (a, b) for i, a in enumerate(rule_cols) for b in rule_cols[i + 1:]
    ]
    aggs = [
        F.count(F.when(F.col(c), 1)).cast("long").alias(f"n_{c}")
        for c in rule_cols
    ]
    aggs += [
        F.count(F.when(F.col(a) & F.col(b), 1)).cast("long").alias(f"b_{a}_{b}")
        for a, b in pairs
    ]
    wide = flagged.agg(*aggs)
    structs = []
    for a, b in pairs:
        na, nb = F.col(f"n_{a}"), F.col(f"n_{b}")
        nboth = F.col(f"b_{a}_{b}")
        denom = na + nb - nboth
        jac = F.when(
            denom > 0,
            F.expr(
                f"(`b_{a}_{b}` * {JACCARD_SCALE}) DIV "
                f"(`n_{a}` + `n_{b}` - `b_{a}_{b}`)"
            ),
        ).otherwise(F.lit(0).cast("long"))
        structs.append(F.struct(
            F.lit(a).alias("rule_a"),
            F.lit(b).alias("rule_b"),
            na.alias("n_a"),
            nb.alias("n_b"),
            nboth.alias("n_both"),
            jac.alias("jaccard_q"),
        ))
    return (
        wide.select(F.explode(F.array(*structs)).alias("p"))
        .select("p.*")
        .orderBy("rule_a", "rule_b")
    )
