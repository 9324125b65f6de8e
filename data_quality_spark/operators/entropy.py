"""Character-entropy audit — the strict-SQL member of the content-
quality family (deflate ratio is its kernel-side sibling).

Order-0 character entropy separates two spam classes the token filters
miss when the "words" aren't words: single-symbol floods ("hahaha…",
"!!!!!", digit walls) collapse toward 0 bits/char, while binary pasted
as text (base64, hex dumps) runs HOT — near the alphabet's uniform
bound — where prose on this corpus sits in a tight 3.7–4.2 bits/char
band.

Shuffle-free histogram (the part that matters at 100 TB): instead of
``explode(chars) → groupBy`` — a shuffle whose row count is the CORPUS
CHARACTER COUNT — each alphabet symbol's count comes from the classic
length-difference law::

    cnt(c) = length(s) - length(replace(s, c, ''))

43 fused string scans per row, all inside whole-stage codegen, ZERO
exchanges; symbols outside the alphabet lump into one ``other`` bucket
(``n - Σ cnt``).  The scan count is the alphabet size, not the vocab
size, so the plan is the same at any scale.

Fixed-point entropy law (exact integers end to end, the BM25
quantization pattern)::

    S        = Σ_{c: cnt>0} floor(cnt * log2(cnt) * 2^20 + 0.5)
    ent_num  = floor(n * log2(n) * 2^20 + 0.5) - S       -- n·H, fixed point
    entropy_q = floor(ent_num / n)                        -- H in 2^-20 units

``log2`` is applied ONLY to integers, so Spark and DuckDB (both libm)
produce bit-identical doubles before each floor — the strict-twin
discipline the langid/BM25 oracles established.  Decisions::

    is_low_entropy  := n >= 50 and entropy_q <= 2.5 * 2^20
    is_high_entropy := n >= 50 and entropy_q >= 4.6 * 2^20

Reference analog: none (content-quality scoring is beyond the
reference); the shape is the per-row rule scan (checks.py) with the
metric computed as a pure Catalyst expression tree (no UDF, no
Exchange — the quality_score family's execution shape).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ENT_ALPHABET",
    "ENT_SCALE",
    "ENT_MIN_CHARS",
    "ENT_LOW_Q",
    "ENT_HIGH_Q",
    "entropy_exprs",
    "entropy_flag_exprs",
    "char_entropy_stats",
    "char_entropy_flags",
    "entropy_issues",
    "char_entropy_sql",
]

# lowercase letters, digits, space and sentence punctuation; everything
# else (incl. non-ASCII) is one shared "other" symbol class
ENT_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 .,!?'"
ENT_SCALE = 1 << 20
ENT_MIN_CHARS = 50
ENT_LOW_Q = (5 << 20) // 2       # 2.5 bits/char
ENT_HIGH_Q = (23 << 20) // 5     # 4.6 bits/char


def _term(cnt: Column) -> Column:
    """floor(cnt * log2(cnt) * 2^20 + 0.5) as long; 0 when cnt = 0."""
    c = cnt.cast("double")
    return F.when(
        cnt > 0,
        F.floor(c * F.log2(c) * F.lit(float(ENT_SCALE)) + F.lit(0.5)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))


def entropy_exprs(text_col: str = "text") -> dict[str, Column]:
    """The stats as named Column expressions, so callers can fuse them
    onto any relation (rule_overlap) without a join or shuffle."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    n = F.length(t)
    counts = [n - F.length(F.replace(t, F.lit(ch))) for ch in ENT_ALPHABET]
    other = n - reduce(lambda a, b: a + b, counts)
    s = reduce(lambda a, b: a + b, [_term(c) for c in counts + [other]])
    nd = n.cast("double")
    ent_num = F.when(
        n > 0,
        F.floor(nd * F.log2(nd) * F.lit(float(ENT_SCALE)) + F.lit(0.5)).cast("long")
        - s,
    )
    return {
        "n_chars_ent": n.cast("long"),
        "ent_num": ent_num,
        "entropy_q": F.when(
            n > 0, F.floor(ent_num.cast("double") / nd).cast("long")
        ),
    }


def entropy_flag_exprs(text_col: str = "text") -> dict[str, Column]:
    """stats + the two decision columns, as fusable expressions."""
    ex = entropy_exprs(text_col)
    guard = ex["n_chars_ent"] >= F.lit(ENT_MIN_CHARS)
    ex["is_low_entropy"] = guard & (ex["entropy_q"] <= F.lit(ENT_LOW_Q))
    ex["is_high_entropy"] = guard & (ex["entropy_q"] >= F.lit(ENT_HIGH_Q))
    return ex


def char_entropy_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_chars_ent, ent_num, entropy_q) as one Catalyst expression
    tree; NULL/empty text yields n_chars_ent = 0 with NULL entropy."""
    ex = entropy_exprs(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ex["n_chars_ent"].alias("n_chars_ent"),
        ex["ent_num"].alias("ent_num"),
        ex["entropy_q"].alias("entropy_q"),
    )


def char_entropy_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``char_entropy_stats`` + the two decision columns (integer laws)."""
    guard = F.col("n_chars_ent") >= F.lit(ENT_MIN_CHARS)
    return char_entropy_stats(docs, id_col, text_col).withColumns(
        {
            "is_low_entropy": guard & (F.col("entropy_q") <= F.lit(ENT_LOW_Q)),
            "is_high_entropy": guard & (F.col("entropy_q") >= F.lit(ENT_HIGH_Q)),
        }
    )


def entropy_issues(flags: DataFrame, table: str = "documents") -> DataFrame:
    """Issue relation over the flags (reference issue schema, ONE fused
    aggregate — the audit_issues law)."""
    wide = flags.agg(
        F.count(F.lit(1)).alias("__total__"),
        F.count(F.when(F.col("is_low_entropy"), 1)).alias("n:entropy_low"),
        F.count(F.when(F.col("is_high_entropy"), 1)).alias("n:entropy_high"),
    )
    rules = [
        ("entropy_low", "warning", "text",
         "char entropy <= 2.5 bits: symbol-flood spam"),
        ("entropy_high", "warning", "text",
         "char entropy >= 4.6 bits: binary-as-text garbage"),
    ]
    structs = []
    for name, sev, column, desc in rules:
        cnt = F.col(f"n:{name}")
        total = F.col("__total__")
        structs.append(F.struct(
            F.lit(table).alias("table"),
            F.lit(column).alias("column"),
            F.lit(name).alias("issue_type"),
            cnt.alias("count"),
            total.alias("total"),
            F.when(total > 0, cnt * 100.0 / total).otherwise(F.lit(0.0))
            .cast("double").alias("percent"),
            F.when(cnt > 0, F.lit(sev)).otherwise(F.lit("info"))
            .alias("severity"),
            F.lit(desc).alias("description"),
        ))
    return wide.select(F.explode(F.array(*structs)).alias("i")).select("i.*")


def char_entropy_sql(base_select: str, id_col: str = "doc_id") -> str:
    """The full DuckDB twin of ``char_entropy_flags`` over ``base_select``
    (a SELECT producing (id, text)).  Same law, same libm
    log2-on-integers, same floors — strict dialect parity; CTE-staged so
    each count is computed once."""
    cnt_cols = []
    for i, ch in enumerate(ENT_ALPHABET):
        lit = ch.replace("'", "''")
        cnt_cols.append(f"length(t) - length(replace(t, '{lit}', '')) AS c{i}")
    names = [f"c{i}" for i in range(len(ENT_ALPHABET))]
    sum_named = " + ".join(names)
    terms = [
        f"CASE WHEN {c} > 0 THEN CAST(floor({c} * log2({c}) * {ENT_SCALE}.0"
        f" + 0.5) AS BIGINT) ELSE 0 END"
        for c in names + ["c_other"]
    ]
    return f"""
WITH base AS ({base_select}),
lowered AS (
  SELECT {id_col} AS doc_id, lower(coalesce(text, '')) AS t FROM base
),
counts AS (
  SELECT doc_id, length(t) AS n, {', '.join(cnt_cols)} FROM lowered
),
withother AS (
  SELECT *, n - ({sum_named}) AS c_other FROM counts
),
summed AS (
  SELECT doc_id, n, {' + '.join(terms)} AS s FROM withother
),
ent AS (
  SELECT doc_id, n,
    CASE WHEN n > 0 THEN
      CAST(floor(n * log2(n) * {ENT_SCALE}.0 + 0.5) AS BIGINT) - s
    ELSE NULL END AS ent_num
  FROM summed
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_ent, ent_num,
  CASE WHEN n > 0
       THEN CAST(floor(CAST(ent_num AS DOUBLE) / n) AS BIGINT)
       ELSE NULL END AS entropy_q,
  (n >= {ENT_MIN_CHARS} AND CASE WHEN n > 0
       THEN CAST(floor(CAST(ent_num AS DOUBLE) / n) AS BIGINT)
       ELSE NULL END <= {ENT_LOW_Q}) AS is_low_entropy,
  (n >= {ENT_MIN_CHARS} AND CASE WHEN n > 0
       THEN CAST(floor(CAST(ent_num AS DOUBLE) / n) AS BIGINT)
       ELSE NULL END >= {ENT_HIGH_Q}) AS is_high_entropy
FROM ent ORDER BY doc_id
"""
