"""Schema advisor + backfill suggester (reference C15/C16, trimmed to the
useful core).

Mirrors the reference's heuristics over ``df.schema`` plus a handful of
cheap Spark probes:

- natural-key candidates — the reference's full name-pattern list +
  uniqueness ratio (``/root/reference/src/data_quality/
  schema_analyzer.py:185-201,400-425``);
- boolean candidates — the reference's prefix/suffix patterns or ≤2
  distinct values (``schema_analyzer.py:428-456``);
- boolean REPLACEMENT suggestions — the 13 binary value pairs
  (active/inactive, yes/no, …) and the ``*_at``-timestamp-as-boolean
  heuristic (``schema_analyzer.py:459-514``);
- denormalization detection — repeated column-name prefixes suggest an
  extracted reference table (``schema_analyzer.py:517-560``);
- fact-table detection — metric-named + numeric column share with fk-ish
  keys, plus the star-schema note (``schema_analyzer.py:606-692``);
- backfill suggestions — null gaps joined against a declared lookup map
  (``smart_backfill_suggester.py:196-264``): emits the J4-style join plan
  as data, the actual repair being `df.join(lookup, key, 'left')` +
  `coalesce`.

All probes are fused per table: ONE agg computes every uniqueness /
null counter (same single-scan law as the rule compiler), plus at most one
tiny follow-up agg that collects the value sets of the ≤2-distinct columns
for binary-pair matching.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TableAdvice",
    "advise_table",
    "suggest_backfills",
    "backfill_with_lookup",
    "IMPOSSIBLE_COLUMN_PATTERNS",
    "is_column_likely_impossible",
    "identify_impossible_columns",
]

# ref schema_analyzer.py:409-423 natural_key_patterns + the id/key/number core
KEY_NAME_PATTERNS = (
    "id", "key", "code", "isrc", "number", "email", "username", "isbn",
    "sku", "external_id", "reference", "slug",
)
# ref schema_analyzer.py:438-451 boolean_patterns
BOOL_NAME_PATTERNS = (
    "is_", "has_", "can_", "should_", "will_", "was_", "were_",
    "_flag", "_enabled", "_active", "_verified", "_confirmed",
)
# ref schema_analyzer.py:480-494 binary_patterns
BINARY_VALUE_PAIRS = [
    ("active", "inactive"), ("enabled", "disabled"), ("visible", "hidden"),
    ("public", "private"), ("yes", "no"), ("true", "false"), ("1", "0"),
    ("on", "off"), ("completed", "pending"), ("paid", "unpaid"),
    ("success", "failure"), ("approved", "rejected"), ("open", "closed"),
]
# P3: the reference's full impossible-to-fill column pattern list, verbatim
# (ref advanced_analysis.py:166-196) — columns whose nulls no backfill can
# realistically fix (derived/cached/external/secret fields).  Matched with
# unanchored case-insensitive search, exactly like the reference's
# re.compile(..., IGNORECASE).search.
IMPOSSIBLE_COLUMN_PATTERNS = [
    r"sentiment_score", r"analysis_.*", r"processed_.*", r"cached_.*",
    r"external_.*", r"metadata_.*", r"raw_response", r"additional_.*",
    r"extended_.*", r"custom_.*", r"user_.*", r"recommendation_.*",
    r"trend_.*", r"updated_by", r"approved_by", r"notes", r"description",
    r"biography", r"website", r"social_.*", r"label_.*", r"contract_.*",
    r".*_hash", r".*_token", r".*_secret", r".*_key", r"temp_.*",
    r"debug_.*", r"test_.*",
]

import re as _re

_IMPOSSIBLE_COMPILED = [
    _re.compile(p, _re.IGNORECASE) for p in IMPOSSIBLE_COLUMN_PATTERNS
]


def is_column_likely_impossible(column: str) -> bool:
    """Ref advanced_analysis.py:342 (_is_column_likely_impossible)."""
    return any(p.search(column) for p in _IMPOSSIBLE_COMPILED)


def identify_impossible_columns(schemas: dict[str, list[str]]) -> dict[str, list[str]]:
    """table → impossible column names (ref advanced_analysis.py:150-219;
    the reference walks information_schema, here the caller passes
    ``{table: df.columns}`` — pure driver-side name classification)."""
    out: dict[str, list[str]] = {}
    for table, columns in schemas.items():
        hit = [c for c in columns if is_column_likely_impossible(c)]
        if hit:
            out[table] = hit
    return out


# ref schema_analyzer.py:648-670 metric_patterns (fact-table measures)
METRIC_NAME_PATTERNS = (
    "count", "total", "sum", "amount", "revenue", "cost", "price",
    "duration", "length", "size", "weight", "volume", "quantity", "rate",
    "percentage", "score", "rating", "plays", "views", "clicks",
    "impressions", "conversions",
)


@dataclass
class TableAdvice:
    table: str
    n_rows: int
    natural_keys: list[str] = field(default_factory=list)
    boolean_candidates: list[str] = field(default_factory=list)
    suggested_booleans: dict[str, str] = field(default_factory=dict)
    denormalization: list[dict] = field(default_factory=list)
    looks_like_fact: bool = False
    notes: list[str] = field(default_factory=list)


def advise_table(df: DataFrame, table: str) -> TableAdvice:
    """One fused probe pass + driver-side heuristics."""
    cols = df.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.approx_count_distinct(F.col(c), 0.01).alias(f"__d{i}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__z{i}")
        )
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    advice = TableAdvice(table=table, n_rows=n)
    numericish = 0
    metricish = 0
    binary_probe: list[str] = []
    for i, f_ in enumerate(df.schema.fields):
        c = f_.name
        distinct = row[f"__d{i}"]
        nulls = row[f"__z{i}"]
        dt = f_.dataType.simpleString()
        if dt in ("int", "bigint", "double", "float", "decimal"):
            numericish += 1
        name = c.lower()
        if any(p in name for p in METRIC_NAME_PATTERNS):
            metricish += 1
        # natural key: key-ish name, near-unique, no nulls
        # 0.93: leaves headroom for approx_count_distinct's ±1% rsd
        if (
            any(p in name for p in KEY_NAME_PATTERNS)
            and n > 0
            and distinct >= n * 0.93
            and nulls == 0
        ):
            advice.natural_keys.append(c)
        # boolean candidate: bool-ish name or tiny domain on a non-key col
        if dt == "boolean" or any(name.startswith(p) or p in name for p in BOOL_NAME_PATTERNS):
            advice.boolean_candidates.append(c)
        elif distinct <= 2 and n > 10 and not any(p in name for p in KEY_NAME_PATTERNS):
            advice.boolean_candidates.append(c)
            advice.notes.append(f"{c}: ≤2 distinct values — consider boolean/enum")
            if dt == "string":
                binary_probe.append(c)
        # timestamp-as-boolean (ref :499-514): <prefix>*_at with a null gap
        # means the timestamp encodes "did X happen" — suggest is_<x>ed
        if (
            "_at" in name
            and any(p in name for p in ("fetch", "process", "complet", "verif"))
            and n > 0
            and 0 < nulls < n
        ):
            advice.suggested_booleans[c] = f"is_{name.replace('_at', 'ed')}"
    # one extra tiny agg: exact value sets of ≤2-distinct string columns,
    # matched against the reference's 13 binary value pairs (ref :471-497)
    if binary_probe:
        vrow = df.agg(
            *[F.collect_set(F.col(c)).alias(f"__v{i}") for i, c in enumerate(binary_probe)]
        ).collect()[0]
        for i, c in enumerate(binary_probe):
            values = {str(v).lower() for v in vrow[f"__v{i}"]}
            for pair in BINARY_VALUE_PAIRS:
                if values == set(pair):
                    advice.suggested_booleans[c] = f"{pair[0]}/{pair[1]}"
                    break
    # denormalization: repeated column-name prefixes (ref :517-560)
    prefix_groups: dict[str, list[str]] = {}
    for c in cols:
        if "_" in c:
            prefix_groups.setdefault(c.split("_")[0], []).append(c)
    for prefix, group in prefix_groups.items():
        if len(group) >= 2 and prefix not in ("created", "updated", "is", "has"):
            advice.denormalization.append(
                {
                    "type": "repeated_attributes",
                    "prefix": prefix,
                    "columns": group,
                    "suggested_table": f"{prefix}s",
                    "description": f"Extract {prefix} attributes into separate table",
                }
            )
    # fact table: mostly numeric/metric measures + at least 2 key-ish columns
    fk_ish = sum(1 for c in cols if any(p in c.lower() for p in ("id", "key")))
    advice.looks_like_fact = fk_ish >= 2 and (
        numericish >= len(cols) / 2 or metricish >= 2
    )
    if advice.looks_like_fact:
        advice.notes.append(
            f"{table}: fact-shaped — consider star-schema organization "
            "(dimension tables per fk, ref schema_analyzer.py:606-640)"
        )
    return advice


def suggest_backfills(
    df: DataFrame,
    table: str,
    lookup_map: dict[str, tuple[str, str, str]],
) -> list[dict]:
    """Null-gap scan + join-plan suggestions.

    ``lookup_map``: column → (lookup_table, match_col, value_col); a
    suggestion is emitted when the column has nulls AND the declared lookup
    could fill them (ref smart_backfill_suggester.py:196-264 emits UPDATE
    SQL; here the suggestion carries the equivalent DataFrame join plan).
    """
    cols = [c for c in lookup_map if c in df.columns]
    if not cols:
        return []
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__z{i}")
        for i, c in enumerate(cols)
    ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for i, c in enumerate(cols):
        nulls = row[f"__z{i}"]
        if nulls == 0:
            continue
        lk_table, match_col, value_col = lookup_map[c]
        out.append(
            {
                "table": table,
                "column": c,
                "null_count": int(nulls),
                "total": int(row["__n"]),
                "strategy": "lookup_join",
                "plan": (
                    f"{table}.join({lk_table}, on {table}.{match_col} == "
                    f"{lk_table}.{match_col}, 'left').withColumn('{c}', "
                    f"coalesce({c}, {lk_table}.{value_col}))"
                ),
            }
        )
    return out


def backfill_with_lookup(
    df: DataFrame,
    column: str,
    lookup: DataFrame,
    match_col: str,
    value_col: str,
) -> DataFrame:
    """Execute the J4-style repair: left join on the match key, fill NULLs
    from the lookup value (broadcast the lookup — it is the small dim)."""
    lk = F.broadcast(
        lookup.select(
            F.col(match_col).alias("__mk"), F.col(value_col).alias("__mv")
        ).dropDuplicates(["__mk"])
    )
    return (
        df.join(lk, df[match_col] == F.col("__mk"), "left")
        .withColumn(column, F.coalesce(F.col(column), F.col("__mv")))
        .drop("__mk", "__mv")
    )
