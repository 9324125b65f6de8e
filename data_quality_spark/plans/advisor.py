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
    "SchemaRecommendation",
    "advise_table",
    "suggest_backfills",
    "backfill_with_lookup",
    "recommend_indexes",
    "recommend_industry_patterns",
    "general_recommendations",
    "suggest_improvements",
    "boolean_ddl",
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


@dataclass
class SchemaRecommendation:
    """One advisor recommendation (ref schema_analyzer.py SchemaRecommendation
    shape): priority high/medium/low, an executable ``sql_example``, benefit
    and effort annotations.  The reference renders MySQL DDL (CREATE INDEX /
    ALTER TABLE); here every ``sql_example`` is **Spark SQL** the user can run
    verbatim — the Spark-native analog of a B-tree index is clustering the
    data for the access path (bucketing for join keys, sort-within-bucket for
    point lookups, partition transforms for time pruning)."""

    type: str
    priority: str
    description: str
    sql_example: str
    benefits: list[str] = field(default_factory=list)
    effort_level: str = "low"


def recommend_indexes(table: str, columns: list[str]) -> list[SchemaRecommendation]:
    """Index-opportunity rules (ref schema_analyzer.py:746-798), re-expressed
    Spark-first: a '*_id' fk column benefits from bucketing (shuffle-free
    co-located joins), an email column from a sorted layout (row-group
    min/max pruning for point lookups)."""
    recs = []
    fk_cols = [
        c for c in columns if c.lower().endswith("_id") and c.lower() != "id"
    ]
    for c in fk_cols:
        recs.append(
            SchemaRecommendation(
                type="indexing",
                priority="high",
                description=(
                    f"Bucket '{table}' on foreign-key column '{c}' for "
                    "shuffle-free JOINs (ref: CREATE INDEX on fk columns)"
                ),
                sql_example=(
                    f"CREATE TABLE {table}_bucketed USING parquet "
                    f"CLUSTERED BY ({c}) INTO 64 BUCKETS "
                    f"AS SELECT * FROM {table};"
                ),
                benefits=[
                    "Faster JOINs",
                    "Improved query performance",
                    "Better foreign key lookups",
                ],
                effort_level="low",
            )
        )
    for c in (c for c in columns if "email" in c.lower()):
        recs.append(
            SchemaRecommendation(
                type="indexing",
                priority="medium",
                description=(
                    f"Sort '{table}' by email column '{c}' so parquet "
                    "row-group min/max stats prune point lookups "
                    "(ref: CREATE INDEX on email columns)"
                ),
                sql_example=(
                    f"CREATE TABLE {table}_by_{c} USING parquet "
                    f"CLUSTERED BY ({c}) SORTED BY ({c}) INTO 64 BUCKETS "
                    f"AS SELECT * FROM {table};"
                ),
                benefits=[
                    "Faster user authentication",
                    "Improved search performance",
                ],
                effort_level="low",
            )
        )
    return recs


def recommend_industry_patterns(
    table: str, columns: list[str]
) -> list[SchemaRecommendation]:
    """Industry-pattern rules (ref schema_analyzer.py:801-876): music-table
    platform ids, metrics-table date partitioning, user-table email
    verification — each with executable Spark DDL."""
    recs = []
    low = [c.lower() for c in columns]
    if any(c in low for c in ("isrc", "artist", "song", "track", "album")):
        if "isrc" in low and "spotify_id" not in low:
            recs.append(
                SchemaRecommendation(
                    type="industry",
                    priority="medium",
                    description=(
                        "Music table detected - consider adding streaming "
                        "platform IDs"
                    ),
                    sql_example=(
                        f"ALTER TABLE {table} ADD COLUMNS "
                        "(spotify_id STRING, apple_music_id STRING);"
                    ),
                    benefits=[
                        "Better platform integration",
                        "Enhanced data linking",
                        "Industry standard compliance",
                    ],
                    effort_level="low",
                )
            )
        if "play_count" in low or "streams" in low:
            date_col = next(
                (c for c in columns if "date" in c.lower() or c.lower().endswith("_at")),
                "event_date",
            )
            recs.append(
                SchemaRecommendation(
                    type="industry",
                    priority="high",
                    description=(
                        "Metrics table detected - partition by date for "
                        "pruned scans"
                    ),
                    sql_example=(
                        f"CREATE TABLE {table}_partitioned USING parquet "
                        f"PARTITIONED BY ({date_col}) "
                        f"AS SELECT * FROM {table};"
                    ),
                    benefits=[
                        "Better query performance",
                        "Easier data archiving",
                        "Improved maintenance",
                    ],
                    effort_level="high",
                )
            )
    if any(c in low for c in ("user", "email", "password", "login")) or any(
        "email" in c for c in low
    ):
        if any("email" in c for c in low) and "email_verified" not in low:
            recs.append(
                SchemaRecommendation(
                    type="security",
                    priority="high",
                    description=(
                        "User table should track email verification for "
                        "security"
                    ),
                    sql_example=(
                        f"ALTER TABLE {table} ADD COLUMNS "
                        "(email_verified BOOLEAN, email_verified_at TIMESTAMP);"
                    ),
                    benefits=[
                        "Better security",
                        "Email validation",
                        "User onboarding tracking",
                    ],
                    effort_level="low",
                )
            )
    return recs


def general_recommendations(table: str = "your_table") -> list[SchemaRecommendation]:
    """Fallback best-practice recommendations (ref schema_analyzer.py:
    879-910)."""
    return [
        SchemaRecommendation(
            type="general",
            priority="medium",
            description="Consider adding audit timestamps to all tables",
            sql_example=(
                f"ALTER TABLE {table} ADD COLUMNS "
                "(created_at TIMESTAMP, updated_at TIMESTAMP);"
            ),
            benefits=[
                "Better audit trails",
                "Data lineage tracking",
                "Debugging capabilities",
            ],
            effort_level="low",
        ),
        SchemaRecommendation(
            type="general",
            priority="high",
            description="Ensure all tables have a stable primary key",
            sql_example=(
                f"CREATE TABLE {table}_keyed USING parquet AS "
                f"SELECT monotonically_increasing_id() AS id, * FROM {table};"
            ),
            benefits=[
                "Better replication",
                "Improved performance",
                "Data integrity",
            ],
            effort_level="medium",
        ),
    ]


def boolean_ddl(table: str, suggested_booleans: dict[str, str]) -> list[str]:
    """Render advise_table's boolean suggestions as executable Spark DDL
    (the reference's --generate-sql flag, cli.py:289-293)."""
    out = []
    for col, suggestion in suggested_booleans.items():
        first = suggestion.split("/")[0]
        name = first if first.startswith("is_") else f"is_{first}"
        out.append(f"ALTER TABLE {table} ADD COLUMNS ({name} BOOLEAN);")
    return out


def suggest_improvements(
    tables: dict[str, "DataFrame"]
) -> list[SchemaRecommendation]:
    """Comprehensive multi-table suggestions (ref cli.py:361-427 suggest):
    per-table index + industry rules plus the schema-derived boolean /
    denormalization advice, priority-tagged for the CLI's grouping.  Only
    ``advise_table`` touches data (one fused agg per table); the
    recommendation rules are driver-side name heuristics."""
    recs: list[SchemaRecommendation] = []
    for name, df in tables.items():
        cols = df.columns
        recs.extend(recommend_indexes(name, cols))
        recs.extend(recommend_industry_patterns(name, cols))
        advice = advise_table(df, name)
        for col, suggestion in advice.suggested_booleans.items():
            recs.append(
                SchemaRecommendation(
                    type="boolean",
                    priority="low",
                    description=(
                        f"Column '{col}' is binary ({suggestion}) - consider "
                        "an explicit boolean"
                    ),
                    sql_example=boolean_ddl(name, {col: suggestion})[0],
                    benefits=["Smaller storage", "Clearer semantics"],
                    effort_level="low",
                )
            )
        for d in advice.denormalization:
            # suggested name can collide with the source (prefix 'event' on
            # table 'events' pluralizes back) — the DDL must stay executable
            target = d["suggested_table"]
            if target == name:
                target = f"{target}_dim"
            recs.append(
                SchemaRecommendation(
                    type="normalization",
                    priority="medium",
                    description=d["description"],
                    sql_example=(
                        f"CREATE TABLE {target} USING parquet AS "
                        f"SELECT DISTINCT {', '.join(d['columns'])} FROM {name};"
                    ),
                    benefits=["Reduced duplication", "Single source of truth"],
                    effort_level="medium",
                )
            )
    return recs


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
