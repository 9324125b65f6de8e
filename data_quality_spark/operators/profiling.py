"""Column profiling: per-column statistical summary in one fused pass.

The reference's advisor reads *schema* (names/types,
``schema_analyzer.py``); its completeness scan reads *null mass*
(``advanced_analysis.py:300``).  Profiling reads the values: row count,
null count, distinct cardinality, numeric min/max/mean, string length
stats — the table-of-contents a data-quality investigation starts from
(and the statistics a training-data curator checks before pointing a
tokenizer at 100 TB).

Shape: ONE aggregate over one scan.  Exact ``count(distinct)`` for k
columns makes Spark plan an Expand (input replicated k+1 ways before
the single shuffle) — correct but k× the exchange; ``approx=True``
switches to HyperLogLog++ ``approx_count_distinct`` which keeps the
aggregate a plain partial/final pair, the right trade at 10^12 rows
(tested against exact within its documented error in
``tests/test_profiling.py``).

Determinism note: integer sums and counts are exact, so derived means
are bit-identical float64 in any engine; doubles are profiled with
min/max (order-free) and a mean that is only reproducible on a single
deterministic plan — the oracled query therefore profiles an
integer/string table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_columns"]

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    approx: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column with
    (column, dtype, n_rows, n_null, n_distinct, min_num, max_num, mean,
    min_len, max_len, avg_len).  Numeric stats are NULL for string
    columns and vice versa; NULL-only columns report NULL min/max/mean.
    """
    if columns is None:
        columns = list(df.columns)
    fields = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in columns:
        dt = fields[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"nn:{c}"))
        if approx:
            aggs.append(F.approx_count_distinct(col).alias(f"nd:{c}"))
        else:
            aggs.append(F.count_distinct(col).alias(f"nd:{c}"))
        if isinstance(dt, _NUMERIC):
            d = col.cast("double")
            aggs += [F.min(d).alias(f"mn:{c}"), F.max(d).alias(f"mx:{c}"),
                     # exact integer sums make the mean bit-identical
                     # across engines; double sums are plan-dependent
                     (F.sum(d) / F.count(col)).alias(f"mean:{c}")]
        elif isinstance(dt, T.StringType):
            ln = F.length(col)
            aggs += [F.min(ln).alias(f"lmn:{c}"), F.max(ln).alias(f"lmx:{c}"),
                     (F.sum(ln).cast("double") / F.count(col))
                     .alias(f"lavg:{c}")]
    wide = df.agg(*aggs)

    def _dtype(c: str) -> str:
        dt = fields[c]
        if isinstance(dt, _NUMERIC):
            return "numeric"
        if isinstance(dt, T.StringType):
            return "string"
        return "other"

    structs = []
    for c in columns:
        kind = _dtype(c)
        num = kind == "numeric"
        s = kind == "string"
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.lit(kind).alias("dtype"),
            F.col("__n__").alias("n_rows"),
            (F.col("__n__") - F.col(f"nn:{c}")).alias("n_null"),
            F.col(f"nd:{c}").alias("n_distinct"),
            (F.col(f"mn:{c}") if num else F.lit(None).cast("double"))
            .alias("min_num"),
            (F.col(f"mx:{c}") if num else F.lit(None).cast("double"))
            .alias("max_num"),
            (F.col(f"mean:{c}") if num else F.lit(None).cast("double"))
            .alias("mean"),
            (F.col(f"lmn:{c}") if s else F.lit(None).cast("int"))
            .alias("min_len"),
            (F.col(f"lmx:{c}") if s else F.lit(None).cast("int"))
            .alias("max_len"),
            (F.col(f"lavg:{c}") if s else F.lit(None).cast("double"))
            .alias("avg_len"),
        ))
    return wide.select(
        F.explode(F.array(*structs)).alias("p")
    ).select("p.*")
