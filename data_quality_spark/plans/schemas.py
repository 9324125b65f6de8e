"""Fixed StructType schemas for the engine's core relations.

The reference's universal output tuple is the ``QualityIssue`` dataclass
``{table, column, issue_type, count, total, percent, severity, description}``
(``/root/reference/src/data_quality/quality_scanner.py:21-33``).  Here it is a
first-class DataFrame schema so issue streams compose with ``unionByName`` and
aggregate with native ``groupBy`` instead of driver-side list appends.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class Severity(str, Enum):
    """Severity ladder, ref ``quality_scanner.py:572-585`` / ``models.py:14``."""

    CRITICAL = "critical"
    WARNING = "warning"
    INFO = "info"

    @classmethod
    def rank(cls, value: str) -> int:
        return {"critical": 0, "warning": 1, "info": 2}.get(value, 3)


# QualityIssue relation (ref quality_scanner.py:21-33). `count`/`total` are
# longs (row counts at 10^12 scale overflow int32), percent is double.
ISSUE_SCHEMA = T.StructType(
    [
        T.StructField("table", T.StringType(), False),
        T.StructField("column", T.StringType(), True),
        T.StructField("issue_type", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("total", T.LongType(), False),
        T.StructField("percent", T.DoubleType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)


def issue_struct_fields() -> list[str]:
    return [f.name for f in ISSUE_SCHEMA.fields]


# North-rule input table (BASELINE.json input_hint): audio clip + transcript.
CLIPS_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("sr_hz", T.IntegerType(), True),
        T.StructField("dur_ms", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("transcript", T.StringType(), True),
        # partition columns (derived at synth/ingest time)
        T.StructField("ingest_day", T.StringType(), True),
    ]
)

# Derived per-clip features emitted by the audio+text kernel stage.
CLIP_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("rms_db", T.DoubleType(), True),
        T.StructField("peak_db", T.DoubleType(), True),
        T.StructField("silence_frac", T.DoubleType(), True),
        T.StructField("clip_frac", T.DoubleType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("lang_conf", T.DoubleType(), True),
        T.StructField("ppl", T.DoubleType(), True),
    ]
)

# Gate metrics row (per partition-key aggregate), ref benchmark_storage.py:42-69.
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("scope", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("detail", T.StringType(), True),
    ]
)

# Lineage ledger row: one per (run, partition) — the checkpoint/resume unit.
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("pipeline", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # pending|done|failed
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_kept", T.LongType(), True),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("attempt", T.IntegerType(), False),
    ]
)
