"""Partitioned sinks + per-partition lineage/metrics + checkpoint/resume.

The reference persists per-run benchmarks, per-issue patterns (upsert keyed
by db/table/column/issue_type) and daily trends into MySQL tables
(``/root/reference/src/data_quality/benchmark_storage.py:42-346``).  Here the
same capabilities are Iceberg-shaped:

- ``metrics``  — append-only run metrics (S5),
- ``lineage``  — per-(pipeline, partition) status ledger, MERGE-style upsert
  keyed by partition (S6) — the unit of checkpoint/resume,
- partitioned clip outputs via dynamic-partition-overwrite parquet.

Iceberg runtime jars are not on this sandbox's classpath (SURVEY.md §7.1), so
the layer speaks a minimal interface with two backends: Iceberg DDL/MERGE when
``spark.sql("SELECT 1")`` against an Iceberg catalog works, else a Parquet
fallback that preserves the semantics — partition layout, atomic
read-modify-replace upsert for the small ledger, idempotent resume.  The
fallback's ledger upsert is a whole-file swap (the ledger is tiny: one row per
partition per pipeline), done via write-to-temp + atomic rename.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.schemas import LINEAGE_SCHEMA, METRICS_SCHEMA

__all__ = [
    "iceberg_available",
    "write_partitioned",
    "write_bucketed",
    "LineageLedger",
    "PatternStore",
    "append_metrics",
    "read_metrics",
]


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and loadable."""
    try:
        jvm_conf = spark.conf.get("spark.sql.catalog.dq", None)
    except Exception:
        jvm_conf = None
    return jvm_conf is not None


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Dynamic-partition overwrite: re-running a day replaces only that day's
    directory (the parquet analog of Iceberg's overwritePartitions)."""
    (
        df.sparkSession.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
    )
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (Hive-style bucketing; Iceberg's
    ``bucket(N, col)`` partition transform on a real catalog).

    The 100 TB join pattern: two tables bucketed on the same key with the
    same bucket count join with ZERO exchange on either side — Catalyst
    recognizes the co-located output partitioning (see the bucketed-join
    test, which asserts no Exchange in the plan).  Repeated scan→join
    pipelines (clips ⋈ transcript-corrections, clips ⋈ per-clip labels)
    amortize one bucketed write into every downstream shuffle-free join.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


class LineageLedger:
    """Per-partition checkpoint ledger with MERGE-style upsert.

    Keyed by (pipeline, partition_key); a partition marked ``done`` is never
    recomputed by ``pending()`` (the resume law).  Analog of the reference's
    issue-pattern upsert keyed by (db, table, column, issue_type)
    (``benchmark_storage.py:184-279``), repurposed as the unit of restart.

    Stored as a single small JSON file swapped atomically — the ledger is
    O(#partitions) rows (thousands at 100 TB: one per ingest day × bucket),
    not O(rows), so driver-side read-modify-rename is the right tool; on a
    real cluster this would be an Iceberg MERGE INTO on the `lineage` table.
    """

    def __init__(self, root: str, pipeline: str) -> None:
        self.root = root
        self.pipeline = pipeline
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(root, f"lineage_{pipeline}.json")

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _store(self, state: dict[str, dict]) -> None:
        tmp = self.path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=0, sort_keys=True)
        os.replace(tmp, self.path)  # atomic on POSIX

    def status(self, partition_key: str) -> str | None:
        entry = self._load().get(partition_key)
        return entry["status"] if entry else None

    def mark(
        self,
        partition_key: str,
        status: str,
        rows_in: int | None = None,
        rows_kept: int | None = None,
        run_id: str = "",
    ) -> None:
        state = self._load()
        prev = state.get(partition_key, {})
        state[partition_key] = {
            "status": status,
            "rows_in": rows_in if rows_in is not None else prev.get("rows_in"),
            "rows_kept": rows_kept if rows_kept is not None else prev.get("rows_kept"),
            "run_id": run_id or prev.get("run_id", ""),
            "attempt": int(prev.get("attempt", 0)) + (1 if status == "running" else 0),
        }
        self._store(state)

    def pending(self, all_partitions: list[str]) -> list[str]:
        state = self._load()
        return [
            p
            for p in all_partitions
            if state.get(p, {}).get("status") != "done"
        ]

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        state = self._load()
        rows = [
            (
                self.pipeline,
                k,
                v["status"],
                v.get("rows_in"),
                v.get("rows_kept"),
                v.get("run_id", ""),
                int(v.get("attempt", 0)),
            )
            for k, v in sorted(state.items())
        ]
        return spark.createDataFrame(rows, LINEAGE_SCHEMA)


class PatternStore:
    """Persisted issue-pattern history (ref ``data_quality_issue_patterns``
    table, benchmark_storage.py:173-279): each ``record_scan`` MERGEs one
    scan's issues into the stored relation via
    ``operators.history.upsert_issue_patterns`` and swaps the parquet
    directory atomically (write-to-temp + rename — same fallback discipline
    as the ledger; on an Iceberg catalog this is a single ``MERGE INTO``).

    The stored relation is O(#distinct issue patterns) — thousands of rows
    for thousands of monitored columns — so the read-merge-rewrite cycle is
    metadata-scale work no matter how big the scanned tables are."""

    def __init__(self, root: str, name: str = "issue_patterns") -> None:
        self.root = root
        self.path = os.path.join(root, name)
        os.makedirs(root, exist_ok=True)

    def read(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(os.path.join(self.path, "_SUCCESS")):
            return None
        return spark.read.parquet(self.path)

    def record_scan(
        self, spark: SparkSession, issues: DataFrame, scan_ts: str
    ) -> DataFrame:
        """MERGE one scan in; returns the post-merge pattern relation."""
        from ..operators.history import upsert_issue_patterns

        merged = upsert_issue_patterns(self.read(spark), issues, scan_ts)
        tmp = self.path + f".tmp.{uuid.uuid4().hex}"
        # patterns are tiny — one file keeps the store readable at a glance
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.path + f".old.{uuid.uuid4().hex}"
        if os.path.exists(self.path):
            os.replace(self.path, old)
        os.replace(tmp, self.path)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)
        return self.read(spark)


def append_metrics(
    spark: SparkSession, root: str, rows: list[tuple]
) -> None:
    """Append metric rows (run_id, scope, metric, value, detail) — S5."""
    df = spark.createDataFrame(rows, METRICS_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(os.path.join(root, "metrics"))


def read_metrics(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "metrics"))


def reset_output(root: str) -> None:
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root, exist_ok=True)
