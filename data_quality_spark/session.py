"""SparkSession construction with scale-oriented defaults.

One place to pin the configs that matter at 100 TB (AQE, Arrow, shuffle
partition sizing) so every entry point — tests, bench, spark-submit jobs —
runs the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[N], 128 GiB); on a real cluster the
# same knobs are what you'd tune: AQE coalesces the small shuffles these
# pipelines produce, Arrow batch size bounds pandas-UDF memory for binary
# audio payloads, maxPartitionBytes keeps clip-heavy parquet splits sane.
DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~2k clips/batch: at ~100 KB/clip payload that is ~200 MB Arrow buffers
    # per task — safe under a 4 GiB executor slot, big enough to amortize.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MB splits
    "spark.sql.session.timeZone": "UTC",  # duckdb-oracle comparability
    # keep partition columns (ingest_day=...) as strings — stable schema vs
    # CLIPS_SCHEMA and ledger keys
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "data_quality_spark",
    master: str | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a session with the engine's defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    confs = dict(DEFAULT_CONFS)
    if master and master.startswith("local["):
        # match shuffle parallelism to local cores for tight local runs
        n = master[6:-1]
        if n.isdigit():
            confs["spark.sql.shuffle.partitions"] = str(max(int(n), 4))
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
