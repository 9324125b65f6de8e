"""spark-submit entry point for the clips gate pipeline (north-rule launch
path: ``spark-submit --py-files dq.zip scripts/submit_gate.py ...``).

On a real cluster:

    zip -r dq.zip data_quality_spark
    spark-submit --master yarn --deploy-mode cluster \
        --py-files dq.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048 \
        scripts/submit_gate.py --input s3://bronze/clips --output s3://silver

In this sandbox, ``scripts/run_submit_demo.sh`` runs the same command against
local[8] to prove the packaging path works.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--days-per-batch", type=int, default=0)
    args = p.parse_args()

    # spark-submit provides the session; fall back to builder when run directly
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("clips-gate").getOrCreate()
    from data_quality_spark.runner import run_gate_pipeline

    res = run_gate_pipeline(
        spark,
        args.input,
        args.output,
        resume=not args.no_resume,
        days_per_batch=args.days_per_batch,
    )
    print(json.dumps(res))
    return 0 if res.get("completed") else 1


if __name__ == "__main__":
    sys.exit(main())
