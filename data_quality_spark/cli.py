"""Command-line interface: ``check`` / ``gate`` / ``completeness``.

Mirrors the reference's CLI surface (``/root/reference/src/data_quality/
cli.py:51-142``, ``cli_clean.py:23-121``) with argparse instead of click
(no extra dependency):

- ``check``  — health scan over parquet/Iceberg tables → text/json report,
  exit code via the ``fail_on`` policy (none|warning|critical; ``--strict``
  promotes warnings), ref ``cli_clean.py:109-117`` +
  ``deployment_gate.py:168-184``.
- ``gate``   — run the clips keep/drop pipeline over an input directory
  (resumable; see ``runner.run_gate_pipeline``).
- ``completeness`` — per-column fill analysis → table/database scores.

Usage: ``python -m data_quality_spark.cli check --tables /data/sf0.01 ...``
"""

from __future__ import annotations

import argparse
import json
import os
import sys

__all__ = ["main", "build_parser"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data-quality-spark")
    p.add_argument("--master", default=None, help="spark master (default local[N])")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("check", help="health scan: nulls + duplicates + orphans")
    c.add_argument("--tables", required=True, help="directory of <name>.parquet tables")
    c.add_argument("--pattern", default=None, help="only tables containing this substring")
    # CI-system formats mirror the reference's runner outputs
    # (ref scripts/ci_cd_data_quality.py:325 choices + format functions)
    c.add_argument(
        "--format",
        choices=["text", "json", "github", "gitlab", "slack", "jenkins"],
        default="text",
    )
    c.add_argument(
        "--fail-on", choices=["none", "warning", "critical"], default="critical"
    )
    c.add_argument("--strict", action="store_true", help="warnings also fail")
    c.add_argument("--output", default=None, help="write JSON report to file")

    g = sub.add_parser("gate", help="run the clips keep/drop gate pipeline")
    g.add_argument("--input", required=True, help="bronze clips parquet root")
    g.add_argument("--output", required=True, help="output root (silver/metrics/lineage)")
    g.add_argument("--no-resume", action="store_true")
    g.add_argument("--days-per-batch", type=int, default=0)

    m = sub.add_parser("completeness", help="per-column completeness analysis")
    m.add_argument("--tables", required=True)
    m.add_argument("--pattern", default=None)
    return p


def _discover(tables_dir: str, pattern: str | None) -> list[str]:
    names = sorted(
        f[: -len(".parquet")]
        for f in os.listdir(tables_dir)
        if f.endswith(".parquet")
    )
    if pattern:
        names = [n for n in names if pattern in n]
    return names


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .session import get_spark

    spark = get_spark("dq-cli", master=args.master)
    try:
        if args.cmd == "check":
            from .operators.scans import health_check
            from .plans.report import Report, exit_code_for

            names = _discover(args.tables, args.pattern)
            tables = {
                n: spark.read.parquet(os.path.join(args.tables, f"{n}.parquet"))
                for n in names
            }
            rep = health_check(tables)
            report = Report(
                tool_version="1.0", source=args.tables, issues=rep.issues
            )
            rendered = report.render(args.format)
            print(rendered)
            if args.output:
                with open(args.output, "w") as f:
                    f.write(report.render("json"))
            return exit_code_for(report, fail_on=args.fail_on, strict=args.strict)
        if args.cmd == "gate":
            from .runner import run_gate_pipeline

            res = run_gate_pipeline(
                spark,
                args.input,
                args.output,
                resume=not args.no_resume,
                days_per_batch=args.days_per_batch,
            )
            print(json.dumps(res))
            return 0 if res.get("completed") else 1
        if args.cmd == "completeness":
            from functools import reduce

            from .operators.scans import (
                completeness,
                database_completeness,
                table_completeness,
            )

            names = _discover(args.tables, args.pattern)
            parts = [
                completeness(
                    spark.read.parquet(os.path.join(args.tables, f"{n}.parquet")), n
                )
                for n in names
            ]
            union = reduce(lambda a, b: a.unionByName(b), parts)
            for row in table_completeness(union).collect():
                print(
                    f"{row['table']}: {row['completeness_score']:.2f}% "
                    f"({row['n_columns']} columns)"
                )
            db = database_completeness(union).collect()[0]
            print(
                f"DATABASE: {db['completeness_score']:.2f}% "
                f"({db['n_tables']} tables, {db['n_columns']} columns)"
            )
            return 0
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
