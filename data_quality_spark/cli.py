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
    c.add_argument("--tables", default=None,
                   help="directory of <name>.parquet tables")
    c.add_argument("--database-url", default=None,
                   help="live database instead of parquet: sqlite:///path "
                   "or jdbc:mysql://host/db (the reference's entry point; "
                   "sqlite FKs are auto-discovered from PRAGMA)")
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

    sub.add_parser(
        "wizard",
        help="guided interactive health wizard (ref interactive_cli.py)",
    )

    g = sub.add_parser("gate", help="run the clips keep/drop gate pipeline")
    g.add_argument("--input", required=True, help="bronze clips parquet root")
    g.add_argument("--output", required=True, help="output root (silver/metrics/lineage)")
    g.add_argument("--no-resume", action="store_true")
    g.add_argument("--days-per-batch", type=int, default=0)
    g.add_argument("--profile", choices=["v1", "v2"], default="v1",
                   help="v2 adds the audio-metric drop rules")

    sg = sub.add_parser(
        "segments", help="VAD-chunk clips into a training-segment table"
    )
    sg.add_argument("--input", required=True, help="bronze clips parquet root")
    sg.add_argument("--output", required=True,
                    help="output root (segments/metrics/lineage)")
    sg.add_argument("--min-dur-ms", type=int, default=200)
    sg.add_argument("--no-resume", action="store_true")
    sg.add_argument("--days-per-batch", type=int, default=0)

    ft = sub.add_parser(
        "features", help="write a training-input feature table"
    )
    ft.add_argument("--input", required=True, help="bronze clips parquet root")
    ft.add_argument("--output", required=True,
                    help="output root (features/metrics/lineage)")
    ft.add_argument(
        "--kind", choices=["mel", "identity"], default="mel",
        help="mel: log-mel ASR inputs; identity: fingerprint + "
        "channel/voice profiles (the split's decode checkpoint)",
    )
    ft.add_argument("--no-resume", action="store_true")
    ft.add_argument("--days-per-batch", type=int, default=0)

    ds = sub.add_parser(
        "datasheet", help="dataset card: counts, hours, languages, dup/PII rates"
    )
    ds.add_argument("--input", required=True, help="clips parquet root")
    ds.add_argument("--text-col", default="transcript")
    ds.add_argument("--format", choices=["json", "markdown"], default="json")

    rd = sub.add_parser(
        "redact", help="cross-modal PII/toxicity redaction (scrub + mute)"
    )
    rd.add_argument("--input", required=True, help="bronze clips parquet root")
    rd.add_argument("--output", required=True, help="redacted table destination")

    m = sub.add_parser("completeness", help="per-column completeness analysis")
    m.add_argument("--tables", required=True)
    m.add_argument("--pattern", default=None)

    # ref cli.py:148-213 nulls / orphans — first-class thin commands
    n = sub.add_parser("nulls", help="scan for NULLs in key columns")
    n.add_argument("--tables", required=True, help="directory of <name>.parquet tables")
    n.add_argument("--pattern", default=None, help="only tables containing this substring")
    n.add_argument("--format", choices=["text", "json"], default="text")

    o = sub.add_parser("orphans", help="scan for broken FK references")
    o.add_argument("--tables", required=True)
    o.add_argument("--pattern", default=None)
    o.add_argument(
        "--fk",
        action="append",
        default=[],
        metavar="child.col=parent.col",
        help="declared FK (repeatable); without any, *_id/*key name "
        "heuristics are tried",
    )
    o.add_argument("--format", choices=["text", "json"], default="text")

    # ref cli.py:215-348 analyze
    a = sub.add_parser("analyze", help="schema analysis for one table")
    a.add_argument("--tables", required=True)
    a.add_argument("--table", required=True, help="table name to analyze")
    a.add_argument("--no-normalization", action="store_true")
    a.add_argument("--no-boolean-suggestions", action="store_true")
    a.add_argument("--no-fact-analysis", action="store_true")
    a.add_argument(
        "--generate-sql", action="store_true",
        help="emit executable Spark DDL for recommendations",
    )

    # ref cli.py:351-427 suggest
    s = sub.add_parser("suggest", help="improvement suggestions for tables")
    s.add_argument("--tables", required=True)
    s.add_argument("--pattern", default=None)
    s.add_argument("--format", choices=["text", "json"], default="text")

    # ref cli_clean.py:124-130 schema
    sub.add_parser("schema", help="output JSON Schema for reports")

    li = sub.add_parser(
        "lint",
        help="AST SQL-safety lint (sql_policy): flag f-string/format/"
        "concat SQL construction in Python files",
    )
    li.add_argument("paths", nargs="+", help="Python files to lint")

    # deterministic corpus sampling (operators/sampling.py); the scale-out
    # analog of the reference's LIMIT row probes (ref cli.py:148-234)
    sa = sub.add_parser("sample", help="deterministic corpus sample")
    sa.add_argument("--tables", required=True)
    sa.add_argument("--table", required=True, help="table name to sample")
    sa.add_argument("--id-col", required=True, help="stable row-id column")
    sa.add_argument("--key", default=None,
                    help="comma-separated key columns for per-key caps")
    group = sa.add_mutually_exclusive_group(required=True)
    group.add_argument("--cap", type=int, help="max rows per key (needs --key)")
    group.add_argument("--fraction", type=float,
                       help="shuffle-free Bernoulli fraction")
    sa.add_argument("--seed", type=int, default=0)
    sa.add_argument("--output", default=None,
                    help="write sampled parquet here (default: print count)")

    pr = sub.add_parser("profile", help="per-column statistical profile")
    pr.add_argument("--tables", required=True)
    pr.add_argument("--table", required=True, help="table name to profile")
    pr.add_argument("--columns", default=None,
                    help="comma-separated subset (default: all)")
    pr.add_argument("--approx", action="store_true",
                    help="HLL++ distinct counts (Expand-free plan)")
    pr.add_argument("--format", choices=["text", "json"], default="text")

    d = sub.add_parser("diff", help="snapshot diff between two tables")
    d.add_argument("--tables", required=True)
    d.add_argument("--old", required=True, help="old snapshot table name")
    d.add_argument("--new", required=True, help="new snapshot table name")
    d.add_argument("--key", required=True, help="comma-separated key columns")
    d.add_argument("--compare", default=None,
                   help="comma-separated compared columns "
                   "(default: shared non-key)")
    d.add_argument("--format", choices=["text", "json"], default="text")

    au = sub.add_parser(
        "audit", help="fused scan-once audit (text or audio rule family)"
    )
    au.add_argument("--tables", required=True)
    au.add_argument("--table", required=True, help="table name to audit")
    au.add_argument(
        "--kind",
        choices=["text", "audio", "loops", "labels", "boilerplate",
                 "quantization", "pii", "reverb", "stereo", "flutter",
                 "clicks", "truepeak", "musicspeech", "lra", "halluc",
                 "lines", "normalize", "watermark", "compress", "entropy",
                 "turns", "voices", "consistency"],
        default="text",
    )
    au.add_argument("--min-words", type=int, default=15)
    au.add_argument("--max-words", type=int, default=90)
    au.add_argument("--decisions", default=None,
                    help="decisions table (consistency kind): id + "
                    "decision columns; --table is the cluster-members "
                    "table (node, component, cluster_size)")
    au.add_argument("--id-col", default="clip_id")
    au.add_argument("--decision-col", default="decision")
    au.add_argument("--drop-value", default=None,
                    help="consistency kind: count ONLY this verdict as a "
                    "drop (three-way gates); other non-keep verdicts are "
                    "reported as n_other.  Default: any non-keep verdict "
                    "is a drop")
    au.add_argument("--format", choices=["text", "json"], default="text")
    au.add_argument(
        "--fail-on", choices=["none", "warning", "critical"],
        default="critical",
    )

    dr = sub.add_parser(
        "drift", help="per-column drift report between two snapshots"
    )
    dr.add_argument("--tables", required=True)
    dr.add_argument("--old", required=True, help="old snapshot table name")
    dr.add_argument("--new", required=True, help="new snapshot table name")
    dr.add_argument("--key", required=True, help="comma-separated key columns")
    dr.add_argument("--compare", default=None,
                    help="comma-separated compared columns "
                    "(default: shared non-key)")
    dr.add_argument("--approx", action="store_true",
                    help="HLL++ distinct counts")
    dr.add_argument("--by", default=None,
                    help="comma-separated grouping columns (per-group drift)")
    dr.add_argument("--format", choices=["text", "json"], default="text")

    dd = sub.add_parser(
        "dedup", help="audio duplicate detection over a clips table"
    )
    dd.add_argument("--tables", required=True)
    dd.add_argument("--table", required=True)
    dd.add_argument(
        "--method",
        choices=["fingerprint", "landmark", "speed", "pitch", "channel",
                 "voice"],
        default="fingerprint",
        help="fingerprint: re-encode dups; landmark: arbitrary-offset; "
        "speed: resampled re-uploads; pitch: vocoder pitch/stretch; "
        "channel: same room/mic (noise floor); voice: same speaker",
    )
    dd.add_argument("--top", type=int, default=10,
                    help="largest clusters to print")
    dd.add_argument("--format", choices=["text", "json"], default="text")

    mf = sub.add_parser(
        "manifest",
        help="training manifest: gate decision x leakage-safe split x "
        "duration accounting per clip",
    )
    mf.add_argument("--tables", required=True)
    mf.add_argument("--table", required=True)
    mf.add_argument("--val-frac", type=float, default=0.2)
    mf.add_argument("--seed", type=int, default=0)
    mf.add_argument("--out", help="write the per-clip manifest parquet here")
    mf.add_argument("--eval-cap-ms", type=int, default=0,
                    help="also build the per-language balanced EVAL set "
                    "(duration cap per language in ms) and print its "
                    "coverage")
    mf.add_argument("--eval-out",
                    help="write the per-clip eval manifest parquet here")
    mf.add_argument("--eval-seed", type=int, default=0)
    mf.add_argument("--format", choices=["text", "json"], default="text")

    ag = sub.add_parser(
        "augment",
        help="write deterministic augmented copies (gain/noise/speed/"
        "stretch) with provenance columns",
    )
    ag.add_argument("--tables", required=True)
    ag.add_argument("--table", required=True)
    ag.add_argument("--output", required=True)
    ag.add_argument(
        "--specs", default="",
        help="comma-separated subset of spec names (default: all)",
    )

    sp = sub.add_parser(
        "split",
        help="leakage-safe train/val split over the union of the three "
        "audio identity axes (content/channel/voice)",
    )
    sp.add_argument("--tables", help="parquet table root (with --table)")
    sp.add_argument("--table", help="clips table name under --tables")
    sp.add_argument("--val-frac", type=float, default=0.2)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument(
        "--features",
        help="identity-feature checkpoint root written by `features "
        "--kind identity` — re-split with ZERO decode",
    )
    sp.add_argument("--out", help="write per-clip assignment parquet here")
    sp.add_argument("--format", choices=["text", "json"], default="text")

    sk = sub.add_parser("skew", help="key-skew audit (salting advisor input)")
    sk.add_argument("--tables", required=True)
    sk.add_argument("--table", required=True)
    sk.add_argument("--key", required=True, help="comma-separated key columns")
    sk.add_argument("--top", type=int, default=20)
    sk.add_argument("--format", choices=["text", "json"], default="text")

    se = sub.add_parser("search", help="BM25 sparse retrieval over a text table")
    se.add_argument("--tables", required=True)
    se.add_argument("--table", required=True)
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--text-col", default="text")
    se.add_argument("--query", action="append", required=True,
                    help="query string (repeatable: q1, q2, ...)")
    se.add_argument("--top", type=int, default=10)
    se.add_argument("--format", choices=["text", "json"], default="text")

    tm = sub.add_parser("terms", help="per-group tf-idf vocabulary signatures")
    tm.add_argument("--tables", required=True)
    tm.add_argument("--table", required=True)
    tm.add_argument("--by", default="source", help="grouping column")
    tm.add_argument("--text-col", default="text")
    tm.add_argument("--top", type=int, default=5)
    tm.add_argument("--format", choices=["text", "json"], default="text")

    cl = sub.add_parser(
        "classify",
        help="train + evaluate the quality classifier "
        "(Gopher rules as weak supervision)",
    )
    cl.add_argument("--tables", required=True)
    cl.add_argument("--table", required=True)
    cl.add_argument("--id-col", default="doc_id")
    cl.add_argument("--text-col", default="text")
    cl.add_argument("--sample", type=int, default=512,
                    help="bounded deterministic training-sample size")
    cl.add_argument("--buckets", type=int, default=0,
                    help="also print an N-bucket calibration curve")
    cl.add_argument("--format", choices=["text", "json"], default="text")

    pl = sub.add_parser(
        "ppl",
        help="train a Stupid-Backoff bigram LM on one split, "
        "score held-out docs, flag high perplexity",
    )
    pl.add_argument("--tables", required=True)
    pl.add_argument("--table", required=True)
    pl.add_argument("--id-col", default="doc_id")
    pl.add_argument("--text-col", default="text")
    pl.add_argument("--holdout-mod", type=int, default=10)
    pl.add_argument("--min-count", type=int, default=2)
    pl.add_argument("--threshold", type=float, default=64.0,
                    help="perplexity flag threshold")
    pl.add_argument("--top", type=int, default=10,
                    help="print the N highest-perplexity docs")
    pl.add_argument("--format", choices=["text", "json"], default="text")

    ca = sub.add_parser(
        "card",
        help="corpus data card: corpus/per-lang/per-source counts, "
        "tokens, empties, quality passes, exact uniques in one scan",
    )
    ca.add_argument("--tables", required=True)
    ca.add_argument("--table", required=True)
    ca.add_argument("--min-words", type=int, default=None)
    ca.add_argument("--max-words", type=int, default=None)
    ca.add_argument("--format", choices=["text", "json"], default="text")

    pk = sub.add_parser(
        "pack",
        help="training layout: concat-and-chunk sequences, fixed-size "
        "shards, or length-sorted padded batches",
    )
    pk.add_argument("--tables", required=True)
    pk.add_argument("--table", required=True)
    pk.add_argument("--mode",
                    choices=["sequences", "shards", "batches", "crops"],
                    default="sequences")
    pk.add_argument("--size", type=int, required=True,
                    help="seq_len (sequences), target bytes (shards), "
                    "batch size (batches), or window ms (crops)")
    pk.add_argument("--crops", type=int, default=1,
                    help="crops per clip (crops mode)")
    pk.add_argument("--epoch", type=int, default=0,
                    help="epoch number (crops mode)")
    pk.add_argument("--strata", default="",
                    help="comma-separated stratum columns")
    pk.add_argument("--id-col", default="doc_id")
    pk.add_argument("--size-col", default=None,
                    help="length/size column; default: whitespace token "
                    "count of --text-col (sequences) or n_chars")
    pk.add_argument("--text-col", default="text")
    pk.add_argument("--seed", type=int, default=0)
    pk.add_argument("--output", default=None,
                    help="write the assignment parquet here instead of "
                    "printing the manifest summary")
    pk.add_argument("--format", choices=["text", "json"], default="text")
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


def _parse_fk_specs(specs: list[str]) -> dict[str, list[tuple[str, str, str]]]:
    """'child.col=parent.col' declarations → scan_orphans fk_map."""
    fk_map: dict[str, list[tuple[str, str, str]]] = {}
    for spec in specs:
        try:
            child_part, parent_part = spec.split("=", 1)
            child_tbl, child_col = child_part.rsplit(".", 1)
            parent_tbl, parent_col = parent_part.rsplit(".", 1)
        except ValueError:
            raise SystemExit(f"bad --fk spec {spec!r}; want child.col=parent.col")
        fk_map.setdefault(child_tbl, []).append((child_col, parent_tbl, parent_col))
    return fk_map


def _heuristic_fk_map(
    tables: dict[str, object],
) -> dict[str, list[tuple[str, str, str]]]:
    """J5 name-based FK candidates when none are declared (the reference
    reads information_schema FKs, quality_scanner.py:421-445; parquet has
    none, so '<x>_id' → table '<x>'/'<x>s'(id) is the best-effort analog)."""
    fk_map: dict[str, list[tuple[str, str, str]]] = {}
    for child, df in tables.items():
        for c in df.columns:
            low = c.lower()
            if not low.endswith("_id") or low == "id":
                continue
            stem = low[:-3]
            for parent in (stem, stem + "s"):
                if parent in tables and parent != child:
                    pcols = {pc.lower(): pc for pc in tables[parent].columns}
                    for pk in ("id", low):
                        if pk in pcols:
                            fk_map.setdefault(child, []).append(
                                (c, parent, pcols[pk])
                            )
                            break
                    break
    return fk_map


def _print_issues(issues: list[dict], fmt: str, empty_msg: str) -> None:
    if fmt == "json":
        print(json.dumps(issues, default=str, indent=2))
        return
    if not issues:
        print(empty_msg)
        return
    print(f"Found {len(issues)} issue(s):")
    for i in issues:
        print(
            f"  [{i.get('severity', '?').upper():8s}] "
            f"{i['table']}.{i.get('column') or '*'} {i['issue_type']}: "
            f"{i.get('description') or ''} ({i['count']}/{i['total']})"
        )


def _validate_args(args) -> None:
    """Route numeric CLI arguments through the public validator suite
    (``validation.py``, the reference's input-validator API): a
    violation raises the typed ``ValidationError`` → exit 3, before a
    Spark session is ever started."""
    from .validation import validate_int, validate_threshold

    for name in ("val_frac", "fraction"):
        v = getattr(args, name, None)
        if v is not None:
            validate_threshold(v, name.replace("_", "-"))
    for name in (
        "seed", "eval_seed", "days_per_batch", "min_dur_ms", "top",
        "cap", "size", "crops", "epoch", "sample", "buckets",
        "min_count", "holdout_mod", "eval_cap_ms", "min_words",
        "max_words",
    ):
        v = getattr(args, name, None)
        if v is not None:
            validate_int(v, name.replace("_", "-"), min_value=0)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        _validate_args(args)
    except Exception as e:  # DataQualityError: typed, suggestion-bearing
        from .exceptions import CLI_ERROR_EXIT, DataQualityError

        if not isinstance(e, DataQualityError):
            raise
        print(f"Error: {e}", file=sys.stderr)
        return CLI_ERROR_EXIT
    if args.cmd == "lint":  # pure AST pass, no Spark session needed
        from .sql_policy import main as lint_main

        return lint_main(args.paths)
    if args.cmd == "schema":  # pure contract dump, no Spark session needed
        from .plans.report import get_json_schema

        print(json.dumps(get_json_schema(), indent=2))
        return 0
    from .exceptions import CLI_ERROR_EXIT, DataQualityError
    from .session import get_spark

    spark = get_spark("dq-cli", master=args.master)
    try:
        if args.cmd == "wizard":
            from .interactive import run_wizard

            return run_wizard(spark)
        if args.cmd == "check":
            from .exceptions import ResourceError, ValidationError
            from .operators.scans import health_check
            from .plans.report import Report, exit_code_for

            if bool(args.tables) == bool(args.database_url):
                raise ValidationError(
                    "check arguments",
                    f"tables={args.tables!r} database_url="
                    f"{args.database_url!r}",
                    "exactly one of --tables / --database-url",
                )
            if args.database_url:
                from .sources.database import (
                    load_database,
                    parse_database_url,
                    sqlite_stray_report,
                )

                patterns = [args.pattern] if args.pattern else None
                tables, fk_map = load_database(
                    spark, args.database_url, patterns=patterns
                )
                source = args.database_url
                kind, rest = parse_database_url(args.database_url)
                strays = (
                    sqlite_stray_report(rest, list(tables))
                    if kind == "sqlite" else []
                )
            else:
                if not os.path.isdir(args.tables):
                    raise ResourceError(
                        "tables", f"not a readable directory: {args.tables!r}",
                        suggestion="pass a directory of <name>.parquet files",
                    )
                names = _discover(args.tables, args.pattern)
                tables = {
                    n: spark.read.parquet(
                        os.path.join(args.tables, f"{n}.parquet"))
                    for n in names
                }
                fk_map = None
                source = args.tables
                strays = []
            rep = health_check(tables, fk_map)
            report = Report(
                tool_version="1.0", source=source,
                issues=rep.issues + strays
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
                profile=args.profile,
            )
            print(json.dumps(res))
            return 0 if res.get("completed") else 1
        if args.cmd == "segments":
            from .runner import run_segment_pipeline

            res = run_segment_pipeline(
                spark,
                args.input,
                args.output,
                min_dur_ms=args.min_dur_ms,
                resume=not args.no_resume,
                days_per_batch=args.days_per_batch,
            )
            print(json.dumps(res))
            return 0 if res.get("completed") else 1
        if args.cmd == "features":
            from .runner import run_feature_pipeline, run_identity_pipeline

            run_fn = (
                run_identity_pipeline if args.kind == "identity"
                else run_feature_pipeline
            )
            res = run_fn(
                spark,
                args.input,
                args.output,
                resume=not args.no_resume,
                days_per_batch=args.days_per_batch,
            )
            print(json.dumps(res))
            return 0 if res.get("completed") else 1
        if args.cmd == "datasheet":
            from .plans.datasheet import datasheet, render_markdown

            card = datasheet(
                spark.read.parquet(args.input), text_col=args.text_col
            )
            if args.format == "markdown":
                print(render_markdown(card))
            else:
                print(json.dumps(card))
            return 0
        if args.cmd == "redact":
            from pyspark.sql import functions as F

            from .operators.audio_redact import redact_clips

            red = redact_clips(spark.read.parquet(args.input))
            red.write.mode("overwrite").parquet(args.output)
            agg = spark.read.parquet(args.output).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_spans").alias("spans"),
                F.sum("n_muted").alias("muted_samples"),
                F.count(F.when(F.col("n_spans") > 0, 1)).alias("clips_redacted"),
            ).collect()[0]
            print(json.dumps({k: int(agg[k] or 0) for k in
                              ("n", "spans", "muted_samples", "clips_redacted")}))
            return 0
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
        if args.cmd == "nulls":
            from functools import reduce

            from .operators.scans import scan_nulls

            names = _discover(args.tables, args.pattern)
            parts = [
                scan_nulls(
                    spark.read.parquet(os.path.join(args.tables, f"{n}.parquet")), n
                )
                for n in names
            ]
            union = reduce(lambda a, b: a.unionByName(b), parts)
            issues = [r.asDict() for r in union.collect()]
            _print_issues(issues, args.format, "No null value issues found.")
            return 0
        if args.cmd == "orphans":
            from .operators.scans import scan_orphans

            names = _discover(args.tables, args.pattern)
            tables = {
                n: spark.read.parquet(os.path.join(args.tables, f"{n}.parquet"))
                for n in names
            }
            fk_map = (
                _parse_fk_specs(args.fk) if args.fk else _heuristic_fk_map(tables)
            )
            if not fk_map:
                print("No FK declarations and no *_id naming matches; "
                      "pass --fk child.col=parent.col")
                return 0
            issues = [r.asDict() for r in scan_orphans(tables, fk_map).collect()]
            _print_issues(issues, args.format, "No orphaned records found.")
            return 0
        if args.cmd == "analyze":
            from .plans.advisor import advise_table, boolean_ddl

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            advice = advise_table(df, args.table)
            print(f"Schema Analysis for table: {args.table}")
            print("=" * 50)
            keys = ", ".join(advice.natural_keys) or "None detected"
            print(f"Natural Keys: {keys}")
            if advice.boolean_candidates:
                print(f"Boolean Columns: {', '.join(advice.boolean_candidates)}")
            if not args.no_boolean_suggestions and advice.suggested_booleans:
                print("Suggested Boolean Conversions:")
                ddls = boolean_ddl(args.table, advice.suggested_booleans)
                for (col, sug), ddl in zip(
                    advice.suggested_booleans.items(), ddls
                ):
                    print(f"   - {col} (currently: {sug})")
                    if args.generate_sql:
                        print(f"     SQL: {ddl}")
            if not args.no_normalization and advice.denormalization:
                print("Normalization Opportunities:")
                for d in advice.denormalization:
                    print(f"   - {d['description']} ({', '.join(d['columns'])})")
            if not args.no_fact_analysis and advice.looks_like_fact:
                print("Fact Table Candidate - consider dimensional modeling")
            for note in advice.notes:
                print(f"note: {note}")
            return 0
        if args.cmd == "suggest":
            from dataclasses import asdict

            from .plans.advisor import suggest_improvements

            names = _discover(args.tables, args.pattern)
            tables = {
                n: spark.read.parquet(os.path.join(args.tables, f"{n}.parquet"))
                for n in names
            }
            recs = suggest_improvements(tables)
            if args.format == "json":
                print(json.dumps([asdict(r) for r in recs], indent=2))
                return 0
            if not recs:
                print("No suggestions - your schema looks great!")
                return 0
            print(f"Improvement Suggestions for {len(tables)} table(s)")
            print("=" * 50)
            for priority in ("high", "medium", "low"):
                group = [r for r in recs if r.priority == priority]
                if not group:
                    continue
                print(f"\n{priority.upper()} PRIORITY")
                print("-" * 30)
                for i, rec in enumerate(group, 1):
                    print(f"{i}. {rec.description}")
                    if rec.benefits:
                        print(f"   Benefits: {', '.join(rec.benefits)}")
                    print(f"   Effort: {rec.effort_level}")
                    print(f"   SQL: {rec.sql_example}")
            return 0
        if args.cmd == "sample":
            from .operators.sampling import capped_sample, deterministic_sample

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            if args.cap is not None:
                if not args.key:
                    print("--cap requires --key")
                    return 2
                keys = args.key.split(",")
                out = capped_sample(
                    df, keys, args.cap, args.id_col, seed=args.seed
                )
            else:
                out = deterministic_sample(
                    df, args.fraction, args.id_col, seed=args.seed
                )
            if args.output:
                out.write.mode("overwrite").parquet(args.output)
                print(f"wrote {args.output}")
            else:
                print(f"sampled {out.count()} of {df.count()} rows")
            return 0
        if args.cmd == "card":
            from .operators.datacard import data_card

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            rows = [
                r.asDict()
                for r in data_card(
                    df, min_words=args.min_words, max_words=args.max_words
                ).orderBy("dim", "grp").collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                print(f"{'dim':8s} {'grp':12s} {'docs':>8s} {'tokens':>10s}"
                      f" {'empty':>6s} {'pass':>6s} {'unique':>8s}")
                for r in rows:
                    print(f"{r['dim']:8s} {r['grp']:12s} {r['n_docs']:8d}"
                          f" {r['n_tokens']:10d} {r['n_empty']:6d}"
                          f" {r['n_gopher_pass']:6d} {r['n_unique']:8d}")
            return 0
        if args.cmd == "pack":
            from pyspark.sql import functions as F

            from .operators.docs import token_count_col
            from .operators.shards import (
                batch_by_length,
                batch_manifest,
                pack_sequences,
                sequence_manifest,
                shard_assign,
                shard_manifest,
            )

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            strata = [s for s in args.strata.split(",") if s]
            size_col = args.size_col
            if args.mode == "crops":
                from .operators.crops import crop_schedule

                sched = crop_schedule(
                    df, win_ms=args.size, crops_per_clip=args.crops,
                    epoch=args.epoch, seed=args.seed,
                    id_col=args.id_col, dur_col=size_col or "dur_ms",
                )
                if args.output:
                    sched.write.mode("overwrite").parquet(args.output)
                    print(f"wrote {args.output}")
                else:
                    n = sched.count()
                    n_clips = sched.select(args.id_col).distinct().count()
                    print(f"crops: {n} windows over {n_clips} clips "
                          f"(epoch {args.epoch}, win {args.size} ms)")
                return 0
            if args.mode == "sequences":
                if size_col is None:
                    df = df.withColumn(
                        "__ntok", token_count_col(F.col(args.text_col)))
                    size_col = "__ntok"
                assigned = pack_sequences(
                    df, size_col, args.size, strata=strata,
                    id_col=args.id_col, seed=args.seed, portable=True)
                man = sequence_manifest(assigned, strata=strata,
                                        id_col=args.id_col)
                unit, key = "tokens", "seq_id"
            elif args.mode == "shards":
                size_col = size_col or "n_chars"
                assigned = shard_assign(
                    df, size_col, args.size, strata=strata,
                    id_col=args.id_col, seed=args.seed, portable=True)
                man = shard_manifest(assigned, size_col, strata=strata,
                                     id_col=args.id_col, seed=args.seed,
                                     portable=True)
                unit, key = "bytes", "shard_id"
            else:
                size_col = size_col or "n_chars"
                assigned = batch_by_length(
                    df, size_col, args.size, strata=strata,
                    id_col=args.id_col)
                man = batch_manifest(assigned, size_col, strata=strata,
                                     id_col=args.id_col)
                unit, key = "items", "batch_id"
            if args.output:
                assigned.write.mode("overwrite").parquet(args.output)
                print(f"wrote {args.output}")
                return 0
            rows = [r.asDict() for r in man.orderBy(*strata, key).collect()]
            if args.format == "json":
                print(json.dumps(rows, indent=2, default=str))
            else:
                n_units = len(rows)
                print(f"{args.mode}: {n_units} {key} groups ({unit})")
                if args.mode == "batches":
                    waste = sum(r["pad_waste"] for r in rows)
                    padded = sum(r["padded_len"] for r in rows) or 1
                    print(f"pad waste: {waste} / {padded}"
                          f" ({waste / padded:.2%})")
                for r in rows[:10]:
                    print("  " + json.dumps(r, default=str))
                if n_units > 10:
                    print(f"  ... {n_units - 10} more")
            return 0
        if args.cmd == "profile":
            from .operators.profiling import profile_columns

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            cols = args.columns.split(",") if args.columns else None
            rows = [
                r.asDict()
                for r in profile_columns(df, cols, approx=args.approx)
                .orderBy("column").collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for r in rows:
                    extra = (
                        f"min={r['min_num']} max={r['max_num']} "
                        f"mean={r['mean']:.4g}"
                        if r["dtype"] == "numeric" and r["mean"] is not None
                        else f"len {r['min_len']}..{r['max_len']} "
                        f"avg {r['avg_len']:.1f}"
                        if r["dtype"] == "string" and r["avg_len"] is not None
                        else ""
                    )
                    print(
                        f"{r['column']:20s} {r['dtype']:8s} "
                        f"nulls {r['n_null']}/{r['n_rows']} "
                        f"distinct {r['n_distinct']} {extra}"
                    )
            return 0
        if args.cmd == "diff":
            from .operators.snapshot import snapshot_diff

            old = spark.read.parquet(
                os.path.join(args.tables, f"{args.old}.parquet")
            )
            new = spark.read.parquet(
                os.path.join(args.tables, f"{args.new}.parquet")
            )
            compare = args.compare.split(",") if args.compare else None
            rows = [
                r.asDict()
                for r in snapshot_diff(
                    old, new, args.key.split(","), compare
                ).orderBy("metric").collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for r in rows:
                    print(f"{r['metric']:30s} {r['n_rows']}")
            return 0
        if args.cmd == "audit":
            from .plans.report import Report, exit_code_for

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            if args.kind == "consistency":
                from .operators.cluster import decision_consistency

                if not args.decisions:
                    print("--kind consistency requires --decisions")
                    return 2
                decided = spark.read.parquet(
                    os.path.join(args.tables, f"{args.decisions}.parquet")
                )
                rep = decision_consistency(
                    df, decided, id_col=args.id_col,
                    decision_col=args.decision_col,
                    drop_value=args.drop_value,
                ).orderBy("component")
                rows = [r.asDict() for r in rep.collect()]
                mixed = [r for r in rows if r["mixed"]]
                if args.format == "json":
                    print(json.dumps(rows, default=str, indent=2))
                else:
                    print(f"{len(rows)} clusters, {len(mixed)} mixed")
                    for r in mixed[:20]:
                        print(f"  [{r['component']}] keep={r['n_keep']} "
                              f"drop={r['n_drop']} "
                              f"({r['first_keep']} / {r['first_drop']})")
                return 1 if (mixed and args.fail_on != "none") else 0
            if args.kind == "audio":
                from .operators.audio_audit import audio_audit, audit_issues

                issues_df = audit_issues(audio_audit(df), table=args.table)
            elif args.kind == "pii":
                from .operators.pii import pii_issues

                issues_df = pii_issues(df, table=args.table)
            elif args.kind == "loops":
                from .operators.audio_loop import loop_issues, loop_scan

                issues_df = loop_issues(loop_scan(df), table=args.table)
            elif args.kind == "reverb":
                from .operators.audio_reverb import (
                    reverb_flags,
                    reverb_issues,
                )

                issues_df = reverb_issues(reverb_flags(df), table=args.table)
            elif args.kind == "stereo":
                from .operators.audio_stereo import (
                    stereo_flags,
                    stereo_issues,
                )

                issues_df = stereo_issues(stereo_flags(df), table=args.table)
            elif args.kind == "flutter":
                from .operators.audio_flutter import (
                    flutter_flags,
                    flutter_issues,
                )

                issues_df = flutter_issues(
                    flutter_flags(df), table=args.table
                )
            elif args.kind == "clicks":
                from .operators.audio_clicks import (
                    click_flags,
                    click_issues,
                )

                issues_df = click_issues(click_flags(df), table=args.table)
            elif args.kind == "truepeak":
                from .operators.audio_truepeak import (
                    truepeak_flags,
                    truepeak_issues,
                )

                issues_df = truepeak_issues(
                    truepeak_flags(df), table=args.table
                )
            elif args.kind == "musicspeech":
                from .operators.audio_musicspeech import (
                    musicspeech_issues,
                    musicspeech_labels,
                )

                issues_df = musicspeech_issues(
                    musicspeech_labels(df), table=args.table
                )
            elif args.kind == "lra":
                from .operators.audio_lra import lra_flags, lra_issues

                issues_df = lra_issues(lra_flags(df), table=args.table)
            elif args.kind == "halluc":
                from .operators.audio_halluc import halluc_flags, halluc_issues

                issues_df = halluc_issues(halluc_flags(df), table=args.table)
            elif args.kind == "watermark":
                from .operators.audio_watermark import (
                    watermark_flags,
                    watermark_issues,
                )

                issues_df = watermark_issues(
                    watermark_flags(df), table=args.table
                )
            elif args.kind == "turns":
                from .operators.audio_turns import turn_flags, turn_issues

                issues_df = turn_issues(turn_flags(df), table=args.table)
            elif args.kind == "voices":
                from .operators.audio_diarize import (
                    clip_voices,
                    multispeaker_flags,
                    voices_issues,
                )

                issues_df = voices_issues(
                    multispeaker_flags(clip_voices(df)), table=args.table
                )
            elif args.kind == "compress":
                from .operators.compress import (
                    compression_flags,
                    compression_issues,
                )

                issues_df = compression_issues(
                    compression_flags(df, id_col=df.columns[0]),
                    table=args.table,
                )
            elif args.kind == "entropy":
                from .operators.entropy import char_entropy_flags, entropy_issues

                issues_df = entropy_issues(
                    char_entropy_flags(df, id_col=df.columns[0]),
                    table=args.table,
                )
            elif args.kind == "lines":
                from .operators.line_filter import line_issues, line_stats

                issues_df = line_issues(
                    line_stats(df, id_col=df.columns[0]), table=args.table
                )
            elif args.kind == "normalize":
                from .operators.text_normalize import (
                    normalize_issues,
                    normalize_stats,
                )

                issues_df = normalize_issues(
                    normalize_stats(df), table=args.table
                )
            elif args.kind == "boilerplate":
                from pyspark.sql import functions as F2

                from .operators.audio_boilerplate import audio_boilerplate

                mass = audio_boilerplate(df)
                wide = mass.agg(
                    F2.count(F2.lit(1)).alias("total"),
                    F2.count(F2.when(F2.col("boilerplate_heavy"), 1))
                    .alias("n"),
                )
                issues_df = wide.select(
                    F2.lit(args.table).alias("table"),
                    F2.lit("bytes").alias("column"),
                    F2.lit("audio_boilerplate").alias("issue_type"),
                    F2.col("n").alias("count"),
                    F2.col("total").alias("total"),
                    F2.when(F2.col("total") > 0,
                            F2.col("n") * 100.0 / F2.col("total"))
                    .otherwise(F2.lit(0.0)).cast("double").alias("percent"),
                    F2.when(F2.col("n") > 0, F2.lit("warning"))
                    .otherwise(F2.lit("info")).alias("severity"),
                    F2.lit("clip dominated by cross-corpus shared audio "
                           "(intro/jingle)").alias("description"),
                )
            elif args.kind == "quantization":
                from pyspark.sql import functions as F2

                from .operators.audio_quantization import (
                    clip_quantization,
                    quantization_flags,
                )

                flags = quantization_flags(clip_quantization(df))
                wide = flags.agg(
                    F2.count(F2.lit(1)).alias("total"),
                    F2.count(F2.when(F2.col("upconverted"), 1)).alias("n"),
                )
                issues_df = wide.select(
                    F2.lit(args.table).alias("table"),
                    F2.lit("bytes").alias("column"),
                    F2.lit("audio_upconverted").alias("issue_type"),
                    F2.col("n").alias("count"),
                    F2.col("total").alias("total"),
                    F2.when(F2.col("total") > 0,
                            F2.col("n") * 100.0 / F2.col("total"))
                    .otherwise(F2.lit(0.0)).cast("double").alias("percent"),
                    F2.when(F2.col("n") > 0, F2.lit("warning"))
                    .otherwise(F2.lit("info")).alias("severity"),
                    F2.lit("16-bit container, 8-bit or mu-law source "
                           "lattice (upconverted audio)").alias("description"),
                )
            elif args.kind == "labels":
                from .operators.audio_dedup import (
                    clip_fingerprints,
                    fingerprint_near_dup,
                )
                from .operators.label_noise import (
                    label_issues,
                    transcript_mismatch,
                )

                pairs = fingerprint_near_dup(clip_fingerprints(df))
                issues_df = label_issues(
                    transcript_mismatch(pairs, df), table=args.table
                )
            else:
                from .operators.text_audit import text_audit_issues

                issues_df = text_audit_issues(
                    df, table=args.table,
                    min_words=args.min_words, max_words=args.max_words,
                )
            rows = [r.asDict() for r in issues_df.collect()]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for r in rows:
                    print(
                        f"[{r['severity']:8s}] {r['table']}.{r['column']} "
                        f"{r['issue_type']}: {r['count']}/{r['total']} "
                        f"({r['percent']:.2f}%) — {r['description']}"
                    )
            rep = Report("1.0", "spark", [
                {"severity": r["severity"]} for r in rows if r["count"] > 0
            ])
            return exit_code_for(rep, fail_on=args.fail_on)
        if args.cmd == "drift":
            from .operators.drift import drift_report

            old = spark.read.parquet(
                os.path.join(args.tables, f"{args.old}.parquet")
            )
            new = spark.read.parquet(
                os.path.join(args.tables, f"{args.new}.parquet")
            )
            compare = args.compare.split(",") if args.compare else None
            by = args.by.split(",") if args.by else []
            rows = [
                r.asDict()
                for r in drift_report(
                    old, new, args.key.split(","), compare,
                    by=by, approx=args.approx,
                ).orderBy(*by, "column").collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for r in rows:
                    grp = "".join(f"[{r[b]}] " for b in by)
                    print(
                        f"{grp}{r['column']:20s} changed {r['n_changed']}"
                        f"/{r['n_matched']} ({r['chg_rate']:.2%}) "
                        f"nulls {r['null_old']}→{r['null_new']} "
                        f"distinct {r['distinct_old']}→{r['distinct_new']}"
                        + (
                            f" mean {r['mean_old']:.4g}→{r['mean_new']:.4g}"
                            if r["mean_old"] is not None
                            and r["mean_new"] is not None
                            else ""
                        )
                    )
            return 0
        if args.cmd == "dedup":
            from pyspark.sql import functions as F

            from .operators.cluster import cluster_members

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            if args.method == "fingerprint":
                from .operators.audio_dedup import (
                    clip_fingerprints,
                    fingerprint_near_dup,
                )

                pairs = fingerprint_near_dup(clip_fingerprints(df)).select(
                    "id_a", "id_b")
            elif args.method == "landmark":
                from .operators.audio_dedup import (
                    clip_landmarks,
                    landmark_match,
                )

                pairs = landmark_match(clip_landmarks(df)).select(
                    "id_a", "id_b")
            elif args.method == "channel":
                from .operators.audio_channel import (
                    channel_pairs,
                    clip_channel_profile,
                )

                pairs = channel_pairs(clip_channel_profile(df)).select(
                    "id_a", "id_b")
            elif args.method == "voice":
                from .operators.audio_voice import (
                    clip_voice_profile,
                    voice_pairs,
                )

                pairs = voice_pairs(clip_voice_profile(df)).select(
                    "id_a", "id_b")
            elif args.method == "speed":
                from .operators.audio_speed import (
                    clip_profiles,
                    speed_dup_confirm,
                    speed_dup_pairs,
                )

                pairs = (
                    speed_dup_confirm(df, speed_dup_pairs(clip_profiles(df)))
                    .filter(F.col("confirmed"))
                    .select("id_a", "id_b")
                )
            else:
                from .operators.audio_pitch import (
                    clip_profiles,
                    pitch_dup_confirm,
                    pitch_dup_pairs,
                )

                pairs = (
                    pitch_dup_confirm(df, pitch_dup_pairs(clip_profiles(df)))
                    .filter(F.col("confirmed"))
                    .select("id_a", "id_b")
                )
            pairs = pairs.persist()
            n_pairs = pairs.count()
            members = cluster_members(pairs, "id_a", "id_b")
            comps = (
                members.groupBy("component")
                .agg(F.count(F.lit(1)).alias("size"))
                .orderBy(F.col("size").desc(), "component")
            )
            top = [r.asDict() for r in comps.limit(args.top).collect()]
            n_total = df.count()
            n_members = members.count()
            n_clusters = comps.count()
            summary = {
                "method": args.method,
                "n_clips": n_total,
                "n_pairs": n_pairs,
                "n_clustered_clips": n_members,
                "n_clusters": n_clusters,
                "dup_frac": round(
                    (n_members - n_clusters) / n_total, 6
                ) if n_total else 0.0,
                "top_clusters": top,
            }
            if args.format == "json":
                print(json.dumps(summary, indent=2))
            else:
                print(
                    f"{args.method}: {n_pairs} pairs, {n_clusters} clusters "
                    f"over {n_members} clips ({n_total} total); removable "
                    f"duplicates: {n_members - n_clusters}"
                )
                for r in top:
                    print(f"  cluster {r['component']}: {r['size']} clips")
            return 0
        if args.cmd == "manifest":
            from pyspark.sql import functions as F

            from .operators.audio_identity import identity_split
            from .pipeline import gate

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            decided = gate(df).select("clip_id", "decision", "lang_pred")
            assigned = identity_split(
                df, val_frac=args.val_frac, seed=args.seed
            ).select("clip_id", "split", "component")
            mani = (
                df.select("clip_id", "dur_ms")
                .join(decided, "clip_id")
                .join(assigned, "clip_id")
                .withColumn(
                    "train_ready",
                    (F.col("decision") == "keep")
                    & (F.col("split") == "train"),
                )
                .persist()
            )
            if args.out:
                mani.orderBy("clip_id").write.mode("overwrite").parquet(
                    args.out
                )
            stats = {
                f"{r['split']}/{r['decision']}": {
                    "n_clips": r["n"],
                    "hours": round(r["ms"] / 3.6e6, 3),
                }
                for r in mani.groupBy("split", "decision").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("dur_ms").alias("ms"),
                ).collect()
            }
            ready = mani.filter("train_ready").agg(
                F.count(F.lit(1)).alias("n"), F.sum("dur_ms").alias("ms")
            ).collect()[0]
            summary = {
                "train_ready_clips": ready["n"],
                "train_ready_hours": round((ready["ms"] or 0) / 3.6e6, 3),
                "cells": stats,
            }
            if args.eval_cap_ms:
                from .operators.sampling import eval_manifest

                em = eval_manifest(
                    mani, args.eval_cap_ms, seed=args.eval_seed
                ).persist()
                if args.eval_out:
                    em.orderBy("clip_id").write.mode("overwrite").parquet(
                        args.eval_out
                    )
                sel_ms = F.when(
                    F.col("in_eval"), F.col("dur_ms").cast("long")
                ).otherwise(F.lit(0))
                summary["eval"] = {
                    r["lang_pred"]: {
                        "candidates": r["nc"], "selected": r["ns"],
                        "eval_hours": round(r["ems"] / 3.6e6, 3),
                        "capped": bool(r["ns"] < r["nc"]),
                    }
                    for r in em.groupBy("lang_pred").agg(
                        F.count(F.lit(1)).alias("nc"),
                        F.sum(F.col("in_eval").cast("long")).alias("ns"),
                        F.sum(sel_ms).alias("ems"),
                    ).collect()
                }
                em.unpersist()
            if args.format == "json":
                print(json.dumps(summary, indent=2))
            else:
                print(
                    f"train-ready: {summary['train_ready_clips']} clips "
                    f"({summary['train_ready_hours']} h)"
                )
                for cell in sorted(stats):
                    s = stats[cell]
                    print(f"  {cell}: {s['n_clips']} clips ({s['hours']} h)")
                for lang, e in sorted(summary.get("eval", {}).items()):
                    print(
                        f"  eval[{lang}]: {e['selected']}/{e['candidates']} "
                        f"clips ({e['eval_hours']} h)"
                        + (" [capped]" if e["capped"] else "")
                    )
            mani.unpersist()
            return 0
        if args.cmd == "augment":
            from .functions.augment import DEFAULT_SPECS
            from .operators.audio_augment import augment_clips

            specs = DEFAULT_SPECS
            if args.specs:
                wanted = set(args.specs.split(","))
                unknown = wanted - {n for n, _ in DEFAULT_SPECS}
                if unknown:
                    print(f"augment: unknown specs {sorted(unknown)}",
                          file=sys.stderr)
                    return 2
                specs = tuple(
                    (n, p) for n, p in DEFAULT_SPECS if n in wanted
                )
            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            aug = augment_clips(df, specs=specs)
            aug.write.mode("overwrite").parquet(args.output)
            got = spark.read.parquet(args.output)
            from pyspark.sql import functions as F

            counts = {
                r["aug_name"]: r["n"]
                for r in got.groupBy("aug_name").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            print(json.dumps({
                "n_augmented": sum(counts.values()),
                "per_spec": counts,
            }))
            return 0
        if args.cmd == "split":
            from pyspark.sql import functions as F

            from .operators.audio_identity import (
                identity_split,
                split_from_features,
            )

            if args.features:
                feats = spark.read.parquet(
                    os.path.join(args.features, "identity")
                )
                assigned = split_from_features(
                    feats, val_frac=args.val_frac, seed=args.seed
                ).persist()
            else:
                if not (args.tables and args.table):
                    print("split: need --features or --tables/--table",
                          file=sys.stderr)
                    return 2
                df = spark.read.parquet(
                    os.path.join(args.tables, f"{args.table}.parquet")
                )
                assigned = identity_split(
                    df, val_frac=args.val_frac, seed=args.seed
                ).persist()
            if args.out:
                assigned.write.mode("overwrite").parquet(args.out)
            stats = {
                r["split"]: {
                    "n_clips": r["n"],
                    "n_components": r["n_comp"],
                    "max_cluster": r["mx"],
                }
                for r in assigned.groupBy("split").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("component").alias("n_comp"),
                    F.max("cluster_size").alias("mx"),
                ).collect()
            }
            summary = {
                "val_frac": args.val_frac,
                "seed": args.seed,
                "splits": stats,
            }
            if args.format == "json":
                print(json.dumps(summary, indent=2))
            else:
                for split in sorted(stats):
                    s = stats[split]
                    print(
                        f"{split}: {s['n_clips']} clips in "
                        f"{s['n_components']} components "
                        f"(largest cluster {s['max_cluster']})"
                    )
            assigned.unpersist()
            return 0
        if args.cmd == "skew":
            from .operators.sampling import skew_audit

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            rows = [
                r.asDict()
                for r in skew_audit(
                    df, args.key.split(","), top_n=args.top
                ).collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for r in rows:
                    keyval = ",".join(
                        str(r[k]) for k in args.key.split(",")
                    )
                    print(
                        f"{r['rank']:3d}. {keyval}: {r['cnt']} rows "
                        f"({100 * r['share']:.2f}%, "
                        f"{r['ratio_to_mean']:.2f}x mean)"
                    )
            return 0
        if args.cmd == "search":
            from .operators.retrieval import bm25_topk

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            queries = {f"q{i + 1}": q for i, q in enumerate(args.query)}
            rows = [
                r.asDict()
                for r in bm25_topk(
                    df, queries, k=args.top,
                    id_col=args.id_col, text_col=args.text_col,
                ).collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                for q_id in sorted(queries):
                    print(f"{q_id}: {queries[q_id]!r}")
                    for r in rows:
                        if r["q_id"] == q_id:
                            print(
                                f"  {r['rank']:3d}. {r[args.id_col]} "
                                f"(score_fx {r['score_fx']})"
                            )
            return 0
        if args.cmd == "terms":
            from .operators.retrieval import tfidf_top_terms

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            rows = [
                r.asDict()
                for r in tfidf_top_terms(
                    df, group_col=args.by, top=args.top,
                    text_col=args.text_col,
                ).collect()
            ]
            if args.format == "json":
                print(json.dumps(rows, indent=2))
            else:
                cur = None
                for r in rows:
                    if r[args.by] != cur:
                        cur = r[args.by]
                        print(f"{args.by}={cur}:")
                    print(
                        f"  {r['rank']}. {r['term']} (tf {r['tf']}, "
                        f"score_fx {r['score_fx']})"
                    )
            return 0
        if args.cmd == "classify":
            from .operators.quality_filters import gopher_flags
            from .operators.quality_model import (
                classifier_calibration,
                classifier_report,
                fit_quality_weights,
            )

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            flagged = gopher_flags(df, text_col=args.text_col).persist()
            flagged.count()
            w = fit_quality_weights(
                flagged, "gopher_pass", sample_n=args.sample,
                id_col=args.id_col, text_col=args.text_col,
            )
            report = {
                r["metric"]: r["value"]
                for r in classifier_report(
                    flagged, "gopher_pass", w, text_col=args.text_col
                ).collect()
            }
            cal = []
            if args.buckets > 0:
                cal = [
                    r.asDict()
                    for r in classifier_calibration(
                        flagged, "gopher_pass", w, n_buckets=args.buckets,
                        id_col=args.id_col, text_col=args.text_col,
                    ).collect()
                ]
            flagged.unpersist()
            if args.format == "json":
                print(json.dumps({"report": report, "calibration": cal},
                                 indent=2))
            else:
                for k in sorted(report):
                    print(f"{k}: {report[k]}")
                acc = (report["tp"] + report["tn"]) / report["n"]
                print(f"accuracy: {acc:.4f}")
                for r in cal:
                    print(
                        f"bucket {r['bucket']:2d}: n={r['n_docs']} "
                        f"pass_rate={r['pass_rate']:.4f} "
                        f"scores [{r['min_score']:.4f}, {r['max_score']:.4f}]"
                    )
            return 0
        if args.cmd == "ppl":
            from pyspark.sql import functions as F2

            from .operators.lm import LN_SCALE, lm_perplexity

            df = spark.read.parquet(
                os.path.join(args.tables, f"{args.table}.parquet")
            )
            out = lm_perplexity(
                df, id_col=args.id_col, text_col=args.text_col,
                holdout_mod=args.holdout_mod, min_count=args.min_count,
                ppl_threshold=args.threshold,
            ).persist()
            n_held = out.count()
            agg = out.agg(
                F2.count(F2.when(F2.col("high_ppl"), 1)).alias("flagged"),
                F2.coalesce(F2.sum("oov_bigrams"), F2.lit(0)).alias("oov"),
            ).collect()[0]
            top = (
                out.where(F2.col("n_bigrams") > 0)
                .withColumn(
                    "nats",
                    F2.col("nll_fx") / F2.col("n_bigrams") / F2.lit(LN_SCALE),
                )
                .orderBy(F2.desc("nats"), F2.col(args.id_col))
                .limit(args.top)
                .collect()
            )
            out.unpersist()
            summary = {
                "held_out_docs": n_held,
                "high_ppl": int(agg["flagged"]),
                "oov_bigrams": int(agg["oov"]),
                "threshold_ppl": args.threshold,
            }
            import math as _m

            if args.format == "json":
                summary["top"] = [
                    {args.id_col: r[args.id_col],
                     "ppl": _m.exp(r["nats"]),
                     "n_bigrams": r["n_bigrams"],
                     "oov_bigrams": r["oov_bigrams"]}
                    for r in top
                ]
                print(json.dumps(summary, indent=2))
            else:
                for k, v in summary.items():
                    print(f"{k}: {v}")
                for r in top:
                    print(
                        f"  {r[args.id_col]}: ppl={_m.exp(r['nats']):.1f} "
                        f"bigrams={r['n_bigrams']} oov={r['oov_bigrams']}"
                    )
            return 0
        return 2
    except DataQualityError as e:
        # typed error = "the check never ran" — exit 3, distinct from the
        # 1/2 fail_on policy codes (ref cli_clean.py:109-121 semantics)
        print(f"Error: {e}", file=sys.stderr)
        return CLI_ERROR_EXIT
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
