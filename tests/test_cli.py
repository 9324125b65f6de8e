"""CLI tests: check/gate/completeness commands and the reference's exit-code
policy (deployment_gate.py:168-184 / cli_clean.py:109-117 semantics)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_quality_spark.plans.report import HealthReport, Report, exit_code_for


def test_exit_code_policy():
    crit = Report("1.0", "s", [{"severity": "critical"}])
    warn = Report("1.0", "s", [{"severity": "warning"}])
    clean = Report("1.0", "s", [])
    assert exit_code_for(crit) == 2
    assert exit_code_for(warn) == 0                      # default fail_on=critical
    assert exit_code_for(warn, strict=True) == 1
    assert exit_code_for(warn, fail_on="warning") == 1
    assert exit_code_for(crit, fail_on="none") == 0
    assert exit_code_for(clean, strict=True) == 0
    hr = HealthReport(False, 1, {"critical": 1}, 1.0)
    assert exit_code_for(hr) == 2


@pytest.mark.slow
def test_cli_check_and_completeness(spark, tmp_path, capsys, monkeypatch):
    # spark fixture keeps the session; cli.get_spark returns the same active
    # session via getOrCreate, and we stop main() from killing it
    import data_quality_spark.cli as cli

    monkeypatch.setattr(
        "pyspark.sql.SparkSession.stop", lambda self: None
    )
    tables = tmp_path / "tables"
    tables.mkdir()
    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, None), (3, None)], "user_id long, email string"
    )
    df.coalesce(1).write.parquet(str(tables / "users.parquet"))

    out_file = tmp_path / "report.json"
    code = cli.main(
        ["check", "--tables", str(tables), "--format", "json",
         "--fail-on", "warning", "--output", str(out_file)]
    )
    captured = capsys.readouterr().out
    payload = json.loads(out_file.read_text())
    assert any(i["issue_type"] == "nulls" for i in payload["issues"])
    assert "users" in captured
    # 'email' is scanned (P1 name pattern) but is not in the narrower
    # id/key/isrc severity list → 66% nulls ⇒ warning ⇒ exit 1 under
    # fail_on=warning (ref null-severity law, quality_scanner.py:572-585)
    assert code == 1

    code2 = cli.main(["completeness", "--tables", str(tables)])
    out2 = capsys.readouterr().out
    assert code2 == 0 and "DATABASE:" in out2


@pytest.mark.slow
def test_cli_gate_roundtrip(spark, tmp_path, capsys, monkeypatch):
    import data_quality_spark.cli as cli
    from data_quality_spark.runner import write_clips
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    bronze = str(tmp_path / "bronze")
    out = str(tmp_path / "out")
    write_clips(spark, generate_clips(100, seed=13), bronze)

    code = cli.main(["gate", "--input", bronze, "--output", out])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert code == 0 and res["completed"] and res["rows_in"] == 100

    # second run: everything done → zero rows reprocessed
    code2 = cli.main(["gate", "--input", bronze, "--output", out])
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert code2 == 0 and res2["rows_in"] == 0 and res2["skipped"] == 7


@pytest.mark.slow
def test_cli_parity_subcommands(spark, tmp_path, capsys, monkeypatch):
    """Reference CLI parity (cli.py:148-448, cli_clean.py:124): nulls /
    orphans / analyze / suggest / schema as first-class commands."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    # >10 rows so the ≤2-distinct binary probe engages (advisor n>10 guard)
    users = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"u{i}@x.com",
          "active" if i % 2 == 0 else "inactive") for i in range(12)],
        "user_id long, email string, status string",
    )
    users.coalesce(1).write.parquet(str(tables / "users.parquet"))
    posts = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 99)], "post_id long, user_id long"
    )
    posts.coalesce(1).write.parquet(str(tables / "posts.parquet"))

    # nulls (ref cli.py:148-179)
    assert cli.main(["nulls", "--tables", str(tables)]) == 0
    out = capsys.readouterr().out
    assert "users.email nulls" in out

    # orphans with a declared FK (ref cli.py:182-213)
    assert cli.main(
        ["orphans", "--tables", str(tables),
         "--fk", "posts.user_id=users.user_id", "--format", "json"]
    ) == 0
    issues = json.loads(capsys.readouterr().out)
    assert issues[0]["issue_type"] == "orphan" and issues[0]["count"] == 1

    # orphans via the *_id naming heuristic: posts.user_id → users table?
    # 'user'/'users' both exist as stems only if table named so — declared
    # case above is the contract; heuristic path just must not crash
    assert cli.main(["orphans", "--tables", str(tables)]) == 0
    capsys.readouterr()

    # analyze (+ --generate-sql DDL, ref cli.py:215-348)
    assert cli.main(
        ["analyze", "--tables", str(tables), "--table", "users",
         "--generate-sql"]
    ) == 0
    out = capsys.readouterr().out
    assert "Natural Keys" in out and "user_id" in out
    # status is an exact binary pair (active/inactive) → boolean suggestion
    assert "status" in out and "ALTER TABLE users ADD COLUMNS (is_active" in out

    # suggest (ref cli.py:351-427): email column → medium-priority layout rec
    assert cli.main(
        ["suggest", "--tables", str(tables), "--pattern", "users",
         "--format", "json"]
    ) == 0
    recs = json.loads(capsys.readouterr().out)
    assert any(r["type"] == "indexing" and "email" in r["description"]
               for r in recs)
    assert all(r["sql_example"].rstrip().endswith(";") for r in recs)

    # schema: pure JSON-Schema dump, no Spark needed (ref cli_clean.py:124)
    assert cli.main(["schema"]) == 0
    schema = json.loads(capsys.readouterr().out)
    assert schema["title"] == "DataQualityReport"
    assert schema["properties"]["issues"]["items"]["required"] == [
        "table", "issue_type", "count", "severity"
    ]


def test_cli_sample_and_skew(spark, tmp_path, capsys, monkeypatch):
    """sample/skew subcommands: deterministic membership (same seed → same
    rows across invocations) and the skew relation's text/json renderings."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [(i, "hot" if i % 10 else "cold") for i in range(200)]
    spark.createDataFrame(rows, "row_id long, kind string").coalesce(
        1
    ).write.parquet(str(tables / "events.parquet"))

    # fraction sample → deterministic count, repeatable
    args = ["sample", "--tables", str(tables), "--table", "events",
            "--id-col", "row_id", "--fraction", "0.25", "--seed", "3"]
    assert cli.main(args) == 0
    first = capsys.readouterr().out
    assert cli.main(args) == 0
    assert capsys.readouterr().out == first
    n = int(first.split()[1])
    assert 20 <= n <= 80  # ~50 expected of 200

    # capped sample written to parquet: exactly cap rows for the big key
    out_dir = tmp_path / "sampled"
    assert cli.main(
        ["sample", "--tables", str(tables), "--table", "events",
         "--id-col", "row_id", "--key", "kind", "--cap", "5",
         "--output", str(out_dir)]
    ) == 0
    capsys.readouterr()
    got = spark.read.parquet(str(out_dir))
    counts = {r["kind"]: r["n"] for r in
              got.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts == {"hot": 5, "cold": 5}

    # skew audit: 'hot' is 90% of rows → rank 1, ratio ~1.8x over 2 keys
    assert cli.main(
        ["skew", "--tables", str(tables), "--table", "events",
         "--key", "kind", "--format", "json"]
    ) == 0
    recs = json.loads(capsys.readouterr().out)
    assert recs[0]["kind"] == "hot" and recs[0]["rank"] == 1
    assert abs(recs[0]["share"] - 0.9) < 1e-9
    assert cli.main(
        ["skew", "--tables", str(tables), "--table", "events",
         "--key", "kind"]
    ) == 0
    text = capsys.readouterr().out
    assert "hot" in text and "x mean" in text


def test_report_ci_formats():
    """C11: the reference CI runner's per-system outputs
    (ref scripts/ci_cd_data_quality.py:153-290)."""
    import json as _json

    from data_quality_spark.plans.report import Report

    issues = [
        {"table": "t", "column": "id", "issue_type": "nulls",
         "severity": "critical", "description": "id has NULL values",
         "count": 5, "total": 100},
        {"table": "t", "column": "code", "issue_type": "duplicate",
         "severity": "warning", "description": "dups", "count": 2, "total": 100},
    ]
    rep = Report(tool_version="x", source="unit", issues=issues)
    gh = rep.render("github")
    assert "CRITICAL ISSUES" in gh and "DEPLOYMENT BLOCKED" in gh
    assert "**t.id**" in gh
    gl = rep.render("gitlab")
    assert gl.startswith("### ") and "DEPLOYMENT BLOCKED" in gl
    slack = _json.loads(rep.render("slack"))
    assert slack["attachments"][0]["color"] == "danger"
    assert "Critical: 1 | Warning: 1" in slack["attachments"][0]["fields"][0]["value"]
    jenkins = rep.render("jenkins")
    assert "CRITICAL ISSUES FOUND" in jenkins and "Total Issues: 2" in jenkins
    clean = Report(tool_version="x", source="unit", issues=[])
    assert "PASSED" in clean.render("github")
    assert _json.loads(clean.render("slack"))["attachments"][0]["color"] == "good"


def test_cli_profile_and_diff(spark, tmp_path, capsys, monkeypatch):
    """profile / diff subcommands over the profiling and snapshot ops."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)],
        "k long, v string, w long",
    )
    old.coalesce(1).write.parquet(str(tables / "t_old.parquet"))
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
        "k long, v string, w long",
    )
    new.coalesce(1).write.parquet(str(tables / "t_new.parquet"))

    assert cli.main(
        ["profile", "--tables", str(tables), "--table", "t_old",
         "--format", "json"]
    ) == 0
    rows = {r["column"]: r for r in json.loads(capsys.readouterr().out)}
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 2
    assert rows["w"]["mean"] == 20.0

    assert cli.main(
        ["diff", "--tables", str(tables), "--old", "t_old",
         "--new", "t_new", "--key", "k", "--format", "json"]
    ) == 0
    metrics = {r["metric"]: r["n_rows"]
               for r in json.loads(capsys.readouterr().out)}
    assert metrics["status:added"] == 1
    assert metrics["status:removed"] == 1
    assert metrics["status:changed"] == 1
    assert metrics["column:v"] == 1

    # text renderings don't crash and carry the headline numbers
    assert cli.main(
        ["profile", "--tables", str(tables), "--table", "t_old"]
    ) == 0
    assert "distinct" in capsys.readouterr().out
    assert cli.main(
        ["diff", "--tables", str(tables), "--old", "t_old",
         "--new", "t_new", "--key", "k"]
    ) == 0
    assert "status:unchanged" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_drift(spark, tmp_path, capsys, monkeypatch):
    """drift subcommand: per-column change rates + profile deltas."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30)],
        "k long, v string, w long",
    )
    old.coalesce(1).write.parquet(str(tables / "t_old.parquet"))
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 25), (4, "d", 40)],
        "k long, v string, w long",
    )
    new.coalesce(1).write.parquet(str(tables / "t_new.parquet"))

    assert cli.main(
        ["drift", "--tables", str(tables), "--old", "t_old",
         "--new", "t_new", "--key", "k", "--format", "json"]
    ) == 0
    rows = {r["column"]: r for r in json.loads(capsys.readouterr().out)}
    assert set(rows) == {"v", "w"}
    assert rows["v"]["n_changed"] == 1 and rows["v"]["n_matched"] == 2
    assert rows["w"]["n_changed"] == 1
    assert rows["w"]["mean_old"] == 20.0 and rows["w"]["mean_new"] == 25.0
    assert rows["v"]["mean_old"] is None
    assert rows["v"]["null_old"] == 1 and rows["v"]["null_new"] == 0

    assert cli.main(
        ["drift", "--tables", str(tables), "--old", "t_old",
         "--new", "t_new", "--key", "k", "--compare", "w"]
    ) == 0
    txt = capsys.readouterr().out
    assert "w" in txt and "changed 1/2" in txt


@pytest.mark.slow
def test_cli_audit(spark, tmp_path, capsys, monkeypatch):
    """audit subcommand: text + audio fused audits with exit-code policy."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    docs = spark.createDataFrame(
        [(1, None, "en"),
         (2, "the quick brown fox jumps over the lazy dog today ok", "en")],
        "doc_id long, text string, lang string",
    )
    docs.coalesce(1).write.parquet(str(tables / "docs.parquet"))
    # null_text is critical → default fail_on=critical exits 2
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--min-words", "5", "--format", "json"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 2
    assert rows["null_text"]["count"] == 1
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--min-words", "5", "--fail-on", "none"]
    ) == 0
    capsys.readouterr()

    pdf = generate_clips(60, seed=3)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(1).write.parquet(
        str(tables / "clips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "clips",
         "--kind", "audio", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    assert "undecodable" in rows and rows["undecodable"]["total"] == 60


def test_cli_audit_loops_and_labels(spark, tmp_path, capsys, monkeypatch):
    """audit --kind loops / labels: the new audio curation audits behind
    the same fail_on exit-code policy."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import (
        make_audio_dup_corpus,
        make_audio_loop_corpus,
    )

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    cols = [f.name for f in CLIPS_SCHEMA.fields]

    loops = make_audio_loop_corpus(120, seed=42)
    spark.createDataFrame(loops[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "loopclips.parquet")
    )
    # seeded loops are critical → default fail_on exits 2
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "loopclips",
         "--kind", "loops", "--format", "json"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 2
    assert rows["looped"]["count"] > 0
    assert rows["looped"]["severity"] == "critical"
    assert rows["looped"]["total"] == len(loops)

    dups = make_audio_dup_corpus(200, seed=42, relabel_every=2)
    spark.createDataFrame(dups[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "dupclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "dupclips",
         "--kind", "labels", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    r = rows["label_mismatch"]
    assert 0 < r["count"] <= r["total"]
    assert r["severity"] == "warning"


def test_cli_audit_boilerplate(spark, tmp_path, capsys, monkeypatch):
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_jingle_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_jingle_corpus(200, seed=42, jingle_every=4)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "jclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "jclips",
         "--kind", "boilerplate", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    r = rows["audio_boilerplate"]
    assert r["total"] == 200 and r["count"] > 10
    assert r["severity"] == "warning"


def test_cli_audit_pii(spark, tmp_path, capsys, monkeypatch):
    """audit --kind pii: checksum-validated PII audit behind the same
    fail_on exit-code policy (valid card is critical → exit 2)."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    docs = spark.createDataFrame(
        [(1, "pay 4111-1111-1111-1111 now"),
         (2, "pay 4111111111111112 now"),
         (3, "clean words only"),
         (4, None)],
        "doc_id long, text string",
    )
    docs.coalesce(1).write.parquet(str(tables / "docs.parquet"))
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--kind", "pii", "--format", "json"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 2  # Luhn-valid card is critical
    assert rows["pii_credit_card"]["count"] == 1
    assert rows["pii_card_near_miss"]["count"] == 1
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "docs",
         "--kind", "pii", "--fail-on", "none"]
    ) == 0
    capsys.readouterr()


def test_cli_audit_reverb(spark, tmp_path, capsys, monkeypatch):
    """audit --kind reverb: seeded RIR corpus flags wet clips (warning →
    exit 0 under default fail_on=critical)."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_reverb_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_reverb_corpus(120, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "rclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "rclips",
         "--kind", "reverb", "--format", "json"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0  # reverberant is warning, default fail_on=critical
    r = rows["reverberant"]
    n_wet = int(pdf["defect"].str.startswith("reverb_").sum())
    assert 0 < r["count"] <= n_wet
    assert r["severity"] == "warning"
    assert r["total"] == len(pdf)
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "rclips",
         "--kind", "reverb", "--fail-on", "warning"]
    ) == 1
    capsys.readouterr()


def test_cli_audit_quantization(spark, tmp_path, capsys, monkeypatch):
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_quantized_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_quantized_corpus(200, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "qclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "qclips",
         "--kind", "quantization", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    r = rows["audio_upconverted"]
    assert r["total"] == 200 and r["count"] > 20
    assert r["severity"] == "warning"


def test_cli_audit_truepeak(spark, tmp_path, capsys, monkeypatch):
    """audit --kind truepeak: seeded inter-sample overs are critical
    (exit 2 under default fail_on=critical)."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_truepeak_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_truepeak_corpus(120, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "tpclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "tpclips",
         "--kind", "truepeak", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    n_over = int(pdf["defect"].isin(["tp_isp", "tp_rail"]).sum())
    n_hot = int((pdf["defect"] == "tp_hot").sum())
    assert rows["true_peak_over"]["count"] == n_over
    assert rows["true_peak_over"]["severity"] == "critical"
    assert rows["true_peak_hot"]["count"] == n_hot
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "tpclips",
         "--kind", "truepeak"]
    ) == 2
    capsys.readouterr()


def test_cli_audit_musicspeech(spark, tmp_path, capsys, monkeypatch):
    """audit --kind musicspeech: seeded chord clips surface as
    music_content (warning)."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_musicspeech_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_musicspeech_corpus(90, seed=5)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "msclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "msclips",
         "--kind", "musicspeech", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    r = rows["music_content"]
    n_chords = int((pdf["defect"] == "music_chord").sum())
    assert 0 < r["count"] <= n_chords + (pdf["defect"] != "music_chord").sum()
    assert r["severity"] == "warning" and r["total"] == 90


def test_cli_dedup_fingerprint(spark, tmp_path, capsys, monkeypatch):
    """dedup --method fingerprint: the re-encode chains collapse into
    clusters; removable-duplicate accounting is exact."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_dup_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_dup_corpus(120, seed=13)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "dupclips.parquet")
    )
    code = cli.main(
        ["dedup", "--tables", str(tables), "--table", "dupclips",
         "--method", "fingerprint", "--format", "json"]
    )
    out = json.loads(capsys.readouterr().out)
    assert code == 0
    n_seeded = int(pdf["clip_id"].str.endswith("_re").sum())
    assert n_seeded > 0
    assert out["n_clips"] == 120 + n_seeded
    assert out["n_pairs"] >= n_seeded  # every seeded re-encode pairs up
    assert out["n_clusters"] >= 1
    assert out["n_clustered_clips"] > out["n_clusters"]
    assert out["top_clusters"][0]["size"] >= 2


def test_cli_search_and_terms(spark, tmp_path, capsys, monkeypatch):
    """search: BM25 ranked hits per query; terms: per-group tf-idf."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [
            (1, "fast hash join wins", "s1"),
            (2, "slow table scan", "s1"),
            (3, "fast fast fast join", "s2"),
            (4, "unrelated words here", "s2"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(str(tables / "docs.parquet"))

    code = cli.main(
        ["search", "--tables", str(tables), "--table", "docs",
         "--query", "fast join", "--top", "3", "--format", "json"]
    )
    rows = json.loads(capsys.readouterr().out)
    assert code == 0
    assert [r["doc_id"] for r in rows][:1] == [3]  # tf=3 'fast' wins
    assert all(r["q_id"] == "q1" for r in rows)
    # only docs 1 and 3 contain any query term
    assert [r["rank"] for r in rows] == [1, 2]
    assert {r["doc_id"] for r in rows} == {1, 3}

    code = cli.main(
        ["terms", "--tables", str(tables), "--table", "docs",
         "--by", "source", "--top", "2", "--format", "json"]
    )
    rows = json.loads(capsys.readouterr().out)
    assert code == 0
    assert {r["source"] for r in rows} == {"s1", "s2"}
    # group-exclusive terms rank; none of them scores zero
    assert all(r["score_fx"] > 0 for r in rows)


def test_cli_classify(spark, tmp_path, capsys, monkeypatch):
    """classify: trains on Gopher labels, prints report + calibration."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [
            (i, ("the and that is " * 20).strip())
            if i % 2 == 0
            else (i, "#### ### ##")
            for i in range(40)
        ],
        "doc_id long, text string",
    ).write.parquet(str(tables / "docs.parquet"))

    code = cli.main(
        ["classify", "--tables", str(tables), "--table", "docs",
         "--sample", "40", "--buckets", "4", "--format", "json"]
    )
    out = json.loads(capsys.readouterr().out)
    assert code == 0
    rep = out["report"]
    assert rep["n"] == 40.0
    assert rep["fp"] == 0.0 and rep["fn"] == 0.0  # separable two-template
    assert len(out["calibration"]) == 4
    assert sum(r["n_docs"] for r in out["calibration"]) == 40


def test_cli_audit_watermark(spark, tmp_path, capsys, monkeypatch):
    """audit --kind watermark: seeded provenance-marked clips surface as
    provenance_watermark (warning); the count equals the per-row law's."""
    import data_quality_spark.cli as cli
    from data_quality_spark.functions import audio as A
    from data_quality_spark.functions.watermark import (
        is_watermarked_from,
        watermark_stats,
    )
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_watermark_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_watermark_corpus(90, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "wmclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "wmclips",
         "--kind", "watermark", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    want = 0
    for _, r in pdf.iterrows():
        try:
            q = A._decode_i16(r["bytes"], r["codec"], r["sr_hz"])
        except (ValueError, TypeError):
            continue
        st = watermark_stats(q)
        want += int(
            is_watermarked_from(st["n_samples"], st["wm_corr"], st["energy"])
        )
    assert want > 0
    assert rows["provenance_watermark"]["count"] == want
    assert rows["provenance_watermark"]["severity"] == "warning"
    assert rows["provenance_watermark"]["total"] == len(pdf)


def test_cli_audit_compress(spark, tmp_path, capsys, monkeypatch):
    """audit --kind compress: seeded spam/garbage docs surface as the two
    compression issue types (warning)."""
    import data_quality_spark.cli as cli
    from data_quality_spark.oracles import compression_inject

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [
        (i, compression_inject(i, f"plain prose document number {i} " * 8))
        for i in range(40)
    ]
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2).write.parquet(
        str(tables / "cdocs.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "cdocs",
         "--kind", "compress", "--format", "json", "--fail-on", "none"]
    )
    out = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    n_spam = sum(1 for i in range(40) if i % 17 == 3)
    n_junk = sum(1 for i in range(40) if i % 17 == 9)
    assert out["compress_repetitive"]["count"] >= n_spam
    assert out["compress_random"]["count"] == n_junk
    assert out["compress_random"]["severity"] == "warning"


def test_cli_audit_entropy(spark, tmp_path, capsys, monkeypatch):
    """audit --kind entropy: seeded flood/garbage docs surface as the two
    entropy issue types (warning)."""
    import base64
    import hashlib

    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    junk = "".join(
        base64.b64encode(
            bytes.fromhex(hashlib.md5(f"{j}#x".encode()).hexdigest())
        ).decode()
        for j in range(10)
    )
    rows = [(i, f"a calm morning walk along the river bank number {i}") for i in range(20)]
    rows += [(100, "lol" * 120), (101, junk)]
    spark.createDataFrame(rows, ["doc_id", "text"]).coalesce(2).write.parquet(
        str(tables / "edocs.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "edocs",
         "--kind", "entropy", "--format", "json", "--fail-on", "none"]
    )
    out = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    assert out["entropy_low"]["count"] == 1
    assert out["entropy_high"]["count"] == 1
    assert out["entropy_low"]["severity"] == "warning"


def test_cli_redact(spark, tmp_path, capsys, monkeypatch):
    """redact: writes the scrub+mute silver table and reports totals."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    pdf = generate_clips(60, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    src = tmp_path / "bronze"
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(src)
    )
    out = tmp_path / "silver"
    code = cli.main(["redact", "--input", str(src), "--output", str(out)])
    rep = json.loads(capsys.readouterr().out)
    assert code == 0
    assert rep["n"] == 60
    assert rep["clips_redacted"] >= 1
    assert rep["muted_samples"] > 0
    red = spark.read.parquet(str(out))
    assert "bytes" in red.columns and "redacted_transcript" in red.columns


def test_cli_audit_turns(spark, tmp_path, capsys, monkeypatch):
    """audit --kind turns: seeded multi-voice clips surface as
    speaker_turns (warning); count equals the per-row law's."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_turns_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_turns_corpus(60, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "tclips.parquet")
    )
    code = cli.main(
        ["audit", "--tables", str(tables), "--table", "tclips",
         "--kind", "turns", "--format", "json", "--fail-on", "none"]
    )
    rows = {r["issue_type"]: r for r in json.loads(capsys.readouterr().out)}
    assert code == 0
    n_seeded = sum(str(d).startswith("turns_") for d in pdf["defect"])
    assert rows["speaker_turns"]["count"] == n_seeded > 0
    assert rows["speaker_turns"]["severity"] == "warning"


def test_cli_ppl(spark, tmp_path, capsys, monkeypatch):
    """ppl: trains on the split, reports held-out scores; an injected
    gibberish doc tops the ranking and trips the flag."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [
        (i, "the cat sat on the mat and the dog sat on the rug")
        for i in range(1, 40)
        if i % 10 != 0
    ]
    rows.append((40, "zq1 zq2 zq3 zq4 zq5 zq6"))  # held (40 % 10 == 0), pure OOV
    rows.append((10, "the cat sat on the mat"))   # held, in-domain
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(tables / "docs.parquet")
    )
    code = cli.main(
        ["ppl", "--tables", str(tables), "--table", "docs",
         "--min-count", "1", "--format", "json", "--top", "2"]
    )
    out = json.loads(capsys.readouterr().out)
    assert code == 0
    assert out["held_out_docs"] == 2
    assert out["high_ppl"] == 1          # the gibberish doc
    assert out["oov_bigrams"] >= 5
    assert out["top"][0]["doc_id"] == 40
    assert out["top"][0]["ppl"] > out["top"][1]["ppl"]


def test_cli_split_and_dedup_identity_methods(
    spark, tmp_path, capsys, monkeypatch
):
    """split subcommand (union-of-axes leakage split) and the dedup
    channel/voice methods over a clips table on disk."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import make_audio_identity_corpus

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = make_audio_identity_corpus(42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "clips.parquet")
    )

    out_dir = tmp_path / "assigned"
    assert cli.main(
        ["split", "--tables", str(tables), "--table", "clips",
         "--val-frac", "0.25", "--seed", "11", "--out", str(out_dir),
         "--format", "json"]
    ) == 0
    summary = json.loads(capsys.readouterr().out)
    stats = summary["splits"]
    assert sum(s["n_clips"] for s in stats.values()) == len(pdf)
    # written assignment never straddles a component
    got = spark.read.parquet(str(out_dir))
    straddle = (
        got.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # same seed → byte-identical rerun
    assert cli.main(
        ["split", "--tables", str(tables), "--table", "clips",
         "--val-frac", "0.25", "--seed", "11", "--format", "json"]
    ) == 0
    assert json.loads(capsys.readouterr().out) == summary

    # dedup --method channel: clusters are recording sessions or larger
    # (voiced clips share rooms; the zero-floor pair has no channel)
    assert cli.main(
        ["dedup", "--tables", str(tables), "--table", "clips",
         "--method", "channel", "--format", "json"]
    ) == 0
    chan = json.loads(capsys.readouterr().out)
    assert chan["n_clusters"] >= 6 and chan["n_pairs"] > 0

    # dedup --method voice: speaker clusters bridge rooms
    assert cli.main(
        ["dedup", "--tables", str(tables), "--table", "clips",
         "--method", "voice", "--format", "json"]
    ) == 0
    voice = json.loads(capsys.readouterr().out)
    assert voice["n_pairs"] > 0
    # speaker 0 recorded two rooms of 3 clips each (+1 re-upload): its
    # voice cluster spans ≥6 clips
    assert max(r["size"] for r in voice["top_clusters"]) >= 6


def test_cli_manifest(spark, tmp_path, capsys, monkeypatch):
    """manifest subcommand: per-cell accounting reconciles with the
    written per-clip relation; train_ready = keep ∧ train."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = generate_clips(120, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "clips.parquet")
    )
    out_dir = tmp_path / "mani"
    assert cli.main(
        ["manifest", "--tables", str(tables), "--table", "clips",
         "--val-frac", "0.25", "--seed", "11", "--out", str(out_dir),
         "--format", "json"]
    ) == 0
    summary = json.loads(capsys.readouterr().out)
    got = spark.read.parquet(str(out_dir))
    assert got.count() == len(pdf)
    n_ready = got.filter(
        (F.col("decision") == "keep") & (F.col("split") == "train")
    ).count()
    assert summary["train_ready_clips"] == n_ready > 0
    assert got.filter(
        F.col("train_ready")
        != ((F.col("decision") == "keep") & (F.col("split") == "train"))
    ).count() == 0
    assert sum(c["n_clips"] for c in summary["cells"].values()) == len(pdf)


def test_cli_card(spark, tmp_path, capsys, monkeypatch):
    """card subcommand: corpus row reconciles with per-lang rows."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [(i, f"text number {i} with several plain words here",
             ["en", "de"][i % 2], "web") for i in range(60)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(str(tables / "docs.parquet"))
    assert cli.main(
        ["card", "--tables", str(tables), "--table", "docs",
         "--format", "json"]
    ) == 0
    card = json.loads(capsys.readouterr().out)
    by = {(r["dim"], r["grp"]): r for r in card}
    assert by[("corpus", "all")]["n_docs"] == 60
    assert by[("lang", "en")]["n_docs"] + by[("lang", "de")]["n_docs"] == 60
    assert by[("source", "web")]["n_docs"] == 60
    # every text distinct
    assert by[("corpus", "all")]["n_unique"] == 60


def test_cli_pack_modes(spark, tmp_path, capsys, monkeypatch):
    """pack subcommand: all three modes run; batches accounting sane;
    --output writes the assignment relation."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    rows = [(i, "tok " * (5 + i % 40), ["en", "de"][i % 2],
             (5 + i % 40) * 4) for i in range(80)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).write.parquet(str(tables / "docs.parquet"))

    assert cli.main(
        ["pack", "--tables", str(tables), "--table", "docs",
         "--mode", "sequences", "--size", "64", "--strata", "lang",
         "--format", "json"]
    ) == 0
    seqs = json.loads(capsys.readouterr().out)
    assert sum(r["n_tokens"] for r in seqs) == sum(5 + i % 40
                                                   for i in range(80))

    assert cli.main(
        ["pack", "--tables", str(tables), "--table", "docs",
         "--mode", "batches", "--size", "16", "--format", "json"]
    ) == 0
    batches = json.loads(capsys.readouterr().out)
    assert sum(r["n_items"] for r in batches) == 80
    assert all(r["pad_waste"] == r["padded_len"] - r["sum_len"]
               for r in batches)

    out_dir = tmp_path / "shards"
    assert cli.main(
        ["pack", "--tables", str(tables), "--table", "docs",
         "--mode", "shards", "--size", "400", "--output", str(out_dir)]
    ) == 0
    got = spark.read.parquet(str(out_dir))
    assert got.count() == 80 and "shard_id" in got.columns


def test_cli_pack_crops(spark, tmp_path, capsys, monkeypatch):
    """pack --mode crops: deterministic window schedule written/printed."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [(f"c{i}", 1000 + 100 * i) for i in range(20)],
        "clip_id string, dur_ms int",
    ).write.parquet(str(tables / "clips.parquet"))
    out_dir = tmp_path / "crops"
    assert cli.main(
        ["pack", "--tables", str(tables), "--table", "clips",
         "--mode", "crops", "--size", "500", "--crops", "3",
         "--epoch", "2", "--seed", "5", "--id-col", "clip_id",
         "--output", str(out_dir)]
    ) == 0
    got = spark.read.parquet(str(out_dir))
    assert got.count() == 60
    joined = got.join(
        spark.read.parquet(str(tables / "clips.parquet")), "clip_id")
    assert joined.filter(
        "start_ms < 0 OR start_ms > dur_ms - win_ms").count() == 0


def test_cli_audit_consistency(spark, tmp_path, capsys, monkeypatch):
    """audit --kind consistency over stored members+decisions tables:
    mixed clusters reported, exit code reflects them."""
    import data_quality_spark.cli as cli

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [("a", "c1", 2), ("b", "c1", 2), ("x", "c9", 2), ("y", "c9", 2)],
        "node string, component string, cluster_size long",
    ).write.parquet(str(tables / "members.parquet"))
    spark.createDataFrame(
        [("a", "keep"), ("b", "drop"), ("x", "keep"), ("y", "keep")],
        "clip_id string, decision string",
    ).write.parquet(str(tables / "decided.parquet"))
    rc = cli.main(
        ["audit", "--tables", str(tables), "--table", "members",
         "--kind", "consistency", "--decisions", "decided",
         "--format", "json"]
    )
    rows = json.loads(capsys.readouterr().out)
    by = {r["component"]: r for r in rows}
    assert by["c1"]["mixed"] and not by["c9"]["mixed"]
    assert rc == 1  # mixed clusters fail by default
    assert cli.main(
        ["audit", "--tables", str(tables), "--table", "members",
         "--kind", "consistency", "--decisions", "decided",
         "--fail-on", "none"]
    ) == 0


@pytest.mark.slow
def test_cli_manifest_eval_cap(spark, tmp_path, capsys, monkeypatch):
    """manifest --eval-cap-ms: the per-language eval coverage reconciles
    with the written per-clip eval relation (selected counts, cap law,
    no train_ready overlap)."""
    import data_quality_spark.cli as cli
    from data_quality_spark.plans.schemas import CLIPS_SCHEMA
    from data_quality_spark.synth import generate_clips

    monkeypatch.setattr("pyspark.sql.SparkSession.stop", lambda self: None)
    tables = tmp_path / "tables"
    tables.mkdir()
    pdf = generate_clips(200, seed=42)
    cols = [f.name for f in CLIPS_SCHEMA.fields]
    spark.createDataFrame(pdf[cols], CLIPS_SCHEMA).coalesce(2).write.parquet(
        str(tables / "clips.parquet")
    )
    eval_out = tmp_path / "eval"
    assert cli.main(
        ["manifest", "--tables", str(tables), "--table", "clips",
         "--val-frac", "0.25", "--seed", "11",
         "--eval-cap-ms", "10000", "--eval-out", str(eval_out),
         "--eval-seed", "3", "--format", "json"]
    ) == 0
    summary = json.loads(capsys.readouterr().out)
    assert "eval" in summary and len(summary["eval"]) > 0
    em = spark.read.parquet(str(eval_out))
    # every eval row is keep ∧ val; coverage numbers reconcile
    assert em.filter(
        (F.col("decision") != "keep") | (F.col("split") != "val")
    ).count() == 0
    got = {
        r["lang_pred"]: (r["nc"], r["ns"])
        for r in em.groupBy("lang_pred").agg(
            F.count(F.lit(1)).alias("nc"),
            F.sum(F.col("in_eval").cast("long")).alias("ns"),
        ).collect()
    }
    for lang, e in summary["eval"].items():
        assert got[lang] == (e["candidates"], e["selected"])
        assert e["capped"] == (e["selected"] < e["candidates"])
