"""FIXTURES.md Group-A tests: reference-style seeded-defect tables with
golden expected counts, driven through the fused rule compiler and the
medallion checkpoints (mirrors /root/reference/tests/test_quality_scanner.py
seeding style and checkpoints.py rule sets)."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.reference_rules import (
    MedallionBronzeToSilver,
    MedallionSilverToGold,
    emoji_rule,
    garbage_name_rule,
    isrc_format_rule,
)
from data_quality_spark.operators.rules import compile_rules
from data_quality_spark.operators.scans import health_check, scan_orphans


@pytest.fixture(scope="module")
def music_tables(spark):
    artists = spark.createDataFrame(
        [
            (1, "Radiohead", "sp1"),
            (2, "Unknown Artist", None),      # garbage + null spotify_id
            (3, "DJ 🎵 Mix", "sp3"),          # emoji
            (4, "N/A", None),                 # garbage + null
            (5, "My Test Artist", "sp5"),     # garbage via contains('test')
        ],
        "id long, name string, spotify_id string",
    )
    songs = spark.createDataFrame(
        [
            (10, "Creep", 1, 100, "US-AAA-92-00001", "s1", 500),
            (11, "Karma", 1, 100, "US-AAA-92-00001", "s2", 400),   # dup isrc
            (12, "Lost", 99, 100, "bad-isrc", None, 300),          # orphan artist + bad isrc
            (13, "Gone", 1, None, "", "s4", 200),                  # null label; '' isrc out of scope
        ],
        "id long, title string, artist_id long, label_id long, isrc string, spotify_id string, play_count long",
    )
    labels = spark.createDataFrame([(100, "XL")], "id long, name string")
    return artists, songs, labels


def test_orphan_golden_counts(spark, music_tables):
    artists, songs, labels = music_tables
    issues = scan_orphans(
        {"songs": songs, "artists": artists, "labels": labels},
        {"songs": [("artist_id", "artists", "id"), ("label_id", "labels", "id")]},
    ).collect()
    got = {r["column"]: (r["count"], r["total"], r["severity"]) for r in issues}
    # 1 orphan artist_id (99); label_id: one NULL is excluded by the guard
    assert got["artist_id"] == (1, 4, "critical")
    assert "label_id" not in got  # 0 orphans → filtered


def test_composite_fk_orphan_counts(spark, music_tables):
    """Composite-key FK (ref safe_scanners.py:71-79 semantics): plain outer
    join on the AND of pairs, orphan ⇔ all referred cols NULL — a NULL fk
    component counts (no child guard), unlike the single-column scan."""
    _, songs, labels = music_tables
    pairs = songs.selectExpr(
        "id", "artist_id AS a", "label_id AS l"
    )
    parent = spark.createDataFrame(
        [(1, 100), (99, 100)], "pa long, pl long"
    )
    issues = scan_orphans(
        {"songs": pairs, "pairs": parent},
        {"songs": [(("a", "l"), "pairs", ("pa", "pl"))]},
    ).collect()
    assert len(issues) == 1
    r = issues[0]
    # song 13 has (1, NULL): join fails ⇒ counted (reference semantics)
    assert r["column"] == "a,l" and r["count"] == 1 and r["total"] == 4
    assert r["severity"] == "critical"


def test_name_rules_golden_counts(spark, music_tables):
    artists, _, _ = music_tables
    issues = {
        r.issue_type: r
        for r in compile_rules(
            artists, "artists", [emoji_rule("name"), garbage_name_rule("name")]
        ).collect()
    }
    assert issues["emoji_in_name"]["count"] == 1
    assert issues["emoji_in_name"]["severity"] == "critical"  # ref checkpoints.py:440
    # contains-any: "Unknown Artist", "N/A", "My Test Artist" (ref :538-545)
    assert issues["garbage_name"]["count"] == 3
    assert issues["garbage_name"]["total"] == 5       # scope: non-null names


def test_isrc_rule_golden_counts(spark, music_tables):
    _, songs, _ = music_tables
    row = compile_rules(songs, "songs", [isrc_format_rule()]).collect()[0]
    assert row["count"] == 1     # "bad-isrc"; NULL and '' isrc out of scope
    assert row["total"] == 3     # 3 non-null, non-empty isrcs
    assert row["severity"] == "warning"  # ref checkpoints.py:520


def test_health_check_on_music_fixture(spark, music_tables):
    artists, songs, labels = music_tables
    rep = health_check(
        {"artists": artists, "songs": songs, "labels": labels},
        {"songs": [("artist_id", "artists", "id")]},
    )
    kinds = {(i["table"], i["issue_type"]) for i in rep.issues}
    assert ("songs", "orphan") in kinds
    assert ("artists", "nulls") in kinds          # spotify_id nulls (key-ish name)
    assert not rep.all_good


@pytest.fixture(scope="module")
def parsed_table(spark):
    # checkpoint fixture per FIXTURES.md group A / ref checkpoints.py:117-137
    return spark.createDataFrame(
        [
            (1, 0.9, "accept", "v1.2.3", "2026-01-01 00:00:00", "Radiohead", "US-AAA-92-00001"),
            (2, 1.5, "accept", "v1.2.3", "2026-01-01 00:00:00", "DJ 🎵 Mix", "US-AAA-92-00002"),   # conf out of range + emoji
            (None, 0.5, "maybe", "build-7", None, "Unknown Artist", "nope"),                        # null raw_id, bad enum, bad semver, null parsed_at, garbage, bad isrc
            (4, 0.2, "reject", "2.0.0", "2026-01-02 00:00:00", "Test Band", None),
        ],
        "raw_id long, confidence double, decision string, parser_version string, parsed_at string, artist_names string, isrc string",
    )


def test_bronze_checkpoint_golden(spark, parsed_table):
    res = MedallionBronzeToSilver().run(parsed_table, "spotify_parsed")
    got = {i["issue_type"]: i["count"] for i in res.issues}
    assert got == {
        "null_raw_id": 1,
        "null_parsed_at": 1,
        "confidence_range": 1,
        "decision_enum": 1,
        "version_format": 1,
    }
    assert not res.success                 # criticals present ⇒ fail (ref :99)
    assert res.total_records == 4


def test_gold_checkpoint_accept_scope(spark, parsed_table):
    res = MedallionSilverToGold().run(parsed_table, "spotify_parsed")
    got = {i["issue_type"]: (i["count"], i["total"]) for i in res.issues}
    # only the 2 accept rows are in scope; emoji row is one of them
    assert got["emoji_in_name"] == (1, 2)
    assert "garbage_name" not in got       # garbage row is decision='maybe'
    assert "isrc_format" not in got        # both accept isrcs valid
    # artist emoji is CRITICAL (ref checkpoints.py:440) ⇒ gate fails
    assert not res.success


def test_bronze_checkpoint_null_parser_version_fails(spark):
    """All-NULL parser_version must FAIL bronze (ref _check_parser_version
    runs _check_not_null first, critical) — previously it slipped through."""
    df = spark.createDataFrame(
        [(1, 0.5, "accept", None, "2026-01-01")],
        "raw_id long, confidence double, decision string, parser_version string, parsed_at string",
    )
    res = MedallionBronzeToSilver().run(df, "spotify_parsed")
    got = {i["issue_type"]: i["severity"] for i in res.issues}
    assert got["null_parser_version"] == "critical"
    assert not res.success


def test_checkpoint_single_pass(spark):
    """A checkpoint run must scan its input exactly ONCE: total_records
    comes off the fused aggregate's sentinel row, not a second df.count()
    (the r2 verdict's 2×-IO finding).  The accumulator bumps once per row
    per materialization — the old collect()+count() path read 400."""
    from data_quality_spark.operators.gate import BronzeToSilverCheckpoint

    acc = spark.sparkContext.accumulator(0)

    def bump(i):
        acc.add(1)
        return (f"c{i}", bytearray(b"\x00\x01"), 16000, 1000, "pcm16")

    rdd = spark.sparkContext.parallelize(range(200), 4).map(bump)
    df = spark.createDataFrame(
        rdd, "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"
    )
    res = BronzeToSilverCheckpoint().run(df)
    assert res.total_records == 200
    assert res.success and res.issues == []
    assert acc.value == 200


def test_url_format_rule(spark):
    from data_quality_spark.operators.reference_rules import url_format_rule

    df = spark.createDataFrame(
        [
            ("https://example.com/a/b?x=1#frag",),
            ("http://sub.example.co:8080/",),
            ("ftp://example.com",),        # wrong scheme
            ("not a url",),
            (None,),                        # out of scope
        ],
        "homepage string",
    )
    row = compile_rules(df, "sites", [url_format_rule("homepage")]).collect()[0]
    assert row["count"] == 2 and row["total"] == 4
    assert row["severity"] == "warning"
