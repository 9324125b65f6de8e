"""J3 repair-transform tests: golden outcomes mirroring the reference's
critical-issue fixer (/root/reference/fix_critical_issues.py) on a seeded
music fixture."""

from __future__ import annotations

import pytest

from data_quality_spark.operators.repairs import (
    dedup_isrc_values,
    repair_orphans_with_placeholders,
    synthesize_missing_isrcs,
)
from data_quality_spark.operators.scans import scan_orphans


@pytest.fixture(scope="module")
def songs(spark):
    return spark.createDataFrame(
        [
            (1, "US-AAA-92-00000", 1),
            (2, "US-AAA-92-00000", 1),   # dup group member 2
            (3, "US-AAA-92-00000", 99),  # dup group member 3 + orphan artist
            (4, None, 1),                # missing isrc
            (5, "US-BBB-92-00007", 77),  # orphan artist
        ],
        "id long, isrc string, artist_id long",
    )


@pytest.fixture(scope="module")
def artists(spark):
    return spark.createDataFrame([(1, "Radiohead")], "id long, name string")


def test_synthesize_missing_isrcs(spark, songs):
    fixed = {r.id: r.isrc for r in synthesize_missing_isrcs(songs).collect()}
    assert fixed[4] == "USRC2400004"   # ref format USRC24%05d
    assert fixed[1] == "US-AAA-92-00000"  # non-null untouched


def test_dedup_isrc_values(spark, songs):
    fixed = {r.id: r.isrc for r in dedup_isrc_values(songs).collect()}
    # first id keeps the original; i-th gets last-2-digits = i (ref :117-127)
    assert fixed[1] == "US-AAA-92-00000"
    assert fixed[2] == "US-AAA-92-00000"[:-2] + "01"
    assert fixed[3] == "US-AAA-92-00000"[:-2] + "02"
    assert fixed[4] is None            # NULLs untouched by the dedup pass
    assert fixed[5] == "US-BBB-92-00007"


def test_repair_orphans_then_rescan_clean(spark, songs, artists):
    repaired = repair_orphans_with_placeholders(
        songs, artists, "artist_id", "id", "name"
    )
    rows = {r.id: r.name for r in repaired.collect()}
    assert rows[1] == "Radiohead"
    assert rows[99] == "Unknown Artist 99" and rows[77] == "Unknown Artist 77"
    assert len(rows) == 3
    # post-repair orphan scan is clean (zero issues emitted)
    issues = scan_orphans(
        {"songs": songs, "artists": repaired},
        {"songs": [("artist_id", "artists", "id")]},
    ).collect()
    assert issues == []


def test_full_repair_chain(spark, songs, artists):
    """synthesize → dedup (the reference's fixer order) leaves a unique,
    null-free isrc column."""
    fixed = dedup_isrc_values(synthesize_missing_isrcs(songs))
    vals = [r.isrc for r in fixed.collect()]
    assert None not in vals
    assert len(set(vals)) == len(vals)
