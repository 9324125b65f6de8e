"""Guided wizard drive-through: the reference's interactive_cli.py menu
surface (``interactive_cli.py:119-555``), scripted through the
injectable IO seams — every menu action runs against the seeded music
database from the integration scenario."""

from __future__ import annotations

import io

import pytest

from data_quality_spark.interactive import Wizard
from tests.test_database_source import _seed


@pytest.fixture()
def music_db(tmp_path):
    p = str(tmp_path / "music.db")
    _seed(p, ["INSERT INTO songs VALUES "
              "(5,'Song 5',99,'USRC555','track555')"])
    return p


def _drive(spark, lines):
    out = io.StringIO()
    w = Wizard(spark, in_stream=io.StringIO("".join(
        line + "\n" for line in lines)), out_stream=out)
    code = w.run()
    return code, out.getvalue()


def test_full_drive_through_every_action(spark, music_db, monkeypatch):
    monkeypatch.delenv("DATABASE_URL", raising=False)
    code, out = _drive(spark, [
        "1",                       # health check before connect -> nudge
        "6", f"sqlite:///{music_db}",  # connect
        "1",                       # full health check
        "2", "songs",              # deep dive
        "3",                       # null hunter
        "4",                       # link detective (discovered FK)
        "5",                       # schema doctor
        "7",                       # quick stats
        "q",
    ])
    assert code == 0
    assert "connect to a source first" in out
    assert "connected: sqlite:///" in out and "(2 tables)" in out
    assert "issues (critical" in out
    assert "songs: 5 columns" in out and "fill_percentage" not in out
    assert "isrc" in out                      # null hunter line
    assert "orphaned rows" in out             # link detective found 1
    assert "songs.artist_id: 1 orphaned" in out
    assert "recommendation" in out or "]" in out  # doctor printed recs
    assert "songs: 5 rows" in out             # quick stats

    # menu parity with the reference's option surface
    for needle in ("Full health checkup", "Deep table dive",
                   "Missing data hunter", "Broken link detective",
                   "Schema doctor", "Quick stats"):
        assert needle in out


def test_database_url_autoconnect(spark, music_db, monkeypatch):
    """The reference's DATABASE_URL auto-connect law
    (interactive_cli.py:556-566)."""
    monkeypatch.setenv("DATABASE_URL", f"sqlite:///{music_db}")
    code, out = _drive(spark, ["7", "q"])
    assert code == 0
    assert "connected: sqlite:///" in out
    assert "artists: 3 rows" in out


def test_bad_inputs_are_survivable(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("DATABASE_URL", raising=False)
    code, out = _drive(spark, [
        "z",                      # unknown option
        "6", "sqlite:///nope/missing.db",  # typed-error connect
        "6", "",                  # empty input
        "q",
    ])
    assert code == 0
    assert "unknown option 'z'" in out
    assert "connection failed" in out and "sqlite file not found" in out
    assert "connection unchanged" in out


def test_eof_exits_cleanly(spark, monkeypatch):
    monkeypatch.delenv("DATABASE_URL", raising=False)
    code, out = _drive(spark, [])  # immediate EOF -> default 'q'
    assert code == 0
    assert "bye" in out


def test_parquet_dir_source(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("DATABASE_URL", raising=False)
    tables = tmp_path / "tables"
    tables.mkdir()
    df = spark.createDataFrame(
        [(1, "a@b.com"), (2, None)], "user_id long, email string")
    df.coalesce(1).write.parquet(str(tables / "users.parquet"))
    code, out = _drive(spark, [
        "6", str(tables),
        "3",          # null hunter over parquet source
        "4",          # no FK metadata for parquet dirs
        "q",
    ])
    assert code == 0
    assert "(1 tables)" in out
    assert "users.email: 1 NULLs of 2" in out
    assert "no declared foreign keys" in out
