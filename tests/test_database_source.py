"""Live-database access path: sqlite URL → health scan.

Reproduces the reference's music-database integration scenario
(``/root/reference/tests/test_quality_scanner.py:476-575``): a sqlite
file with seeded null / duplicate / orphan defects, scanned through the
SAME operators the parquet path uses, plus the typed-error exit-3 CLI
law (ref ``cli_clean.py:109-121``).
"""

from __future__ import annotations

import json
import sqlite3

import pytest

from data_quality_spark.exceptions import (
    ResourceError,
    ValidationError,
)
from data_quality_spark.sources.database import (
    load_database,
    load_sqlite,
    parse_database_url,
    sqlite_fk_map,
    sqlite_schema,
    sqlite_tables,
)

REF_DDL = [
    # the reference scenario's DDL, with the FK declared so PRAGMA
    # discovery has something to find (the reference reads FKs from
    # information_schema, quality_scanner.py:421-445)
    """CREATE TABLE artists (
        id INTEGER PRIMARY KEY,
        name TEXT NOT NULL,
        spotify_id TEXT
    )""",
    """CREATE TABLE songs (
        id INTEGER PRIMARY KEY,
        title TEXT NOT NULL,
        artist_id INTEGER REFERENCES artists(id),
        isrc TEXT,
        spotify_id TEXT
    )""",
]

REF_ROWS = [
    "INSERT INTO artists VALUES (1,'Artist 1','spotify123')",
    "INSERT INTO artists VALUES (2,'Artist 2',NULL)",
    "INSERT INTO artists VALUES (3,'Artist 3','spotify456')",
    "INSERT INTO songs VALUES (1,'Song 1',1,'USRC123','track123')",
    "INSERT INTO songs VALUES (2,'Song 2',2,NULL,'track456')",
    "INSERT INTO songs VALUES (3,'Song 3',NULL,'USRC789',NULL)",
    "INSERT INTO songs VALUES (4,'Song 4',1,'USRC123','track789')",
]


def _seed(path, extra_rows=()):
    con = sqlite3.connect(path)
    for stmt in REF_DDL + REF_ROWS + list(extra_rows):
        con.execute(stmt)  # sql-ok: fixed DDL fixture literals
    con.commit()
    con.close()


@pytest.fixture()
def music_db(tmp_path):
    p = str(tmp_path / "music.db")
    _seed(p)
    return p


class TestUrlParsing:
    def test_sqlite_relative_and_absolute(self):
        assert parse_database_url("sqlite:///rel.db") == ("sqlite", "rel.db")
        assert parse_database_url("sqlite:////tmp/a.db") == (
            "sqlite", "/tmp/a.db")
        assert parse_database_url("sqlite+pysqlite:///x.db") == (
            "sqlite", "x.db")

    def test_jdbc_normalization(self):
        assert parse_database_url("mysql://h/db") == (
            "jdbc", "jdbc:mysql://h/db")
        assert parse_database_url("jdbc:postgresql://h/db")[0] == "jdbc"

    def test_rejects_unknown_scheme(self):
        with pytest.raises(ValidationError):
            parse_database_url("mongodb://h/db")
        with pytest.raises(ValidationError):
            parse_database_url("not a url")


class TestSqliteLoad:
    def test_discovery_and_patterns(self, music_db):
        assert sqlite_tables(music_db) == ["artists", "songs"]
        assert sqlite_tables(music_db, ["song%"]) == ["songs"]

    def test_missing_file_is_typed_error(self):
        with pytest.raises(ResourceError):
            sqlite_tables("/nonexistent/path/database.db")

    def test_affinity_schema(self, music_db):
        sch = sqlite_schema(music_db, "songs")
        kinds = {f.name: f.dataType.simpleString() for f in sch.fields}
        assert kinds == {
            "id": "bigint", "title": "string", "artist_id": "bigint",
            "isrc": "string", "spotify_id": "string",
        }

    def test_all_null_column_keeps_declared_type(self, spark, tmp_path):
        p = str(tmp_path / "t.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (id INTEGER, x REAL, b BLOB)")
        con.execute("INSERT INTO t VALUES (1, NULL, NULL)")
        con.commit()
        con.close()
        df = load_sqlite(spark, p)["t"]
        assert [f.dataType.simpleString() for f in df.schema.fields] == [
            "bigint", "double", "binary"]
        assert df.count() == 1

    def test_fk_discovery(self, music_db):
        fk = sqlite_fk_map(music_db, ["artists", "songs"])
        assert fk == {"songs": [("artist_id", "artists", "id")]}

    def test_composite_fk_grouped(self, spark, tmp_path):
        p = str(tmp_path / "c.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE p (a INTEGER, b INTEGER, PRIMARY KEY (a, b))")
        con.execute(
            "CREATE TABLE c (x INTEGER, y INTEGER, "
            "FOREIGN KEY (x, y) REFERENCES p (a, b))")
        con.commit()
        con.close()
        fk = sqlite_fk_map(p, ["p", "c"])
        assert fk == {"c": [(("x", "y"), "p", ("a", "b"))]}


class TestMusicScenario:
    """The reference's TestIntegration.test_music_database_scenario,
    driven through the Spark operators."""

    def _report(self, spark, path):
        from data_quality_spark.operators.scans import health_check

        tables, fk_map = load_database(spark, f"sqlite:///{path}")
        return health_check(tables, fk_map)

    def test_finds_nulls_and_duplicates(self, spark, tmp_path):
        p = str(tmp_path / "music.db")
        _seed(p)
        rep = self._report(spark, p)
        assert rep.all_good is False
        assert rep.total_issues > 0
        issues = rep.issues
        nulls = [i for i in issues if i["issue_type"] == "nulls"]
        dups = [i for i in issues if i["issue_type"] == "duplicate"]
        assert len(nulls) > 0 and len(dups) > 0
        # seeded counts: artists.spotify_id 1 NULL of 3; songs.isrc 1
        # NULL of 4; duplicate isrc USRC123 -> 1 extra row
        by = {(i["table"], i["column"], i["issue_type"]): i for i in issues}
        assert by[("artists", "spotify_id", "nulls")]["count"] == 1
        assert by[("artists", "spotify_id", "nulls")]["total"] == 3
        assert by[("songs", "isrc", "nulls")]["count"] == 1
        assert by[("songs", "isrc", "duplicate")]["count"] == 1
        for i in issues:
            assert i["table"] in ("artists", "songs")
            assert i["count"] > 0 and i["total"] > 0
            assert i["percent"] >= 0
            assert i["severity"] in ("critical", "warning", "info")
            assert len(i["description"]) > 0

    def test_discovered_fk_finds_orphans(self, spark, tmp_path):
        p = str(tmp_path / "music.db")
        _seed(p, ["INSERT INTO songs VALUES "
                  "(5,'Song 5',99,'USRC555','track555')"])
        rep = self._report(spark, p)
        orphans = [i for i in rep.issues if i["issue_type"] == "orphan"]
        assert len(orphans) == 1
        o = orphans[0]
        assert (o["table"], o["column"]) == ("songs", "artist_id")
        assert o["count"] == 1 and o["severity"] == "critical"


@pytest.mark.slow
class TestCliDatabaseUrl:
    def _main(self, monkeypatch, argv):
        import data_quality_spark.cli as cli

        monkeypatch.setattr("pyspark.sql.SparkSession.stop",
                            lambda self: None)
        return cli.main(argv)

    def test_check_database_url(self, spark, music_db, capsys, monkeypatch):
        code = self._main(monkeypatch, [
            "check", "--database-url", f"sqlite:///{music_db}",
            "--format", "json", "--fail-on", "none",
        ])
        payload = json.loads(capsys.readouterr().out)
        assert code == 0
        types = {i["issue_type"] for i in payload["issues"]}
        assert {"nulls", "duplicate"} <= types

    def test_unreadable_database_exits_3(self, spark, capsys, monkeypatch):
        code = self._main(monkeypatch, [
            "check", "--database-url",
            "sqlite:///nonexistent/path/database.db",
        ])
        err = capsys.readouterr().err
        assert code == 3
        assert "Error:" in err and "sqlite file not found" in err

    def test_tables_and_url_mutually_exclusive(self, spark, tmp_path,
                                               capsys, monkeypatch):
        code = self._main(monkeypatch, [
            "check", "--tables", str(tmp_path),
            "--database-url", "sqlite:///x.db",
        ])
        assert code == 3

    def test_unreadable_tables_dir_exits_3(self, spark, capsys, monkeypatch):
        code = self._main(monkeypatch, [
            "check", "--tables", "/nonexistent/dir",
        ])
        assert code == 3


class TestCoercion:
    def test_dynamic_cells_coerced_onto_affinity(self, spark, tmp_path):
        """sqlite is dynamically typed per CELL: coercible strays land
        on the declared affinity ('42' in an INTEGER column -> 42)."""
        import sqlite3

        p = str(tmp_path / "dyn.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (n INTEGER, x REAL, s TEXT)")
        con.execute("INSERT INTO t VALUES ('42', '3.5', 7)")   # strs in num cols, int in text
        con.execute("INSERT INTO t VALUES (1, 2.0, NULL)")
        con.commit()
        con.close()
        rows = sorted(load_sqlite(spark, p)["t"].collect(),
                      key=lambda r: r["n"])
        assert (rows[1]["n"], rows[1]["x"], rows[1]["s"]) == (42, 3.5, "7")

    def test_noncoercible_strays_widen_column_not_null(self, spark,
                                                       tmp_path):
        """A present-but-mistyped cell must stay PRESENT: the reference
        scanning the live DB sees 'junk' in an INTEGER column as data,
        so NULLing it would drift the null scan.  The column widens to
        string; a REAL stray in an INT column widens only to double."""
        import sqlite3

        p = str(tmp_path / "stray.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (n INTEGER, m INTEGER, x REAL)")
        con.execute("INSERT INTO t VALUES (1, 1, 0.5)")
        con.execute("INSERT INTO t VALUES ('junk', 3.5, 'junk')")
        con.commit()
        con.close()
        df = load_sqlite(spark, p)["t"]
        kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        assert kinds == {"n": "string", "m": "double", "x": "string"}
        rows = sorted(df.collect(), key=lambda r: r["n"])
        assert rows[0]["n"] == "1" and rows[1]["n"] == "junk"
        assert rows[1]["m"] == 3.5 and rows[1]["x"] == "junk"
        # the null scan now counts zero nulls here — nothing was lost
        assert df.filter("n IS NULL OR x IS NULL").count() == 0

    def test_stray_report_issue_rows(self, tmp_path):
        """The widening's audit surface: one warning row per column
        with non-coercible strays, naming the widened type."""
        import sqlite3

        from data_quality_spark.sources.database import (
            sqlite_stray_report,
        )

        p = str(tmp_path / "stray2.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (n INTEGER, m INTEGER, ok INTEGER)")
        con.execute("INSERT INTO t VALUES ('junk', 3.5, 1)")
        con.execute("INSERT INTO t VALUES (2, 2, 2)")
        con.commit()
        con.close()
        rows = sqlite_stray_report(p)
        by = {r["column"]: r for r in rows}
        assert set(by) == {"n", "m"}
        assert by["n"]["count"] == 1 and by["n"]["total"] == 2
        assert "loaded as string" in by["n"]["description"]
        assert "loaded as double" in by["m"]["description"]
        assert by["n"]["severity"] == "warning"
        assert by["n"]["issue_type"] == "type_stray"

    def test_cli_check_surfaces_type_strays(self, spark, tmp_path,
                                            monkeypatch, capsys):
        import json as _json
        import sqlite3

        import data_quality_spark.cli as cli

        p = str(tmp_path / "strays.db")
        con = sqlite3.connect(p)
        con.execute("CREATE TABLE t (id INTEGER, n INTEGER)")
        con.execute("INSERT INTO t VALUES (1, 'junk')")
        con.commit()
        con.close()
        monkeypatch.setattr("pyspark.sql.SparkSession.stop",
                            lambda self: None)
        code = cli.main([
            "check", "--database-url", f"sqlite:///{p}",
            "--format", "json", "--fail-on", "none",
        ])
        payload = _json.loads(capsys.readouterr().out)
        assert code == 0
        strays = [i for i in payload["issues"]
                  if i["issue_type"] == "type_stray"]
        assert len(strays) == 1 and strays[0]["column"] == "n"

    def test_connections_are_closed(self, tmp_path, monkeypatch):
        """sqlite3's context manager commits but never closes; every
        helper must actually close (ADVICE r4)."""
        import sqlite3 as sq

        p = str(tmp_path / "close.db")
        con = sq.connect(p)
        con.execute("CREATE TABLE t (a INTEGER)")
        con.commit()
        con.close()
        opened = []
        real_connect = sq.connect

        def tracking_connect(*a, **k):
            c = real_connect(*a, **k)
            opened.append(c)
            return c

        monkeypatch.setattr(
            "data_quality_spark.sources.database.sqlite3.connect",
            tracking_connect,
        )
        sqlite_tables(p)
        sqlite_schema(p, "t")
        sqlite_fk_map(p, ["t"])
        assert opened, "tracking hook never fired"
        for c in opened:
            with pytest.raises(sq.ProgrammingError):
                c.execute("SELECT 1")  # raises iff closed


class TestJdbcDialectContract:
    """Pin the exact subqueries the JDBC path generates per dialect, via
    the injectable reader seam — a live server hookup is then a config
    change, not a code change (r4 VERDICT #9)."""

    def test_mysql_discovery_subquery(self):
        from data_quality_spark.sources.database import discovery_subquery

        assert discovery_subquery("jdbc:mysql://h:3306/db") == (
            "(SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = DATABASE()) AS t"
        )
        assert discovery_subquery(
            "jdbc:mariadb://h/db", patterns=["song%", "art'ist"]
        ) == (
            "(SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = DATABASE() AND "
            "(table_name LIKE '%song%' OR table_name LIKE '%artist%')) AS t"
        )

    def test_postgres_discovery_subquery(self):
        from data_quality_spark.sources.database import discovery_subquery

        assert discovery_subquery("jdbc:postgresql://h:5432/db") == (
            "(SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = current_schema() "
            "AND table_type = 'BASE TABLE') AS t"
        )

    def test_unknown_dialect_demands_explicit_tables(self):
        from data_quality_spark.exceptions import ConfigurationError
        from data_quality_spark.sources.database import discovery_subquery

        with pytest.raises(ConfigurationError) as ei:
            discovery_subquery("jdbc:oracle:thin:@//h:1521/db")
        assert "explicit tables" in str(ei.value)

    def test_injected_reader_sees_discovery_then_tables(self, spark):
        from data_quality_spark.sources.database import load_jdbc

        seen = []

        def fake_reader(dbtable):
            seen.append(dbtable)
            if "information_schema" in dbtable:
                return spark.createDataFrame(
                    [("songs",), ("artists",)], "table_name string")
            return spark.range(1).toDF("id")

        out = load_jdbc(spark, "jdbc:postgresql://h/db", reader=fake_reader)
        assert set(out) == {"songs", "artists"}
        assert seen[0].startswith("(SELECT table_name")
        assert "current_schema()" in seen[0]
        assert sorted(seen[1:]) == ["artists", "songs"]

    def test_injected_reader_explicit_tables_skips_discovery(self, spark):
        from data_quality_spark.sources.database import load_jdbc

        seen = []

        def fake_reader(dbtable):
            seen.append(dbtable)
            return spark.range(1).toDF("id")

        load_jdbc(spark, "jdbc:oracle:thin:@//h/db", tables=["t1"],
                  reader=fake_reader)
        # unknown dialect is fine WITH a table list: no discovery query
        assert seen == ["t1"]


class TestJdbcFkDiscovery:
    """information_schema FK introspection — the live-JDBC analog of
    sqlite's PRAGMA path, pinned per dialect via the reader seam
    (whole-database generalization of the reference's per-table MySQL
    query, quality_scanner.py:421-445)."""

    FK_SCHEMA = ("child_table string, fk_name string, ord int, "
                 "child_col string, parent_table string, "
                 "parent_col string")

    def test_mysql_fk_subquery_pinned(self):
        from data_quality_spark.sources.database import (
            fk_discovery_subquery,
        )

        q = fk_discovery_subquery("jdbc:mysql://h/db")
        assert "key_column_usage" in q
        assert "table_schema = DATABASE()" in q
        assert "referenced_table_name IS NOT NULL" in q

    def test_postgres_fk_subquery_pinned(self):
        from data_quality_spark.sources.database import (
            fk_discovery_subquery,
        )

        q = fk_discovery_subquery("jdbc:postgresql://h/db")
        assert "constraint_type = 'FOREIGN KEY'" in q
        assert "current_schema()" in q
        assert "constraint_column_usage" in q

    def test_fk_map_grouping_incl_composite(self, spark):
        from data_quality_spark.sources.database import jdbc_fk_map

        rows = [
            ("songs", "fk_artist", 1, "artist_id", "artists", "id"),
            # composite constraint, ordinals deliberately out of order
            ("plays", "fk_song", 2, "song_b", "songs", "kb"),
            ("plays", "fk_song", 1, "song_a", "songs", "ka"),
            # parent outside the known table set -> dropped
            ("songs", "fk_label", 1, "label_id", "labels", "id"),
        ]

        def fake_reader(dbtable):
            assert "information_schema" in dbtable
            return spark.createDataFrame(rows, self.FK_SCHEMA)

        fk = jdbc_fk_map(spark, "jdbc:mysql://h/db",
                         ["artists", "songs", "plays"],
                         reader=fake_reader)
        assert fk == {
            "songs": [("artist_id", "artists", "id")],
            "plays": [(("song_a", "song_b"), "songs", ("ka", "kb"))],
        }

    def test_unknown_dialect_returns_empty_map(self, spark):
        from data_quality_spark.sources.database import jdbc_fk_map

        def fake_reader(dbtable):  # pragma: no cover - must not be hit
            raise AssertionError("no introspection for unknown dialect")

        assert jdbc_fk_map(spark, "jdbc:oracle:thin:@//h/db", ["t"],
                           reader=fake_reader) == {}

    def test_load_database_jdbc_wires_fk_map(self, spark):
        from data_quality_spark.sources.database import load_database

        def fake_reader(dbtable):
            if "information_schema.tables" in dbtable:
                return spark.createDataFrame(
                    [("artists",), ("songs",)], "table_name string")
            if "key_column_usage" in dbtable:
                return spark.createDataFrame(
                    [("songs", "fk", 1, "artist_id", "artists", "id")],
                    self.FK_SCHEMA)
            return spark.range(1).toDF("id")

        tables, fk = load_database(
            spark, "mysql://h/db", reader=fake_reader)
        assert set(tables) == {"artists", "songs"}
        assert fk == {"songs": [("artist_id", "artists", "id")]}


def test_exception_formatting():
    from data_quality_spark.exceptions import (
        OperationError,
        ValidationError,
    )

    e = ValidationError("table", 42, "a table name", "use a string")
    s = str(e)
    assert "Invalid table" in s and "Details:" in s and "Suggestion: use a string" in s
    assert e.code == "validation" and e.field == "table"
    op = OperationError("scan", "timeout", retryable=True)
    assert op.retryable and "Operation 'scan' failed: timeout" in str(op)
