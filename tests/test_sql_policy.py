"""AST SQL-policy lint — ports the reference's positive/negative matrix
(``/root/reference/tests/test_security.py:26-98``) and adds the repo
self-lint meta-test plus the reasoned-pragma law."""

from __future__ import annotations

import glob
import itertools
import os

from data_quality_spark.sql_policy import (
    SQLSecurityViolation,
    check_file_sql_security,
    check_sql_security,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestUnsafePatterns:
    def test_f_string(self):
        v = check_sql_security(
            'conn.execute(f"SELECT * FROM users WHERE id = {user_id}")')
        assert len(v) == 1 and v[0].code == "SQL001"
        assert "Unsafe SQL construction" in v[0].message

    def test_percent_formatting(self):
        v = check_sql_security(
            'conn.execute("SELECT * FROM users WHERE id = %s" % user_id)')
        assert len(v) == 1 and v[0].code == "SQL001"

    def test_percent_with_literal_rhs_still_flagged(self):
        v = check_sql_security('conn.execute("WHERE id = %s" % 7)')
        assert len(v) == 1

    def test_format_method(self):
        v = check_sql_security(
            'conn.execute("SELECT * FROM u WHERE id = {}".format(user_id))')
        assert len(v) == 1 and v[0].code == "SQL001"

    def test_concatenation_with_variable(self):
        v = check_sql_security(
            'conn.execute("SELECT * FROM u WHERE id = " + str(user_id))')
        assert len(v) == 1 and v[0].code == "SQL001"

    def test_text_wrapping_a_variable(self):
        v = check_sql_security("conn.execute(text(query_variable))")
        assert len(v) == 1 and v[0].code == "SQL001"

    def test_bare_variable(self):
        v = check_sql_security("cur.execute(q)")
        assert len(v) == 1

    def test_executemany_and_driver_sql_covered(self):
        for call in ("executemany", "execute_many", "exec_driver_sql"):
            v = check_sql_security(f'conn.{call}(f"DELETE {{t}}")')
            assert len(v) == 1, call

    def test_multiple_violations_each_located(self):
        code = (
            'conn.execute(f"SELECT * FROM users WHERE id = {user_id}")\n'
            'conn.execute("SELECT * FROM posts WHERE a = %s" % author_id)\n'
        )
        v = sorted(check_sql_security(code), key=lambda x: x.line)
        assert [x.line for x in v] == [1, 2]
        assert all(x.code == "SQL001" for x in v)


class TestSafePatterns:
    def test_reference_safe_matrix(self):
        for pattern in [
            'conn.execute(text("SELECT * FROM users WHERE id = :id"),'
            ' {"id": user_id})',
            'conn.execute("SELECT * FROM users")',
            'conn.execute(text("SELECT COUNT(*) FROM users"))',
            'conn.execute(sqlalchemy.text("SELECT 1"))',
            'conn.execute("SELECT ? FROM t", (x,))',  # bound params
            'conn.execute("SELECT a " + "FROM t")',   # literal split
            "unrelated.format(x)",                    # not an execute call
        ]:
            assert check_sql_security(pattern) == [], pattern

    def test_syntax_error_reports_not_raises(self):
        v = check_sql_security('conn.execute(f"SELECT {x}"')
        assert len(v) == 1 and v[0].code == "SYNTAX"

    def test_violation_is_an_exception_with_reference_attrs(self):
        v = check_sql_security("cur.execute(q)")[0]
        assert isinstance(v, Exception)
        assert isinstance(v.message, str) and isinstance(v.code, str)
        assert v.line == 1 and isinstance(v.column, int)


class TestPragma:
    def test_reasoned_pragma_suppresses(self):
        code = ('cur.execute(  # sql-ok: identifier from a vetted list\n'
                '    f"SELECT * FROM {t}"\n)')
        assert check_sql_security(code) == []

    def test_bare_pragma_does_not_suppress(self):
        code = 'cur.execute(f"SELECT * FROM {t}")  # sql-ok:'
        assert len(check_sql_security(code)) == 1

    def test_pragma_on_wrong_line_does_not_suppress(self):
        code = ('# sql-ok: misplaced reason\n'
                'cur.execute(f"SELECT * FROM {t}")')
        assert len(check_sql_security(code)) == 1


class TestFileApi:
    def test_unreadable_file_reports_io_error(self):
        v = check_file_sql_security("/nonexistent/x.py")
        assert len(v) == 1 and v[0].code == "IO_ERROR"

    def test_cli_lint_subcommand(self, tmp_path, capsys):
        """`cli lint` runs pre-Spark: exit 1 + file:line:col on a
        violation, exit 0 on clean input."""
        import data_quality_spark.cli as cli

        bad = tmp_path / "bad.py"
        bad.write_text('con.execute(f"SELECT {x}")\n')
        ok = tmp_path / "ok.py"
        ok.write_text('con.execute("SELECT 1")\n')
        assert cli.main(["lint", str(bad)]) == 1
        out = capsys.readouterr().out
        assert "SQL001" in out and "bad.py:1" in out
        assert cli.main(["lint", str(ok)]) == 0

    def test_repo_lints_itself_clean(self):
        """The reference's 'documentation examples are valid' meta-test,
        applied to the whole codebase: every execute() in this repo is
        either parameterized, a literal, or carries a reasoned
        ``# sql-ok:`` pragma."""
        files = sorted(itertools.chain(
            glob.glob(os.path.join(REPO, "data_quality_spark/**/*.py"),
                      recursive=True),
            glob.glob(os.path.join(REPO, "scripts/*.py")),
            glob.glob(os.path.join(REPO, "tests/*.py")),
            [os.path.join(REPO, "__spark_entry__.py"),
             os.path.join(REPO, "bench.py")],
        ))
        assert len(files) > 100  # the sweep actually saw the repo
        bad = {
            f: [f"{v.line}:{v.code}" for v in check_file_sql_security(f)]
            for f in files if check_file_sql_security(f)
        }
        assert bad == {}
