"""AST lint for unsafe SQL construction — parameterize, never
interpolate.

The engine itself never builds SQL from strings (the Spark surface is
DataFrame expressions; the sqlite path uses ``?`` placeholders), but a
*user's* pipeline code frequently does, and the reference ships an AST
policy checker as its most distinctive security artifact
(``/root/reference/src/data_quality/sql_policy.py:26-134``, tested in
``tests/test_security.py:26-98``).  This is a from-scratch
re-implementation of that contract:

- any ``execute``/``executemany``/``execute_many``/``exec_driver_sql``
  call whose SQL argument is an f-string, ``%`` interpolation,
  ``.format(...)``, concatenation involving a variable, a bare
  variable/expression, or ``text(<non-literal>)`` is flagged
  (code ``SQL001``);
- literal strings, literal-only concatenation, and
  ``text("<literal>")`` with bound parameters pass;
- unparseable input yields one ``SYNTAX`` violation rather than a
  raised error.

One deliberate extension beyond the reference: identifier quoting (a
table name in ``SELECT * FROM "{t}"``) cannot be parameterized, so a
site may carry an explicit, REASONED pragma — ``# sql-ok: <why>`` on
the flagged line — to suppress the finding.  A bare ``# sql-ok:`` with
no reason does not suppress; the reason is the audit trail.  The repo
lints its own source tree in ``tests/test_sql_policy.py`` (the
reference's "documentation examples are valid" meta-test, applied to
the whole codebase).
"""

from __future__ import annotations

import ast
import sys
from typing import List

__all__ = [
    "SQLSecurityViolation",
    "check_sql_security",
    "check_file_sql_security",
]

_EXECUTE_NAMES = frozenset(
    {"execute", "executemany", "execute_many", "exec_driver_sql"}
)
_PRAGMA = "# sql-ok:"
_MESSAGE = (
    "Unsafe SQL construction detected. "
    "Use text() with bound parameters instead."
)


class SQLSecurityViolation(Exception):
    """One flagged site; same attribute surface as the reference's class
    so ``except``/reporting code migrates unchanged."""

    def __init__(self, message: str, line: int, column: int,
                 code: str) -> None:
        super().__init__(message)
        self.message = message
        self.line = line
        self.column = column
        self.code = code

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (f"SQLSecurityViolation({self.code} at "
                f"{self.line}:{self.column}: {self.message})")


def _is_dynamic(node: ast.AST) -> bool:
    """Could evaluating this node yield text not visible in the source?
    Constants (and trees of constants) are static; everything else —
    names, attributes, calls, subscripts — is dynamic."""
    if isinstance(node, ast.Constant):
        return False
    if isinstance(node, ast.BinOp):
        return _is_dynamic(node.left) or _is_dynamic(node.right)
    return True


def _text_call_kind(func: ast.AST) -> bool:
    """Is this the ``text(...)`` / ``sqlalchemy.text(...)`` wrapper?"""
    if isinstance(func, ast.Name):
        return func.id == "text"
    return isinstance(func, ast.Attribute) and func.attr == "text"


def _unsafe_sql_arg(node: ast.AST) -> bool:
    """Classify the SQL argument of an execute call."""
    if isinstance(node, ast.JoinedStr):
        return True  # f-string: interpolation by construction
    if isinstance(node, ast.BinOp):
        if isinstance(node.op, ast.Mod):
            return True  # '%' interpolation, even with a literal RHS
        if isinstance(node.op, ast.Add):
            # literal + literal is just a split string; a variable on
            # either side is interpolation
            return _is_dynamic(node.left) or _is_dynamic(node.right)
        return _is_dynamic(node)
    if isinstance(node, ast.Call):
        if _text_call_kind(node.func):
            # text() is the sanctioned wrapper — but only around a
            # literal; text(variable) just launders the interpolation
            first = node.args[0] if node.args else None
            return not (isinstance(first, ast.Constant)
                        and isinstance(first.value, str))
        # .format(...) or any other call producing the statement text
        return True
    if isinstance(node, ast.Constant):
        return False  # a literal statement cannot be injected into
    return _is_dynamic(node)


def _is_execute(func: ast.AST) -> bool:
    if isinstance(func, ast.Attribute):
        return func.attr in _EXECUTE_NAMES
    if isinstance(func, ast.Name):
        return func.id in _EXECUTE_NAMES
    return False


def _pragma_ok(source_line: str) -> bool:
    """A reasoned ``# sql-ok: <why>`` pragma on the flagged line."""
    idx = source_line.find(_PRAGMA)
    return idx >= 0 and bool(source_line[idx + len(_PRAGMA):].strip())


def check_sql_security(
    code: str, filename: str = "<string>"
) -> List[SQLSecurityViolation]:
    """All SQL-construction violations in ``code`` (empty list = clean).

    A syntactically invalid input returns one ``SYNTAX`` violation
    (mirrors the reference: the linter reports, it never raises).
    """
    try:
        tree = ast.parse(code, filename=filename)
    except SyntaxError as e:
        return [SQLSecurityViolation(
            f"Syntax error: {e.msg}", e.lineno or 0, e.offset or 0,
            "SYNTAX",
        )]
    lines = code.splitlines()
    out: List[SQLSecurityViolation] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call) and _is_execute(node.func)
                and node.args):
            continue
        if not _unsafe_sql_arg(node.args[0]):
            continue
        line = node.lineno
        if 0 < line <= len(lines) and _pragma_ok(lines[line - 1]):
            continue
        out.append(SQLSecurityViolation(
            _MESSAGE, line, node.col_offset, "SQL001"))
    return out


def check_file_sql_security(filepath: str) -> List[SQLSecurityViolation]:
    """Lint one Python file; unreadable files report ``IO_ERROR``."""
    try:
        with open(filepath, encoding="utf-8") as fh:
            return check_sql_security(fh.read(), filepath)
    except OSError as e:
        return [SQLSecurityViolation(
            f"Failed to read file: {e}", 0, 0, "IO_ERROR")]


def main(argv: List[str] | None = None) -> int:  # pragma: no cover
    """``python -m data_quality_spark.sql_policy <file>...`` — exit 1 on
    any violation, printing ``file:line:col code message`` per finding."""
    paths = list(sys.argv[1:] if argv is None else argv)
    bad = 0
    for p in paths:
        for v in check_file_sql_security(p):
            print(f"{p}:{v.line}:{v.column} {v.code} {v.message}")
            bad += 1
    return 1 if bad else 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
