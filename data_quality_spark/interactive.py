"""Guided interactive wizard — the reference's menu-driven CLI,
re-expressed over the Spark operators.

Mirrors ``/root/reference/src/data_quality/interactive_cli.py:1-555``:
banner → connect (``DATABASE_URL`` auto-connect) → menu loop
{full health check, deep table dive, missing-data hunter, broken-link
detective, schema doctor, quick stats, connection tools, quit}.  The
reference renders with ``rich`` (and pip-installs it on the fly,
``interactive_cli.py:21-30``); this sandbox installs nothing, so the
wizard renders plain text — the flow, menu surface, and auto-connect
behavior are the parity target, not the box-drawing.

Every prompt reads from an injectable stream and writes to an
injectable stream, so the whole wizard is drivable from a test with a
scripted stdin — the reference's wizard has no such seam and its 555
lines are untested.

Sources: a parquet tables directory (``/path/to/dir``) or any
``sources.database`` URL (``sqlite:///…``, ``jdbc:…``) — one wizard,
both access paths.
"""

from __future__ import annotations

import os
import sys
from typing import IO

from pyspark.sql import DataFrame, SparkSession

from .exceptions import DataQualityError

__all__ = ["Wizard", "run_wizard"]

_BANNER = """\
=============================================
  data-quality-spark — guided health wizard
  (reference parity: interactive_cli.py menu)
============================================="""

_MENU = [
    ("1", "Full health checkup", "nulls + duplicates + orphans, ranked"),
    ("2", "Deep table dive", "completeness + advice for ONE table"),
    ("3", "Missing data hunter", "per-column NULL scan incl. clean cols"),
    ("4", "Broken link detective", "orphaned foreign-key rows"),
    ("5", "Schema doctor", "index/boolean/industry recommendations"),
    ("6", "Connection tools", "point at a tables dir or database URL"),
    ("7", "Quick stats", "tables and row counts"),
    ("q", "Exit", "leave the wizard"),
]


class Wizard:
    def __init__(
        self,
        spark: SparkSession,
        in_stream: IO[str] | None = None,
        out_stream: IO[str] | None = None,
    ) -> None:
        self.spark = spark
        self._in = in_stream or sys.stdin
        self._out = out_stream or sys.stdout
        self.source: str | None = None
        self.tables: dict[str, DataFrame] = {}
        self.fk_map: dict[str, list[tuple]] = {}

    # ---- IO seams -------------------------------------------------
    def say(self, msg: str = "") -> None:
        print(msg, file=self._out)

    def ask(self, prompt: str, default: str = "") -> str:
        print(f"{prompt} ", file=self._out, end="", flush=True)
        line = self._in.readline()
        if not line:  # EOF = quit-ish default
            return default
        return line.strip() or default

    # ---- connection ----------------------------------------------
    def connect(self, source: str) -> None:
        """Tables dir or database URL → loaded relations + FK map."""
        if os.path.isdir(source):
            names = sorted(
                f[: -len(".parquet")] for f in os.listdir(source)
                if f.endswith(".parquet")
            )
            self.tables = {
                n: self.spark.read.parquet(os.path.join(source, f"{n}.parquet"))
                for n in names
            }
            self.fk_map = {}
        else:
            from .sources.database import load_database

            self.tables, self.fk_map = load_database(self.spark, source)
        self.source = source
        self.say(f"connected: {source} ({len(self.tables)} tables)")

    def connect_menu(self) -> None:
        src = self.ask(
            "tables directory or database URL "
            "(e.g. /data/tables or sqlite:///db.sqlite):")
        if not src:
            self.say("nothing entered; connection unchanged")
            return
        try:
            self.connect(src)
        except DataQualityError as e:
            self.say(f"connection failed: {e}")

    def _need_connection(self) -> bool:
        if not self.tables:
            self.say("connect to a source first (option 6)")
            return True
        return False

    # ---- menu actions --------------------------------------------
    def health_check(self) -> None:
        if self._need_connection():
            return
        from .operators.scans import health_check

        rep = health_check(self.tables, self.fk_map or None)
        s = rep.summary
        self.say(
            f"scan of {len(self.tables)} tables: {rep.total_issues} "
            f"issues (critical {s['critical']}, warning {s['warning']}, "
            f"info {s['info']}) in {rep.scan_time_ms:.0f} ms")
        for i in rep.issues[:20]:
            self.say(
                f"  [{i['severity']:8s}] {i['table']}.{i['column']} "
                f"{i['issue_type']}: {i['count']}/{i['total']} "
                f"({i['percent']:.1f}%)")
        if rep.all_good:
            self.say("  all good — no critical or warning issues")

    def table_dive(self) -> None:
        if self._need_connection():
            return
        name = self.ask(f"which table? {sorted(self.tables)}:")
        if name not in self.tables:
            self.say(f"no such table: {name!r}")
            return
        from .operators.scans import completeness
        from .plans.advisor import advise_table

        df = self.tables[name]
        rows = completeness(df, name).collect()
        self.say(f"{name}: {len(df.columns)} columns")
        for r in rows:
            self.say(
                f"  {r['column']:24s} filled {r['fill_percentage']:.1f}% "
                f"({r['category']})")
        adv = advise_table(df, name)
        self.say(f"  rows: {adv.n_rows}")
        if adv.natural_keys:
            self.say(f"  natural key candidates: {adv.natural_keys}")
        for note in adv.notes:
            self.say(f"  note: {note}")

    def null_hunter(self) -> None:
        if self._need_connection():
            return
        from .operators.scans import scan_nulls

        for name, df in sorted(self.tables.items()):
            for r in scan_nulls(df, name, keep_zero=True).collect():
                flag = "!" if r["count"] else " "
                self.say(
                    f" {flag} {name}.{r['column']}: {r['count']} NULLs "
                    f"of {r['total']}")

    def link_detective(self) -> None:
        if self._need_connection():
            return
        if not self.fk_map:
            self.say(
                "no declared foreign keys for this source (sqlite "
                "sources auto-discover; parquet dirs have no FK "
                "metadata)")
            return
        from .operators.scans import scan_orphans

        rows = scan_orphans(self.tables, self.fk_map).collect()
        for r in rows:
            self.say(
                f"  {r['table']}.{r['column']}: {r['count']} orphaned "
                f"rows of {r['total']}")
        if not rows:
            self.say("  every foreign key resolves")

    def schema_doctor(self) -> None:
        if self._need_connection():
            return
        from .plans.advisor import suggest_improvements

        recs = suggest_improvements(self.tables)
        for rec in recs[:25]:
            self.say(f"  [{rec.priority:6s}] {rec.type}: {rec.description}")
        if not recs:
            self.say("  no recommendations")

    def quick_stats(self) -> None:
        if self._need_connection():
            return
        for name, df in sorted(self.tables.items()):
            self.say(f"  {name}: {df.count()} rows, {len(df.columns)} cols")

    # ---- loop -----------------------------------------------------
    def run(self) -> int:
        self.say(_BANNER)
        env_url = os.environ.get("DATABASE_URL")
        if env_url:
            try:
                self.connect(env_url)  # the reference's auto-connect law
            except DataQualityError as e:
                self.say(f"DATABASE_URL auto-connect failed: {e}")
        actions = {
            "1": self.health_check, "2": self.table_dive,
            "3": self.null_hunter, "4": self.link_detective,
            "5": self.schema_doctor, "6": self.connect_menu,
            "7": self.quick_stats,
        }
        while True:
            self.say()
            for opt, title, desc in _MENU:
                self.say(f"  {opt}) {title:22s} {desc}")
            choice = self.ask("select an option [q]:", default="q")
            if choice == "q":
                self.say("bye")
                return 0
            action = actions.get(choice)
            if action is None:
                self.say(f"unknown option {choice!r}")
                continue
            action()


def run_wizard(spark: SparkSession) -> int:
    return Wizard(spark).run()
