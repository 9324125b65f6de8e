"""Dev harness replicating the driver's Spark-vs-DuckDB differential check.

Runs every ``queries()`` entry at sf0.01, runs the matching ``oracle_sql()``
in DuckDB over the same parquet, and compares row count, sorted column names,
and values (rows sorted, column order by name — the driver's order-insensitive
value-hash).  Rows-only queries are just executed and counted.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main() -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from data_quality_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok    {name}: rows-only, {len(srows)} rows  ({dt:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sk = frame_key(scols, srows)
        dc, dk = frame_key(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: columns spark={sc} duckdb={dc}")
            failures += 1
            continue
        if len(sk) != len(dk):
            print(f"FAIL  {name}: rowcount spark={len(sk)} duckdb={len(dk)}")
            failures += 1
            continue
        bad = [i for i, (a, b) in enumerate(zip(sk, dk)) if a != b]
        if bad:
            i = bad[0]
            print(
                f"FAIL  {name}: {len(bad)}/{len(sk)} rows differ; first:\n"
                f"      cols  ={sc}\n      spark ={sk[i]}\n      duckdb={dk[i]}"
            )
            failures += 1
            continue
        print(f"PASS  {name}: {len(sk)} rows match  ({dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
