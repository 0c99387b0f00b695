"""Local stand-in for the driver's t2 correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column-name
set, and order-insensitive values (floats to 1e-6). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], columns: list[str]) -> list[tuple]:
    """Sort columns by name, canonicalize cell values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def canon(v):
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("\x00nan",)
            return ("f", round(v, 6))
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, int):
            # Keep int distinct from float: the driver's value-hash
            # distinguishes 508966 from 508966.0 (round-1 olap_* lesson).
            return ("i", v)
        if isinstance(v, (list, tuple)):
            return ("a", tuple(canon(x) for x in v))
        return ("s", str(v))

    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from temporai_mivdp_spark.session import get_test_session

    spark = get_test_session(cpus=8)
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    failures = []
    checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(ns, nd)) if a != b
                )
                problems.append(f"values differ, first at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{checked - len(failures)}/{checked} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
