"""Local stand-in for the driver's t2 correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column-name
set, and order-insensitive values the way the DRIVER does.

Bug-compatibility contract (round 8, after the round-7 driver failures):
the driver canonicalizes BOTH result sets through pandas —
``DataFrame.sort_values`` over all columns (lexsort → ``factorize``, which
raises ``TypeError: unhashable type`` on list/array cells) — and reads the
DuckDB side via ``.df()`` (so an un-CAST ``sum()`` surfaces as HUGEINT →
float64 and hashes ``123.0`` against Spark's ``123``). Round 7's local
harness fetched raw tuples and canonicalized lists to tuples, which was
MORE forgiving than the real check; five entries passed locally and failed
the driver. This version routes through the same pandas path, so:

* list/ndarray/dict cells raise locally exactly like the driver
  (``canon_frame`` multi-column lexsort, plus an explicit cell rejection
  so even single-column frames fail loudly);
* the DuckDB side is fetched with ``.df()``, so HUGEINT→float64 and
  DECIMAL→float64 coercions are visible locally and hash against Spark's
  ints/doubles the way the driver hashes them;
* ints and floats stay distinct in the canon (round-1 lesson: the driver
  distinguishes 508966 from 508966.0); floats round to 6dp.

Usage::

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon_cell(v):
    """Canonicalize one cell to a hashable, engine-neutral token.

    Int vs float stays DISTINCT (the driver's value hash does, and that is
    exactly how the round-7 HUGEINT misses surfaced). Unhashable container
    cells (list/ndarray/dict/set) raise TypeError — the driver's
    canonicalizer crashes on them, so the local harness must too.
    """
    if v is None or v is pd.NaT:
        # NaT is DuckDB .df()'s NULL for DATE/TIMESTAMP columns, the
        # temporal twin of the NaN-means-NULL rule below; without this
        # fold a nullable date column false-mismatches (NaT vs None).
        return ("null",)
    if isinstance(v, (list, dict, set, np.ndarray)):
        raise TypeError(
            f"unhashable type: {type(v).__name__!r} — the driver's pandas "
            "canonicalizer rejects container cells; serialize or explode "
            "this column (CONTRIBUTING.md checklist)"
        )
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            # DuckDB NULL in a numeric column arrives as NaN after .df();
            # Spark NULL arrives as None from collect(). The driver frames
            # see the same pair, so NaN and NULL canonicalize together.
            return ("null",)
        return ("f", round(f, 6))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        # Deliberately NOT folded into float: DuckDB .df() coerces DECIMAL
        # to float64 while Spark collect() keeps Decimal, so an un-CAST
        # decimal mismatches here — same forcing function as the driver.
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, datetime.datetime):
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        # DuckDB DATE arrives as datetime64 midnight after .df(); Spark
        # DateType collects as datetime.date. Same instant, same token.
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def canon_frame(df: pd.DataFrame) -> list[tuple]:
    """Mirror the driver's canonicalizer on a pandas frame.

    Columns reorder by name, then ``sort_values`` over ALL columns runs
    for its side effect: with >1 column pandas takes the lexsort path
    (``Categorical`` → ``factorize``) and raises ``TypeError: unhashable
    type: 'list'`` on array cells — the exact round-7 driver failure.
    The values compared afterwards are canonical cell tokens sorted
    deterministically (mixed-type-safe), so the comparison itself does
    not depend on pandas sort-order corner cases.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0 and len(df.columns) > 1:
        df.sort_values(by=list(df.columns))  # driver-crash reproduction
    rows = [
        tuple(canon_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def spark_frame(sdf) -> pd.DataFrame:
    """Build the pandas frame the way the driver does: from collected rows
    (array columns arrive as Python lists, exactly what trips factorize)."""
    cols = sdf.columns
    return pd.DataFrame([tuple(r) for r in sdf.collect()], columns=cols)


def compare_entry(sdf, con, sql: str) -> tuple[list[str], int]:
    """Driver-shaped compare of one Spark result vs its DuckDB oracle.

    Returns ``(problems, spark_row_count)`` (empty problems = pass). This
    is THE comparison core — tests/test_entry.py and
    tools/edgecase_check.py call it too, so every tier exercises the same
    driver-bug-compatible canonicalization.
    """
    s_pdf = spark_frame(sdf)
    d_pdf = con.execute(sql).df()
    problems: list[str] = []
    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        problems.append(f"columns {sorted(s_pdf.columns)} vs {sorted(d_pdf.columns)}")
    if len(s_pdf) != len(d_pdf):
        problems.append(f"rowcount {len(s_pdf)} vs {len(d_pdf)}")
    if problems:
        return problems, len(s_pdf)
    ns = nd = None
    try:
        ns = canon_frame(s_pdf)
    except TypeError as e:
        problems.append(f"spark result not driver-canonicalizable: {e}")
    try:
        nd = canon_frame(d_pdf)
    except TypeError as e:
        problems.append(f"oracle result not driver-canonicalizable: {e}")
    if ns is not None and nd is not None and ns != nd:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(ns, nd)) if a != b)
        problems.append(
            "values differ, first at sorted-row "
            f"{diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"
        )
    return problems, len(s_pdf)


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
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            try:
                s_canon = canon_frame(spark_frame(sdf))
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL  {name}: spark result not driver-canonicalizable: {e}")
                continue
            print(
                f"ok?   {name}: rows-only check, {len(s_canon)} rows "
                f"({time.time()-t0:.1f}s)"
            )
            continue
        try:
            problems, n_rows = compare_entry(sdf, con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: error: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"PASS  {name}: {n_rows} rows ({time.time()-t0:.1f}s)")

    print(f"\n{checked - len(failures)}/{checked} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
