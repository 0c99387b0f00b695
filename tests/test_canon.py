"""Pin the local harness's canonicalizer to the DRIVER's semantics.

Round-7 lesson: the driver canonicalizes both result sets through pandas
(``DataFrame.sort_values`` over all columns → ``factorize``, which raises
``TypeError: unhashable type`` on list cells) and fetches DuckDB through
``.df()`` (un-CAST ``sum()`` → HUGEINT → float64, hashing ``123.0``
against Spark's ``123``). The old local harness fetched raw tuples and
canonicalized lists to tuples — MORE forgiving than the real check — so
five entries passed locally and failed the driver (CORRECTNESS_r07.json).

These tests pin ``tools/oracle_check.py`` to driver-bug-compatibility so
a regression toward the forgiving behavior fails the suite, plus the
mechanical catalog lints that keep the two round-7 hazard classes (bare
container columns, un-CAST widened aggregates) out of every registered
entry's checked output.
"""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from oracle_check import canon_cell, canon_frame, duck_connection  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Driver-crash classes must crash locally too
# ---------------------------------------------------------------------------


def test_canon_rejects_list_cells_multicolumn():
    """The exact round-7 driver failure shape: >=2 columns, one holding
    lists. pandas' lexsort path raises `unhashable type: 'list'`; the
    local canon must surface a TypeError, not silently tuple-ify."""
    df = pd.DataFrame({"doc_id": [1, 2], "token_ids": [[1, 2], [3]]})
    with pytest.raises(TypeError, match="unhashable"):
        canon_frame(df)


def test_canon_rejects_list_cells_single_column():
    """pandas' single-key sort does NOT crash on lists (argsort path), so
    the driver's behavior for a 1-column list frame is at best undefined —
    the local canon is deliberately STRICTER and rejects container cells
    in any shape."""
    df = pd.DataFrame({"token_ids": [[1, 2], [3]]})
    with pytest.raises(TypeError, match="unhashable"):
        canon_frame(df)


def test_canon_rejects_ndarray_cells():
    """DuckDB .df() materializes LIST columns as numpy arrays — same
    rejection."""
    df = pd.DataFrame({"a": [1, 2]})
    df["v"] = [np.array([1.0]), np.array([2.0])]
    with pytest.raises(TypeError, match="unhashable"):
        canon_frame(df)


# ---------------------------------------------------------------------------
# HUGEINT / numeric-identity semantics
# ---------------------------------------------------------------------------


def test_canon_distinguishes_int_from_float():
    """Round-1 lesson, re-confirmed by the round-7 sketch_quantile miss:
    the driver's value hash distinguishes 210 from 210.0."""
    assert canon_cell(210) != canon_cell(210.0)
    assert canon_cell(np.int64(210)) == canon_cell(210)
    assert canon_cell(np.float64(210.0)) == canon_cell(210.0)


def test_hugeint_coercion_is_visible_locally():
    """An un-CAST windowed sum() comes back HUGEINT; duckdb's .df() (the
    driver's fetch path, and now ours) coerces HUGEINT to float64, so the
    canon sees a float where Spark emits an int — the exact round-7
    sketch_quantile/sketch_quantile_merge hash mismatch. The raw-tuple
    fetch the old harness used hid this (HUGEINT -> Python int)."""
    con = duckdb.connect()
    raw = con.execute("SELECT sum(x) OVER () AS n FROM (VALUES (1),(2)) t(x)")
    df = raw.df()
    assert df["n"].dtype == np.float64
    assert canon_frame(df)[0] != canon_frame(pd.DataFrame({"n": [3]}))[0]
    cast = con.execute(
        "SELECT CAST(sum(x) OVER () AS BIGINT) AS n FROM (VALUES (1),(2)) t(x)"
    ).df()
    assert canon_frame(cast)[0] == canon_frame(pd.DataFrame({"n": [3]}))[0]


def test_canon_decimal_stays_distinct_from_float():
    """DuckDB .df() coerces DECIMAL to float64 while Spark collect() keeps
    decimal.Decimal — canon keeps Decimal as its own token so an un-CAST
    decimal output mismatches locally (forcing the established CAST AS
    DOUBLE discipline)."""
    import decimal

    assert canon_cell(decimal.Decimal("1.5")) != canon_cell(1.5)


# ---------------------------------------------------------------------------
# Engine-coercion equivalences the pandas fetch path introduces
# ---------------------------------------------------------------------------


def test_canon_null_and_nan_equivalent():
    """DuckDB NULL in a numeric column arrives as NaN after .df(); Spark
    NULL arrives as None from collect(). Same pair on the driver, so the
    canon folds them together."""
    assert canon_cell(None) == canon_cell(float("nan"))


def test_canon_nat_and_null_equivalent():
    """DuckDB NULL in a DATE/TIMESTAMP column arrives as NaT after
    .df(); Spark NULL collects as None — the temporal twin of the
    NaN==NULL rule. Without the fold, a nullable date column
    false-mismatches (('t','NaT') vs ('null',))."""
    assert canon_cell(pd.NaT) == canon_cell(None)
    con = duckdb.connect()
    d = con.execute(
        "SELECT d FROM (VALUES (DATE '1995-01-02'), (NULL)) t(d)"
    ).df()
    ns = canon_frame(d)
    nd = canon_frame(
        pd.DataFrame({"d": [datetime.date(1995, 1, 2), None]})
    )
    assert ns == nd


def test_canon_date_equals_midnight_timestamp():
    """DuckDB DATE arrives as datetime64 midnight after .df(); Spark
    DateType collects as datetime.date."""
    assert canon_cell(datetime.date(1995, 1, 2)) == canon_cell(
        pd.Timestamp("1995-01-02 00:00:00")
    )
    assert canon_cell(datetime.date(1995, 1, 2)) != canon_cell(
        pd.Timestamp("1995-01-02 00:00:01")
    )


def test_canon_float_rounds_to_6dp():
    assert canon_cell(0.1 + 0.2) == canon_cell(0.3)
    assert canon_cell(0.3000004) != canon_cell(0.3000016)


# ---------------------------------------------------------------------------
# Mechanical catalog lints (the structural prevention)
# ---------------------------------------------------------------------------


def test_every_oracle_final_select_is_container_free():
    """DESCRIBE-bind every registered oracle against the sf0.001 views and
    reject container-typed output columns (LIST/STRUCT/MAP) — the oracle
    half of the round-7 hazard. The Spark half is linted inside
    test_entry.py::test_catalog_executes_under_ansi_mode (which already
    builds every entry's DataFrame) and enforced at canon time by
    oracle_check. DESCRIBE binds without executing, so this covers all
    entries in under a second."""
    import __spark_entry__ as entrymod

    con = duck_connection(SF_DIR)
    offenders = []
    for name, sql in entrymod.oracle_sql().items():
        for col, typ in [
            (r[0], r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()
        ]:
            if "[]" in typ or "STRUCT" in typ or "MAP(" in typ:
                offenders.append((name, col, typ))
    assert not offenders, offenders
