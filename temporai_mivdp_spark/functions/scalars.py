"""Scalar helpers — Catalyst expressions only (SURVEY.md §2.8).

F1  to_timestamp casts            -> F.to_timestamp / .cast("timestamp")
F2  interval arithmetic/compare   -> timestamp minus + INTERVAL literals
F3  year extraction               -> F.year
F4  timedelta string-split math   -> replaced by timeseries.floor_hours
F5  prefix/suffix slicing         -> F.substring
F6  lower                         -> F.lower
F7  contains                      -> Column.contains / rlike
F8  to_numeric(errors=coerce)     -> cast (non-ANSI: invalid -> NULL)
F9  np.where ternary              -> F.when/otherwise
F10 fillna constants              -> na.fill / coalesce
F11 clamp                         -> least/greatest (below)
F12 astype casts                  -> cast
F13 literal_eval list parse       -> from_json (below)
F14 ones/zeros literal columns    -> F.lit
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_micros(col: Column) -> Column:
    """Microseconds since the epoch for TIMESTAMP *and* TIMESTAMP_NTZ.

    ``unix_micros`` only accepts TIMESTAMP (with local time zone);
    parquet files whose timestamps carry no zone (``timestamp[us]``, as
    the testdata tables do) load as TIMESTAMP_NTZ. The cast is a no-op
    for TIMESTAMP and interprets NTZ wall-clock in the session time
    zone. In interval arithmetic the zone offsets cancel only when the
    session zone is a FIXED offset — under a DST-observing zone two
    operands straddling a transition pick up different offsets and the
    interval shifts by an hour — which is why session.py pins the
    session time zone to UTC; keep it pinned.

    This is the single home for the NTZ-accepting cast (floor_days,
    floor_hours, epoch_seconds all route through here or mirror it) so
    the handling can't drift between call sites.
    """
    return F.unix_micros(col.cast("timestamp"))


def epoch_seconds(col: Column) -> Column:
    """Whole seconds since the epoch, NTZ-accepting (see
    ``epoch_micros``). Truncates toward zero like ``unix_timestamp``
    does for non-negative epochs — use only where second precision is
    the contract."""
    return F.floor(epoch_micros(col) / F.lit(1_000_000)).cast("long")


def clamp(col: Column, lo: Column | float | None = None, hi: Column | float | None = None) -> Column:
    """F11: clip a column into [lo, hi] (the reference's
    ``stop_time > los -> los`` / ``start < 0 -> 0`` fixes at
    data_generation_icu.py:384,409,443,484)."""
    out = col
    if lo is not None:
        out = F.greatest(out, lo if isinstance(lo, Column) else F.lit(lo))
    if hi is not None:
        out = F.least(out, hi if isinstance(hi, Column) else F.lit(hi))
    return out


def floor_days(later: Column, earlier: Column) -> Column:
    """F2/W1 (non-ICU variant): whole-day difference — the reference keeps
    only the days component for hospital-admission cohorts
    (day_intervals_cohort_v1.py:104-105)."""
    return F.floor(
        (epoch_micros(later) - epoch_micros(earlier)) / F.lit(86_400_000_000)
    ).cast("long")


def to_number(col: Column) -> Column:
    """F8: ``pd.to_numeric(errors="coerce")`` — with ANSI off, a cast to
    double yields NULL on malformed input, the same contract."""
    return col.cast("double")


def parse_string_list(col: Column) -> Column:
    """F13: parse a stringified list (``ast.literal_eval`` at
    icu_preprocess_util.py:449) into ArrayType(String). Single-quoted
    Python reprs are normalized to JSON first."""
    return F.from_json(F.regexp_replace(col, "'", '"'), "array<string>")
