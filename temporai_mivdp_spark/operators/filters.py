"""Filter-family operators (SURVEY.md §2.2, P1-P8).

Everything here is a plain Catalyst expression or a semi-join — filters
compile to parquet row-group skipping + whole-stage codegen, and the
semi-join broadcasts its key side when small, so none of these shuffle the
fact table unless the key set is genuinely large.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_filter(df: DataFrame, required: Sequence[str]) -> DataFrame:
    """P3: keep rows where all ``required`` columns are non-null.

    Reference: ``dropna(subset=...)`` / ``isna`` splits at
    day_intervals_cohort_v1.py:248-249,336-338 and
    icu_preprocess_util.py:181,225,270,307.
    """
    return df.na.drop(subset=list(required))


def semi_join_filter(df: DataFrame, keys: DataFrame, on: str | Sequence[str], broadcast_keys: bool = True) -> DataFrame:
    """P5/U4: keep rows of ``df`` whose key appears in ``keys``.

    Reference: the pervasive ``df[df.stay_id.isin(cohort.stay_id)]``
    pattern (day_intervals_cohort_v1.py:87,113,651;
    data_generation_icu.py:233-512). An ``isin`` against a collected list
    ships the whole list into every task; the left-semi join keeps the key
    set distributed and broadcasts it only when small.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    key_df = keys.select(*on_cols).dropDuplicates()
    if broadcast_keys:
        key_df = F.broadcast(key_df)
    return df.join(key_df, on=on_cols, how="left_semi")


def dedup(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P7: drop duplicate rows (icu_preprocess_util.py:206,252,319).

    With ``subset``, which surviving row wins is nondeterministic in both
    pandas-order-dependent code and Spark; callers needing a deterministic
    winner should use ``sorts.first_row_per_group`` instead.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def split_label_union(df: DataFrame, condition: Column, label_col: str = "label") -> DataFrame:
    """P8/U1/F9: the reference's filter-into-case/ctrl-then-concat pattern
    (day_intervals_cohort_v1.py:248-260,336-367) collapses to a single
    ``when``: no split, no union, no second scan of the input.
    """
    return df.withColumn(label_col, F.when(condition, F.lit(1)).otherwise(F.lit(0)).cast("int"))
