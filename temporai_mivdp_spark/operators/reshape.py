"""Pivot / reshape / encode operators (SURVEY.md §2.9, R1-R4).

The engine keeps data LONG (stay, hour, itemid, value) as deep into the
plan as possible — wide matrices are a presentation format. When a pivot is
required, the column vocabulary is passed explicitly (it is already known
from the dimension aggregates) so Spark skips the extra distinct() scan a
vocabulary-less ``pivot`` would run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    index: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    prefix: str = "",
) -> DataFrame:
    """R1/R4: long -> wide with an explicit column vocabulary
    (data_generation_icu.py:647-649,736-739; MultiIndex prefixing
    :734,772-782 becomes a flat name prefix)."""
    pivoted = df.groupBy(*index).pivot(pivot_col, list(values)).agg(agg)
    if prefix:
        for v in values:
            pivoted = pivoted.withColumnRenamed(str(v), f"{prefix}{v}")
    return pivoted


def one_hot(
    df: DataFrame,
    index: str | Sequence[str],
    category_col: str,
    categories: Sequence[str],
    prefix: str = "",
) -> DataFrame:
    """R2: one-hot encode after dedup (the condition pivot at
    data_generation_icu.py:913-921) — max(when) per category, 0-filled."""
    keys = [index] if isinstance(index, str) else list(index)
    aggs = [
        F.max(F.when(F.col(category_col) == F.lit(c), 1).otherwise(0)).alias(f"{prefix}{c}")
        for c in categories
    ]
    return df.groupBy(*keys).agg(*aggs)


def multi_label_one_hot(
    df: DataFrame,
    index: str | Sequence[str],
    array_col: str,
    labels: Sequence[str],
    prefix: str = "",
) -> DataFrame:
    """R3: MultiLabelBinarizer equivalent (icu_preprocess_util.py:448-460)
    without scikit-learn: ``array_contains`` per known label. For unknown
    vocabularies, explode + one_hot instead."""
    keys = [index] if isinstance(index, str) else list(index)
    cols = [F.col(c) for c in keys] + [
        F.array_contains(F.col(array_col), l).cast("int").alias(f"{prefix}{l}") for l in labels
    ]
    return df.select(*cols)
