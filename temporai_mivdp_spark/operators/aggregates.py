"""Aggregation-family operators (SURVEY.md §2.4, A1-A10).

A1/A4/A5/A6/A10 are single ``groupBy().agg()`` calls at the call site; this
module implements the ones the reference wrote as per-group Python loops —
re-expressed as window functions so they run distributed with map-side
partial aggregation where possible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def two_level_agg(
    df: DataFrame,
    inner_keys: Sequence[str],
    outer_keys: Sequence[str],
    mean_name: str = "mean_frequency",
    count_name: str = "total_count",
) -> DataFrame:
    """A2 (+A1, J6): per-item "mean events per stay" and total count.

    Reference computes ``groupby([stay,item]).size()`` then
    ``groupby(item).mean()`` and right-merges a separate total count
    (feature_preproc_icu.py:328-339). One nested aggregation produces both
    measures — the first groupBy's shuffle already co-locates by
    ``inner_keys`` which is a superset of ``outer_keys``, so the second agg
    is cheap (and AQE coalesces its tiny output partitions).
    """
    per_inner = df.groupBy(*inner_keys).agg(F.count(F.lit(1)).alias("__n"))
    return per_inner.groupBy(*outer_keys).agg(
        F.avg("__n").alias(mean_name),
        F.sum("__n").cast("long").alias(count_name),
    )


def conditional_count(
    df: DataFrame,
    keys: Sequence[str],
    condition: Column,
    name: str = "missing_count",
) -> DataFrame:
    """A3: per-key count of rows matching ``condition`` (the
    ``amount == 0`` / ``valuenum == 0`` missing counts at
    feature_preproc_icu.py:341,375)."""
    return df.groupBy(*keys).agg(
        F.sum(F.when(condition, 1).otherwise(0)).cast("long").alias(name)
    )


def mode_vote_filter(
    df: DataFrame,
    group_key: str | Sequence[str],
    vote_col: str,
    cut_off: float = 0.95,
) -> DataFrame:
    """A7/X4: unit-of-measure majority voting (uom_conversion.py:9-26).

    Per group: if more than one distinct ``vote_col`` value exists AND the
    most frequent value's share exceeds ``cut_off``, drop rows holding
    minority values; otherwise keep all rows. The reference loops over
    ``df.itemid.unique()`` with in-place drops; here it is two window
    passes over a single shuffle by (group, vote):

    Ties for the mode break deterministically by (count desc, value asc) —
    pandas ``value_counts`` ties are insertion-order-dependent, so we pin
    an explicit total order instead of replicating nondeterminism.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    w_cnt = Window.partitionBy(*keys, vote_col)
    w_grp = Window.partitionBy(*keys)
    w_rank = Window.partitionBy(*keys).orderBy(F.col("__vcnt").desc(), F.col(vote_col).asc())
    scored = (
        df.withColumn("__vcnt", F.count(F.lit(1)).over(w_cnt))
        .withColumn("__gcnt", F.count(F.lit(1)).over(w_grp))
        .withColumn("__nvals", F.size(F.collect_set(vote_col).over(w_grp)))
        .withColumn("__rank", F.dense_rank().over(w_rank))
        .withColumn("__top_share", F.max(F.col("__vcnt")).over(w_grp) / F.col("__gcnt"))
    )
    kept = scored.filter(
        (F.col("__nvals") == 1)
        | (F.col("__top_share") <= cut_off)
        | (F.col("__rank") == 1)
    )
    return kept.drop("__vcnt", "__gcnt", "__nvals", "__rank", "__top_share")


def winsorize(
    df: DataFrame,
    group_key: str | Sequence[str],
    value_col: str,
    lower_pct: float,
    upper_pct: float,
    impute: bool = False,
) -> DataFrame:
    """A8/X3: per-group percentile outlier handling
    (outlier_removal.py:11-37; called feature_preproc_icu.py:257-279).

    ``impute=True``: clip values into [p_lower, p_upper] (winsorize).
    ``impute=False``: null out-of-range values and drop them.

    Uses EXACT linear-interpolated percentiles (``F.percentile``) to match
    numpy's default and the DuckDB oracle's ``quantile_cont`` —
    ``percentile_approx`` would diverge at parity scale. Computed as a
    groupBy + broadcast join-back rather than a window: the per-group
    bounds table is tiny (one row per itemid), so the fact table is
    touched once and never re-sorted.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    v = F.col(value_col)
    bounds = df.groupBy(*keys).agg(
        F.percentile(v, F.lit(lower_pct / 100.0)).alias("__lo"),
        F.percentile(v, F.lit(upper_pct / 100.0)).alias("__hi"),
    )
    joined = df.join(F.broadcast(bounds), on=keys, how="left")
    if impute:
        out = joined.withColumn(
            value_col,
            F.when(v < F.col("__lo"), F.col("__lo"))
            .when(v > F.col("__hi"), F.col("__hi"))
            .otherwise(v),
        )
    else:
        out = joined.filter((v >= F.col("__lo")) & (v <= F.col("__hi")))
    return out.drop("__lo", "__hi")


def group_mean_impute(
    df: DataFrame,
    group_key: str | Sequence[str],
    value_col: str,
    out_col: str | None = None,
    stat: str = "mean",
) -> DataFrame:
    """A9: fill nulls with the group mean/median
    (data_generation_icu.py:659-667,872-880). Window aggregate + coalesce —
    one shuffle by group key, no join."""
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    w = Window.partitionBy(*keys)
    fill = F.avg(value_col).over(w) if stat == "mean" else F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    return df.withColumn(out_col or value_col, F.coalesce(F.col(value_col), fill))
