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
    single_exchange: bool = True,
) -> DataFrame:
    """A2 (+A1, J6): per-item "mean events per stay" and total count.

    Reference computes ``groupby([stay,item]).size()`` then
    ``groupby(item).mean()`` and right-merges a separate total count
    (feature_preproc_icu.py:328-339). One nested aggregation produces both
    measures.

    ``single_exchange=True`` (default) pre-partitions the narrow key
    projection by ``outer_keys``: hash-partitioning on the outer keys
    satisfies ClusteredDistribution for BOTH groupBys (all rows of an
    outer key are co-located, hence all (outer, inner) pairs too), so the
    whole two-level aggregation runs in one shuffle. The trade is losing
    map-side combine on the first level — a good trade exactly when inner
    keys are near-unique per row (stay×item event groups: partial
    aggregation barely shrinks the shuffle, so shipping raw narrow rows
    once beats shipping partials twice; measured 0.44s vs 0.70s at
    sf0.1). Set ``single_exchange=False`` for inputs with heavy row-level
    duplication of inner keys (map-side combine pays again) or a skewed
    outer key (the two-level shuffle spreads a hot outer key over its
    inner keys first).
    """
    if single_exchange:
        df = df.select(*dict.fromkeys([*inner_keys, *outer_keys])).repartition(
            *outer_keys
        )
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

    Null semantics match the reference exactly: ``value_counts()`` skips
    NaN, so null votes never form the mode and count toward the group
    total only in the denominator; when the vote fires, null-vote rows
    are dropped along with the minority (``values != most_frequent`` is
    True for NaN), and when it doesn't fire they are kept.

    Plan: ONE aggregation of the facts to the tiny (group, value, count)
    table — null votes included as their own row so the group total
    needs no second scan — then every per-group statistic (total, number
    of distinct non-null values, mode, top count) comes from windows
    sharing that table's single (group) partitioning, and the verdicts
    broadcast-join back. The fact table is scanned twice (aggregate +
    join), aggregated once, and never window-sorted; the previous form
    scanned it three times, aggregated it twice (counts + totals), and
    instantiated the counts subtree once per consumer — exchange reuse
    does not deduplicate repeated subplans (measured on the dedup
    operators), so fused-window is the shape that survives scale.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    counts = df.groupBy(*keys, vote_col).agg(F.count(F.lit(1)).alias("__vcnt"))
    w_part = Window.partitionBy(*keys)
    # nulls ordered last: the mode (rank 1) is non-null whenever any
    # non-null vote exists, matching value_counts() skipping NaN
    w_rank = w_part.orderBy(
        F.col(vote_col).isNull().asc(), F.col("__vcnt").desc(), F.col(vote_col).asc()
    )
    stats = (
        counts.withColumn("__rank", F.row_number().over(w_rank))
        .withColumn("__gtotal", F.sum("__vcnt").over(w_part))
        .withColumn(
            "__nvals",
            F.sum(F.when(F.col(vote_col).isNotNull(), 1).otherwise(0)).over(w_part),
        )
    )
    verdict = stats.filter(F.col("__rank") == 1).select(
        *keys,
        F.col(vote_col).alias("__mode"),
        (
            (F.col("__nvals") > 1)
            & (F.col("__vcnt") / F.col("__gtotal") > cut_off)
        ).alias("__fire"),
    )
    joined = df.join(F.broadcast(verdict), on=keys, how="left")
    # groups with zero rows of any kind have no verdict row -> never fire
    fired = F.coalesce(F.col("__fire"), F.lit(False))
    kept = joined.filter((~fired) | (F.col(vote_col) == F.col("__mode")))
    return kept.drop("__mode", "__fire")


def winsorize(
    df: DataFrame,
    group_key: str | Sequence[str],
    value_col: str,
    lower_pct: float,
    upper_pct: float,
    impute: bool = False,
    exact: bool = True,
) -> DataFrame:
    """A8/X3: per-group percentile outlier handling
    (outlier_removal.py:11-37; called feature_preproc_icu.py:257-279).

    ``impute=True``: clip values into [p_lower, p_upper] (winsorize).
    ``impute=False``: null out-of-range values and drop them.

    ``exact=True`` computes linear-interpolated exact percentiles
    (numpy's default / DuckDB ``quantile_cont`` — required for oracle
    parity) via a rank-selection plan: window row_number sorts the
    values within each group (Tungsten radix sort, spill-safe), the
    <=2 order statistics per cut are filtered out, and a 4-row-per-group
    aggregate interpolates. Measured ~4x faster than ``F.percentile``
    at sf0.1: the builtin is a TypedImperativeAggregate whose partial
    buffers hold EVERY value — the map-side "combine" just concatenates
    serialized buffers, so the whole column crosses the shuffle as fat
    java-serialized blobs and each group sorts single-threaded in the
    reducer. The window path shuffles the same rows but columnar, and
    keeps whole-stage codegen. At 100 TB set ``exact=False``:
    ``percentile_approx`` keeps a bounded sketch per group (truly
    map-side combined) at the cost of bounded rank error; one
    partial-agg pass, no sort.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    v = F.col(value_col)
    if exact:
        w_rank = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
        # group size over the SAME (partition, order) spec with an
        # unbounded frame — merges into the one Window node / one sort
        # (a spec without the orderBy would plan a second Window pass)
        w_grp = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ranked = (
            df.filter(v.isNotNull())  # percentile skips nulls
            .select(*keys, v.alias("__v"))
            .withColumn("__rn", F.row_number().over(w_rank) - 1)
            .withColumn("__n", F.count(F.lit(1)).over(w_grp))
        )

        def order_stats(p: float, out: str) -> list[Column]:
            idx = (F.col("__n") - 1) * F.lit(p)
            lo_i, hi_i = F.floor(idx), F.ceil(idx)
            return [
                F.max(F.when(F.col("__rn") == lo_i, F.col("__v"))).alias(f"__{out}_vl"),
                F.max(F.when(F.col("__rn") == hi_i, F.col("__v"))).alias(f"__{out}_vh"),
                F.max(idx - lo_i).alias(f"__{out}_frac"),
            ]

        p_lo, p_hi = lower_pct / 100.0, upper_pct / 100.0
        stats = ranked.filter(
            (F.col("__rn") == F.floor((F.col("__n") - 1) * p_lo))
            | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_lo))
            | (F.col("__rn") == F.floor((F.col("__n") - 1) * p_hi))
            | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_hi))
        ).groupBy(*keys).agg(*order_stats(p_lo, "lo"), *order_stats(p_hi, "hi"))
        # lower + (higher - lower) * frac — the same interpolation
        # F.percentile / numpy linear / quantile_cont apply
        bounds = stats.select(
            *keys,
            (F.col("__lo_vl") + (F.col("__lo_vh") - F.col("__lo_vl")) * F.col("__lo_frac")).alias("__lo"),
            (F.col("__hi_vl") + (F.col("__hi_vh") - F.col("__hi_vl")) * F.col("__hi_frac")).alias("__hi"),
        )
    else:
        bounds = df.groupBy(*keys).agg(
            F.percentile_approx(v, F.lit(lower_pct / 100.0), F.lit(10_000)).alias("__lo"),
            F.percentile_approx(v, F.lit(upper_pct / 100.0), F.lit(10_000)).alias("__hi"),
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
