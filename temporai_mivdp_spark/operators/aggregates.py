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


#: GK sketch accuracy for the bracket pass of the exact winsorize tier
#: (relative rank error = 1/accuracy, a DETERMINISTIC Greenwald-Khanna
#: bound, not probabilistic). At 1e4 the strictly-between candidate set
#: is <= ~34/accuracy of each group (~0.34%); raise at extreme scale to
#: shrink it further (cost: sketch buffers grow linearly).
_WINSORIZE_ACCURACY = 10_000

#: Groups at or below this size skip the bracket arithmetic entirely and
#: recover order statistics from the whole (bounded) group — also the
#: regime where the sketch's rank guarantee is coarser than one rank, so
#: the bracket path is only ever used where its margin provably covers
#: the target ranks (see _exact_bounds_by_selection).
_WINSORIZE_SMALL_N = 4096

#: Inputs at or below this many non-null rows take the round-11 window
#: plan (one sort into #groups partitions) instead of the two-pass
#: selection. Round-12 measured the crossover on the 32-split synthetic
#: lineitem (tools/exp_a8_selection_ab.py, interleaved min-of-5,
#: hash-identical results): 600k rows window 0.910 / selection 0.971;
#: 6M rows 6.98 / 7.47; 18M rows 16.04 / 8.42; 60M rows 78.09 / 13.72.
#: The gate sits at the measured parity point — below it the sort
#: provably wins (the selection plan's fixed two-aggregate tax costs
#: more than sorting the whole input), above it the per-group sort wall
#: compounds per decade while selection stays near linear. The gate is
#: SCALE-ADAPTIVE by construction (it compares the observed input size,
#: one cheap count at plan-build time, never a constant tuned to a core
#: count), and both tiers return bit-identical bounds (r12 §a8selection
#: equivalence evidence), so the choice is invisible in results.
_WINSORIZE_SORT_GATE_ROWS = 6_000_000

#: Ceiling for the adaptive GK accuracy: percentile_approx buffers grow
#: ~linearly with accuracy, so past this point a tighter sketch costs
#: more memory than the pass-2 candidate set it saves. At the cap the
#: strictly-between multiset is <= 34n/2e5 = 0.017% of each group —
#: per-group row counts up to ~1.2e10 keep the single-row collect_list
#: buffer under ~2M entries (16 MB); the ceiling is documented in
#: SCALING.md (a8 scale notes).
_WINSORIZE_ACCURACY_CAP = 200_000


def _adaptive_accuracy(n_total: int) -> int:
    """GK accuracy derived from the observed input size (r12-verdict
    item: the pass-2 collect_list bound must be absolute, not relative).
    34*n/accuracy entries per group-cut with accuracy = n/30_000 keeps
    the candidate multiset <= ~1M entries REGARDLESS of n (any group's
    n is <= n_total, so n_total is a valid conservative bound), until
    the cap where sketch memory takes over (see
    _WINSORIZE_ACCURACY_CAP)."""
    return max(_WINSORIZE_ACCURACY, min(_WINSORIZE_ACCURACY_CAP, n_total // 30_000))


def _exact_bounds_by_window(
    dfnn: DataFrame,
    keys: Sequence[str],
    p_lo: float,
    p_hi: float,
) -> DataFrame:
    """Per-group EXACT linear-interpolated percentile bounds via the
    round-11 rank-window plan: one sort of each group's rows
    (row_number over partitionBy(keys) orderBy(v)), the target order
    statistics read off the two adjacent ranks, interpolated with the
    same IEEE expression the selection tier evaluates. Below
    _WINSORIZE_SORT_GATE_ROWS this is the cheaper plan — a single
    Tungsten radix sort beats the selection tier's two full aggregate
    passes (+ sketch inserts) until the per-group sort becomes the
    scaling wall (measured crossover in the gate's docstring)."""
    w_rank = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
    w_grp = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = dfnn.withColumn("__rn", F.row_number().over(w_rank) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(w_grp)
    )

    def order_stats(p: float, out: str):
        idx = (F.col("__n") - 1) * F.lit(p)
        lo_i, hi_i = F.floor(idx), F.ceil(idx)
        return [
            F.max(F.when(F.col("__rn") == lo_i, F.col("__v"))).alias(f"__{out}_vl"),
            F.max(F.when(F.col("__rn") == hi_i, F.col("__v"))).alias(f"__{out}_vh"),
            F.max(idx - lo_i).alias(f"__{out}_frac"),
        ]

    stats = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__n") - 1) * F.lit(p_lo)))
        | (F.col("__rn") == F.ceil((F.col("__n") - 1) * F.lit(p_lo)))
        | (F.col("__rn") == F.floor((F.col("__n") - 1) * F.lit(p_hi)))
        | (F.col("__rn") == F.ceil((F.col("__n") - 1) * F.lit(p_hi)))
    ).groupBy(*keys).agg(*order_stats(p_lo, "lo"), *order_stats(p_hi, "hi"))
    return stats.select(
        *keys,
        (
            F.col("__lo_vl")
            + (F.col("__lo_vh") - F.col("__lo_vl")) * F.col("__lo_frac")
        ).alias("__lo"),
        (
            F.col("__hi_vl")
            + (F.col("__hi_vh") - F.col("__hi_vl")) * F.col("__hi_frac")
        ).alias("__hi"),
    )


def _exact_bounds_by_selection(
    dfnn: DataFrame,
    keys: Sequence[str],
    p_lo: float,
    p_hi: float,
    accuracy: int = _WINSORIZE_ACCURACY,
    small_n: int = _WINSORIZE_SMALL_N,
) -> DataFrame:
    """Per-group EXACT linear-interpolated percentile bounds (__lo, __hi)
    with no per-group sort — a two-pass distributed selection.

    Pass 1 (one map-side-combined aggregate): per group, ``count``,
    ``min``, ``max`` and a GK quantile sketch queried at
    ``p +- 16/accuracy`` around each cut. Greenwald-Khanna's rank error
    is DETERMINISTIC (<= n/accuracy, preserved under partial-aggregate
    merge), so for n > small_n the two returned values provably bracket
    the target order statistics: the low query point sits
    ``15n/accuracy >= 6`` ranks below ``floor((n-1)p)`` and the high one
    symmetrically above ``ceil((n-1)p)`` (slack needed: ~3 ranks for the
    ceil-vs-floor and n-vs-(n-1) rounding). Clamped query points (p at
    0 or 1) use the exact min/max columns instead of trusting the
    sketch's edge behavior.

    Pass 2 (one more aggregate over a broadcast-stats join): per group
    and cut, fixed-width counts of rows below/equal to each bracket and
    a ``sort_array(collect_list)`` of the strictly-between rows — a
    multiset whose size is rank-bounded by the brackets at
    <= ~34n/accuracy entries (0.34% at the default), NOT
    corpus-proportional; groups at or below ``small_n`` collect the
    whole group (bounded by the constant) and zero the counts. The
    target order statistics are then pure row-local rank arithmetic:
    rank < |<L| is impossible (``raise_error`` guard — a bracket
    violation fails LOUDLY, never silently unclamped), ranks inside
    L's/H's tie runs return L/H, ranks between index into the sorted
    between-multiset.

    Replaces the round-11 window plan (row_number over
    partitionBy(group) — a full sort of every group's rows into
    #groups reducer partitions, the structural single-task wall at
    low-cardinality group keys): every stage here is a hash aggregate
    with map-side combine, so the exact tier now scales like the
    approx tier while returning bit-identical bounds (validated
    against the window plan across adversarial distributions — ties at
    the cut, all-equal groups, n=1/2, integer types, p in {0, 1}).
    """
    eps = 1.0 / accuracy
    margin = 16 * eps
    pts = [
        max(0.0, p_lo - margin), min(1.0, p_lo + margin),
        max(0.0, p_hi - margin), min(1.0, p_hi + margin),
    ]
    stats = dfnn.groupBy(*keys).agg(
        F.count("__v").alias("__n"),
        F.min("__v").alias("__vmn"),
        F.max("__v").alias("__vmx"),
        F.percentile_approx(
            "__v", F.array(*[F.lit(x) for x in pts]), F.lit(accuracy)
        ).alias("__q"),
    )

    def bracket(i: int, pt: float) -> Column:
        if pt <= 0.0:
            return F.col("__vmn")
        if pt >= 1.0:
            return F.col("__vmx")
        # clamp into [min, max]: a no-op under the sketch contract, and
        # it keeps the count arithmetic total even off-contract
        return F.greatest(
            F.col("__vmn"), F.least(F.col("__vmx"), F.element_at("__q", i + 1))
        )

    stats = stats.select(
        *keys, "__n",
        bracket(0, pts[0]).alias("__L_lo"), bracket(1, pts[1]).alias("__H_lo"),
        bracket(2, pts[2]).alias("__L_hi"), bracket(3, pts[3]).alias("__H_hi"),
    )
    probe = dfnn.join(F.broadcast(stats), list(keys))
    v = F.col("__v")
    use_all = F.col("__n") <= small_n

    def cnt(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    carry = ["__n", "__L_lo", "__H_lo", "__L_hi", "__H_hi"]
    aggs = []
    for tag in ("lo", "hi"):
        L, H = F.col(f"__L_{tag}"), F.col(f"__H_{tag}")
        aggs += [
            cnt(~use_all & (v < L)).alias(f"__lt_L_{tag}"),
            cnt(~use_all & (v == L)).alias(f"__eq_L_{tag}"),
            cnt(~use_all & (v == H)).alias(f"__eq_H_{tag}"),
            F.sort_array(
                F.collect_list(F.when(use_all | ((v > L) & (v < H)), v))
            ).alias(f"__B_{tag}"),
        ]
    # brackets/count are functionally dependent on the keys: grouping by
    # them too just carries them through without first() aggregates
    g2 = probe.groupBy(*keys, *carry).agg(*aggs)
    vtype = dfnn.schema["__v"].dataType

    def value_at(r: Column, tag: str) -> Column:
        base = F.col(f"__lt_L_{tag}") + F.col(f"__eq_L_{tag}")
        b = F.col(f"__B_{tag}")
        err = F.raise_error(
            F.concat(
                F.lit("winsorize: selection bracket violated at rank "),
                r.cast("string"),
            )
        ).cast(vtype)
        return (
            F.when(r < F.col(f"__lt_L_{tag}"), err)
            .when(r < base, F.col(f"__L_{tag}"))
            .when(r < base + F.size(b), F.element_at(b, (r - base + 1).cast("int")))
            .when(r < base + F.size(b) + F.col(f"__eq_H_{tag}"), F.col(f"__H_{tag}"))
            .otherwise(err)
        )

    outs = []
    for tag, p in (("lo", p_lo), ("hi", p_hi)):
        idx = (F.col("__n") - 1) * F.lit(p)
        vl = value_at(F.floor(idx), tag)
        vh = value_at(F.ceil(idx), tag)
        # lower + (higher - lower) * frac — the same interpolation
        # F.percentile / numpy linear / quantile_cont apply, and the
        # identical IEEE expression the window plan evaluated
        outs.append((vl + (vh - vl) * (idx - F.floor(idx))).alias(f"__{tag}"))
    return g2.select(*keys, *outs)


def winsorize(
    df: DataFrame,
    group_key: str | Sequence[str],
    value_col: str,
    lower_pct: float,
    upper_pct: float,
    impute: bool = False,
    exact: bool = True,
    exact_sort_gate_rows: int = _WINSORIZE_SORT_GATE_ROWS,
) -> DataFrame:
    """A8/X3: per-group percentile outlier handling
    (outlier_removal.py:11-37; called feature_preproc_icu.py:257-279).

    ``impute=True``: clip values into [p_lower, p_upper] (winsorize).
    ``impute=False``: null out-of-range values and drop them.

    ``exact=True`` computes linear-interpolated exact percentiles
    (numpy's default / DuckDB ``quantile_cont`` — required for oracle
    parity). Two bit-identical tiers, chosen by a size gate (one cheap
    count at plan-build time — r13; crossover measurements in
    ``_WINSORIZE_SORT_GATE_ROWS``'s docstring):

    * at or below the gate: the rank-window plan
      (``_exact_bounds_by_window``) — one Tungsten radix sort, the
      cheapest exact plan while every group's rows sort in one task's
      memory budget;
    * above it: GK-bracketed distributed selection
      (``_exact_bounds_by_selection``) — two map-side-combined
      aggregation passes, no per-group sort anywhere, with the sketch
      accuracy derived from the observed input size
      (``_adaptive_accuracy``) so the pass-2 candidate buffer is
      absolutely bounded, and the small-group threshold derived from
      that accuracy so the bracket guarantee always covers the target
      ranks (accuracy/5 + 1; the guarantee needs 15n/accuracy >= ~3
      ranks of slack).

    History: ``F.percentile`` was rejected in round 4 (~4x slower — a
    TypedImperativeAggregate whose partial buffers hold EVERY value,
    concatenated not merged across the shuffle); rounds 4-11 shipped
    the window plan alone, whose structural limit was the sort of
    every group's rows into #groups reducer partitions — at a 3-value
    group key that is 1/3 of the data per task no matter the cluster;
    round 12 shipped the selection plan alone, which paid a fixed
    two-pass tax below the crossover (driver-measured 0.59x at sf0.1).
    The gate keeps both regimes at their measured best. ``exact=False``
    remains the cheapest tier: one ``percentile_approx`` pass, bounded
    rank error, for callers that don't need oracle-exact cuts.

    NaN discipline: ``exact=True`` assumes the value column is NaN-free
    (nulls are the missing-data representation throughout the engine
    and are filtered here; every catalog/mivdp caller satisfies this).
    NaN breaks the selection tier's rank arithmetic — all bracket
    comparisons are false for NaN, so with enough NaNs the loud
    ``raise_error`` guard fires rather than a silent wrong answer.
    """
    keys = [group_key] if isinstance(group_key, str) else list(group_key)
    v = F.col(value_col)
    if exact:
        dfnn = df.filter(v.isNotNull()).select(*keys, v.alias("__v"))
        # Size gate (r12-verdict item 3a): one count at plan-build time
        # picks the provably-cheaper exact tier. The count is a
        # column-pruned aggregate job (not a result cache — each build
        # recomputes it from the input), deterministic in the data, and
        # the two tiers are result-identical, so the gate can never
        # change what the query computes.
        n_total = dfnn.count()
        if n_total <= exact_sort_gate_rows:
            bounds = _exact_bounds_by_window(
                dfnn, keys, lower_pct / 100.0, upper_pct / 100.0
            )
        else:
            accuracy = _adaptive_accuracy(n_total)
            bounds = _exact_bounds_by_selection(
                dfnn,
                keys,
                lower_pct / 100.0,
                upper_pct / 100.0,
                accuracy=accuracy,
                small_n=max(_WINSORIZE_SMALL_N, accuracy // 5 + 1),
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
