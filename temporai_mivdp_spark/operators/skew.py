"""Skew-mitigation utilities.

AQE's skew-join splitting (on in session.DEFAULT_CONFS) handles most
cases at runtime. Salting is the explicit fallback for the pathological
shapes AQE can't fix — e.g. an aggregation where one key holds a double-
digit percentage of all rows, or a join against a side AQE won't split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 16,
    count_name: str = "n",
) -> DataFrame:
    """Two-stage count for skew-heavy keys: count per (key, salt) —
    spreading one hot key over ``salt_buckets`` reducers — then sum the
    partials. The salt is a deterministic hash of the full row spread,
    not rand(), so retries and recomputation are stable.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__pc"))
    return partial.groupBy(*keys).agg(F.sum("__pc").cast("long").alias(count_name))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: replicate the (small) ``dim`` side once per salt
    bucket and scatter the fact side's hot keys across buckets, so one hot
    key's rows land on ``salt_buckets`` reducers instead of one.

    Prefer ``F.broadcast(dim)`` when dim fits in memory — salting is for
    the middle ground: dim too big to broadcast, facts too skewed for a
    plain shuffle join. That band is NARROW: replication multiplies the
    dim by ``salt_buckets``, and at a 15M-row dim with 32 salts the
    480M-row build side measured 4.9x SLOWER than the unmitigated skew
    (SCALING.md round 12). For large dims use ``skew_split_join`` —
    broadcast only the hot keys' dim rows — which measured 0.24x of
    plain at the same cell.
    """
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in facts.columns]), F.lit(salt_buckets))
    )
    exploded_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_facts.join(exploded_dim, on=[on, "__salt"], how=how).drop("__salt")


def top_heavy_keys(
    df: DataFrame, keys: Sequence[str], min_share: float = 0.01, sample: float | None = 0.01
) -> DataFrame:
    """Diagnostic: keys holding more than ``min_share`` of (sampled) rows
    — run before a big join to decide whether salting is warranted."""
    base = df.sample(sample) if sample else df
    total = base.count()
    return (
        base.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("share", F.col("n") / F.lit(float(max(total, 1))))
        .filter(F.col("share") >= min_share)
        .orderBy(F.col("n").desc())
    )


def skew_split_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: Sequence | None = None,
    min_share: float = 0.05,
    sample: float | None = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Hybrid skew join (round 12): HOT keys take a broadcast join of
    their (few) dim rows, COLD keys take the plain shuffle join — the
    standard split-hot-keys pattern, and the right tool when the dim is
    too big to broadcast whole AND too big to replicate per salt bucket.

    ``salted_join`` replicates the ENTIRE dim once per salt bucket; at a
    15M-row dim and 32 salts that is a 480M-row build side — measured
    (SCALING.md round 12) costlier than the skew it cures. This join
    replicates NOTHING: the cold side is the join Spark would run
    anyway minus the one pathological key, and the hot side broadcasts
    only the dim rows of the hot keys (by construction a handful — keys
    hot enough to matter are few, or they would not be skew).

    ``hot_keys``: the skewed key values. Pass them when known (a crawl
    pipeline usually knows its bot/canonical ids); otherwise they are
    detected with ``top_heavy_keys`` over a ``sample`` of the facts —
    one extra sampled pass, same driver-small contract (keys over
    ``min_share`` of rows; more than 1/min_share of them cannot exist).
    Detection is advisory only — a missed hot key degrades to the plain
    join's distribution, never to a wrong result, because the split is
    exhaustive and exact for whatever key list is used.

    Supports ``inner`` and ``left`` joins (the fact-preserving shapes a
    fact-to-dim enrichment uses); both sides of the split carry the
    same semantics, so the union is the plain join's row set exactly.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_split_join supports inner/left, got {how!r}: a "
            "right/outer join's unmatched-dim rows would need cross-"
            "split reconciliation the split cannot express"
        )
    if hot_keys is None:
        hot_keys = [
            r[on]
            for r in top_heavy_keys(
                facts, [on], min_share=min_share, sample=sample
            ).collect()
        ]
    hot_keys = list(hot_keys)
    if not hot_keys:
        return facts.join(dim, on=on, how=how)
    hot_facts = facts.filter(F.col(on).isin(hot_keys))
    cold_facts = facts.filter(~F.col(on).isin(hot_keys))
    hot_dim = dim.filter(F.col(on).isin(hot_keys))
    cold = cold_facts.join(dim, on=on, how=how)
    hot = hot_facts.join(F.broadcast(hot_dim), on=on, how=how)
    return cold.unionByName(hot)
