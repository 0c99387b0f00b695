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
    plain shuffle join.
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
