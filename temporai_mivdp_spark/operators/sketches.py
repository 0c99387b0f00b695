"""Deterministic, engine-portable sketching: distinct counts and
quantiles as mergeable, oracle-checkable state.

``corpus_stats`` (llmdata/text.py) answers "how big / how duplicated is
this corpus" with HyperLogLog++ (``approx_count_distinct``) — the right
production default, but its estimate is engine-private: no other system
can reproduce the number, so it can only ever be rows-checked. This
module is the ORACLE-CHECKABLE twin: a bucketed-minimum (KMV-family)
distinct sketch built from nothing but ``md5``, ``min``, ``sum`` and
``ln``. The SKETCH STATE (hashes, minima, occupancy, their sums) is
exact integers on every engine; the estimate applies at most one ``ln``
to those exact integers, and engine ``ln`` implementations agree to
within 1 ulp (JVM Math.log is spec-bound to 1 ulp; C libm is correctly
rounded) — six orders of magnitude inside the harness's 6-decimal float
canonicalization. So Spark, DuckDB, or a downstream warehouse reading
the persisted sketch rows all derive the same estimate.

Sketch: hash each key to a uniform 52-bit integer (13 hex chars of md5 —
exactly representable in a double AND in every engine's bigint), route it
to one of ``n_buckets`` sub-streams by independent hash bits (the
"stochastic averaging" of Flajolet-Martin/PCSA and HyperLogLog), and keep
per (group, bucket) only ``min(hash)``. Estimation:

- full occupancy (every bucket saw a key): the minimum of ``n`` uniforms
  on ``[0, W)`` sits near ``W/(n+1)``, so each bucket minimum measures
  its sub-stream's density; the harmonic combination
  ``k·(k-1)·W / Σ min_i`` estimates the total (relative error ≈ 1/√k) —
  summing the ``k`` exact integer minima first (order-independent, exact
  in int64 for k ≤ 2^11) is what makes the estimate reproducible, where
  a sum of per-bucket double reciprocals would be summation-order-
  dependent.
- partial occupancy (n comparable to k): bucket minima are too noisy,
  but occupancy itself is a textbook estimator (linear counting /
  Whang et al.): ``-k·ln(1 - occupied/k)``. With ``k`` a power of two,
  ``occupied/k`` is an exact double and both engines feed ``ln`` the
  same bits.

Why this shape at 100 TB: the sketch is ONE ``groupBy(group, bucket).
min()`` — map-side combinable, shuffle ≤ groups × k rows regardless of
input size, no sort anywhere — and ``min`` is associative, so sketches
are MERGEABLE: per-partition/per-day sketch rows can be persisted and
folded later (``merge_sketches``) without rescanning the corpus —
exactly how an incremental ingest keeps a running distinct count.
hash-prefix trick shared with the catalog oracles (queries_llm.py module
docstring): Spark ``conv(substr(md5(x),1,13),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,13))::BIGINT``.

No reference counterpart (the reference's tabular pipeline never
estimates cardinality); this is a beyond-reference addition per
SURVEY.md §2's scale-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash domain: 13 hex chars = 52 bits — the largest md5 prefix that is
#: exactly representable as an integer-valued double (≤ 2^53) in every
#: engine, so density arithmetic never rounds
HASH_WIDTH = 1 << 52


def _hash52(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key), 1, 13), 16, 10).cast("long")


def _bucket(key: Column, n_buckets: int) -> Column:
    # independent bits (chars 14-17) so bucket routing is uncorrelated
    # with the 52-bit value; pmod of a 16-bit hash is deterministic and
    # its bias (65536 % k buckets get one extra 1/65536 share) is far
    # below the estimator's own 1/√k error
    return F.pmod(
        F.conv(F.substring(F.md5(key), 14, 4), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")


def bucket_min_sketch(
    df: DataFrame,
    key: Column,
    group_cols: Sequence[str] = (),
    n_buckets: int = 256,
) -> DataFrame:
    """The sketch rows: (group…, bucket, min_hash) — at most
    ``groups × n_buckets`` rows from any input. Null keys are excluded
    (a null hashes to null and counts nothing). These rows ARE the
    persistable/mergeable state; estimate with ``estimate_distinct``."""
    g = list(group_cols)
    return (
        df.filter(key.isNotNull())
        .select(*g, _bucket(key, n_buckets).alias("bucket"), _hash52(key).alias("__h"))
        .groupBy(*g, "bucket")
        .agg(F.min("__h").alias("min_hash"))
    )


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Fold sketch row-sets built from disjoint (or overlapping — min is
    idempotent) slices of a corpus into one sketch, without touching the
    raw data. Exact: merge(sketch(A), sketch(B)) == sketch(A ∪ B)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "min_hash"]
    return out.groupBy(*keys).agg(F.min("min_hash").alias("min_hash"))


def estimate_distinct(
    sketch: DataFrame, n_buckets: int = 256
) -> DataFrame:
    """Collapse sketch rows to (group…, n_buckets_occupied, distinct_est).

    Both regimes (see module docstring) are pure functions of exact
    integers — the occupied-bucket count and the int64 sum of bucket
    minima — so the emitted double is engine-portable: the harmonic
    branch is exact IEEE division, the linear-counting branch is one
    ``ln`` of an exact input (agreeing across engines to 1 ulp).
    """
    k = float(n_buckets)
    groups = [c for c in sketch.columns if c not in ("bucket", "min_hash")]
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_buckets_occupied"),
        F.sum("min_hash").alias("__s"),
    )
    occ = F.col("n_buckets_occupied")
    est = F.when(
        occ < n_buckets,
        -k * F.log(F.lit(1.0) - occ.cast("double") / F.lit(k)),
    ).otherwise(
        F.lit(k * (k - 1.0) * HASH_WIDTH) / F.col("__s").cast("double")
    )
    return agg.select(*groups, "n_buckets_occupied", est.alias("distinct_est"))


def bucket_min_distinct(
    df: DataFrame,
    key: Column,
    group_cols: Sequence[str] = (),
    n_buckets: int = 256,
) -> DataFrame:
    """One-shot convenience: sketch + estimate in a single plan."""
    return estimate_distinct(
        bucket_min_sketch(df, key, group_cols, n_buckets), n_buckets
    )


def fixed_width_histogram(
    df: DataFrame,
    value: Column,
    group_cols: Sequence[str] = (),
    width: float = 1.0,
) -> DataFrame:
    """The quantile sketch's state: (group…, bucket, cnt) with
    ``bucket = floor(value / width)`` — the oracle-checkable twin of
    ``corpus_stats``' ``approx_quantile`` (t-digest/KLL-family sketches
    are engine-private; a fixed-grid histogram is the portable one).
    Null values count nothing. ONE map-side-combinable groupBy.count:
    shuffle ≤ groups × (value range / width) rows regardless of input,
    and counts ADD, so per-slice histograms fold (``merge_histograms``)
    without rescans — same incremental-ingest contract as
    ``bucket_min_sketch``. ``floor`` of an IEEE division is the same
    bits on every engine, so the state itself is exactly portable."""
    g = list(group_cols)
    return (
        df.filter(value.isNotNull())
        .select(*g, F.floor(value / F.lit(width)).cast("long").alias("bucket"))
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Fold histogram row-sets from disjoint corpus slices: counts add.
    Exact: merge(hist(A), hist(B)) == hist(A ⊎ B) for disjoint slices
    (unlike min-sketches, counts are NOT idempotent — don't fold the
    same slice twice)."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def estimate_quantile(
    hist: DataFrame, q: float, width: float = 1.0, out_col: str = "quantile_est"
) -> DataFrame:
    """Collapse histogram rows to (group…, n_rows, <out_col>): the
    LOWER EDGE of the first bucket whose running count reaches
    ``ceil(q · n)`` — the histogram's discrete q-quantile, below the
    true order statistic by at most ``width``. Every step is exact
    (integer cumulative sums; ``ceil`` of one double product), so the
    emitted double is bit-identical on every engine. The cumulative
    window runs over histogram ROWS (≤ range/width per group), never
    the data."""
    from pyspark.sql.window import Window

    groups = [c for c in hist.columns if c not in ("bucket", "cnt")]
    w = Window.partitionBy(*groups).orderBy("bucket")
    tot = Window.partitionBy(*groups)
    cum = hist.select(
        *groups,
        "bucket",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(tot).alias("n_rows"),
    )
    hit = cum.filter(
        F.col("__cum") >= F.ceil(F.lit(float(q)) * F.col("n_rows"))
    )
    return hit.groupBy(*groups, "n_rows").agg(
        (F.min("bucket") * F.lit(width)).alias(out_col)
    )
