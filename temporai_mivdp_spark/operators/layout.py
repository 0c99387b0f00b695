"""Data-layout optimization: range-clustered and Z-ordered writes.

At 100 TB the fastest scan is the one that never happens: parquet keeps
per-row-group min/max statistics, and a reader (Spark's pushed filters,
DuckDB, any table format) skips row groups whose range cannot match the
predicate. Whether that pruning bites is ENTIRELY a property of the
write layout:

- arrival/hash layout: every row group spans the whole value range →
  min/max pruning reads everything;
- range-clustered (``write_clustered``): ``repartitionByRange`` +
  ``sortWithinPartitions`` makes row-group ranges tight and disjoint →
  a selective predicate on the cluster key reads ~selectivity of the
  row groups;
- Z-order (``zorder_key``): bit-interleaving two or more quantized keys
  gives every participating dimension PARTIAL locality — a box
  predicate on any subset of the dimensions prunes, where a
  lexicographic sort prunes only on the leading column.

``tools/scan_pruning.py`` measures all three against the same data and
predicates (row groups that must be read via parquet footer stats +
filtered-scan wall time); the numbers live in SCALING.md. No reference
counterpart (the reference rewrites gzipped CSV between stages —
layout is not a lever it has); this is a beyond-reference addition per
SURVEY.md §2's scale-pipeline mandate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_uniform(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column in [lo, hi] onto the integer grid
    [0, 2^bits): equal-width buckets, clamped at the edges — the rank
    proxy Z-ordering needs. Deterministic floor arithmetic (same IEEE
    ops every engine)."""
    n = float(1 << bits)
    span = float(hi) - float(lo)
    raw = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(n))
    return F.least(F.greatest(raw, F.lit(0)), F.lit((1 << bits) - 1)).cast("long")


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of the
    given non-negative integer columns. Bit ``i`` of input ``j`` lands
    at output position ``i * n + j``, so every dimension contributes to
    every level of the key — sorting by it gives each dimension
    ~``bits``-way locality instead of the all-or-nothing of a
    lexicographic sort. ``n * bits`` must fit a signed 64-bit key.

    The expansion is ``n × bits`` shift/mask/or terms — all JVM-side
    integer ops inside one codegen'd projection; no UDF, no shuffle
    (the shuffle comes from the caller's ``repartitionByRange`` on the
    key, which is the point)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits = {n * bits} > 63 key bits")
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def cluster_for_scan(
    df: DataFrame, cluster_by: Sequence[Column | str], n_files: int
) -> DataFrame:
    """Arrange rows so parquet min/max pruning works on the cluster
    key(s): global range partitioning into ``n_files`` shards, each
    sorted — row-group ranges come out tight and (near-)disjoint.
    ``repartitionByRange`` samples the key distribution, so shards are
    balanced even under skew (contrast hash partitioning, which
    balances rows but destroys ranges). Write the result with plain
    ``write_parquet``; one shard = one file = one-or-more row groups."""
    cols = [F.col(c) if isinstance(c, str) else c for c in cluster_by]
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
