"""Unit tests for the data-layout module (operators/layout.py): Morton
key correctness against a Python replay, quantizer bounds, and the
actual pruning property — parquet row-group min/max stats after a
clustered write must let a stats reader skip, measured with pyarrow on
real written files (the same footer test tools/scan_pruning.py runs at
sf0.1)."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from temporai_mivdp_spark.operators.layout import (
    cluster_for_scan,
    quantize_uniform,
    zorder_key,
)


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_zorder_key_matches_python_morton(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85), (2**14 - 1, 1)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = df.select(
        "x", "y", zorder_key([F.col("x"), F.col("y")], bits=14).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton([r.x, r.y], 14), (r.x, r.y)
    # interleaving is injective on the quantized grid
    zs = [r.z for r in got]
    assert len(set(zs)) == len(zs)


def test_zorder_key_rejects_overflow(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.lit(1)] * 5, bits=13)  # 65 > 63 key bits


def test_quantize_uniform_bounds_and_clamp(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)], ["v"])
    got = [r.q for r in df.select(quantize_uniform(F.col("v"), 0, 100, 8).alias("q")).collect()]
    assert got[0] == 0 and got[-1] == 255  # clamped at both edges
    assert got[1] == 0 and got[3] == 255
    assert 0 <= got[2] < 256 and got[2] == 128


def _rowgroup_ranges(path: str, col: str):
    out = []
    for part in sorted(Path(path).glob("*.parquet")):
        pf = pq.ParquetFile(part)
        idx = pf.schema_arrow.names.index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def test_cluster_for_scan_prunes_and_hash_does_not(spark):
    """After a range-clustered write, a 10%-selectivity predicate's
    footer test must skip most row groups; the hash layout skips none.
    The zorder layout must prune on the TRAILING dimension, which the
    lexicographic layout cannot."""
    n = 4096
    rows = [(i % 64, (i * 7) % 64, i) for i in range(n)]  # uniform 64x64 grid
    df = spark.createDataFrame(rows, ["x", "y", "payload"])
    shards = 8

    with tempfile.TemporaryDirectory() as tmp:
        df.repartition(shards).write.parquet(f"{tmp}/hash")
        cluster_for_scan(df, ["x", "y"], shards).write.parquet(f"{tmp}/lexico")
        z = df.withColumn("__z", zorder_key([F.col("x"), F.col("y")], bits=6))
        cluster_for_scan(z, ["__z"], shards).drop("__z").write.parquet(f"{tmp}/zorder")

        def must_read(path, col, lo, hi):
            rs = _rowgroup_ranges(path, col)
            return sum(1 for mn, mx in rs if not (mx < lo or mn > hi)), len(rs)

        # leading-dim predicate: x in [0, 5] (~10%)
        h_must, h_tot = must_read(f"{tmp}/hash", "x", 0, 5)
        l_must, l_tot = must_read(f"{tmp}/lexico", "x", 0, 5)
        assert h_must == h_tot  # hash layout: every row group spans everything
        assert l_must <= max(1, l_tot // 4)  # clustered: most groups skipped

        # trailing-dim predicate: y in [0, 7] (1/8) — lexico barely
        # prunes (only a shard that happens to split inside a single x
        # run gets a sub-range y), zorder gives partial locality on
        # EVERY interleaved dimension (measured here: 7/8 vs 2/8)
        ly_must, ly_tot = must_read(f"{tmp}/lexico", "y", 0, 7)
        zy_must, zy_tot = must_read(f"{tmp}/zorder", "y", 0, 7)
        assert ly_must >= ly_tot - 1
        assert zy_must <= zy_tot // 2
        assert zy_must * 2 <= ly_must

        # clustering preserves the data (same multiset of payloads)
        a = spark.read.parquet(f"{tmp}/zorder").agg(
            F.count(F.lit(1)), F.sum("payload")
        ).collect()[0]
        assert tuple(a) == (n, sum(i for i in range(n)))
