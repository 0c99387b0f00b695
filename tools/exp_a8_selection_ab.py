"""Scaled interleaved A/B for the round-12 exact-winsorize rewrite:
window-rank (the rounds-4..11 plan) vs GK-bracketed selection (shipped,
operators/aggregates.py::_exact_bounds_by_selection) over a
lineitem-shaped parquet of SCALE x 600k rows — 3-value group key,
hash-derived values with a 25% tie mass so tie runs exist at the cuts.
The table is written as 32 files: at real scale a scan has thousands of
splits, so a single-file layout would time the synthetic file's one-task
read (measured: 3.2 s of a 4.4 s cell at 10x), not the plans.

MIVDP_CHECK=1 asserts both variants' full results hash-identical before timing.

Measured (this host, local[32], min over 5 interleaved reps; the host's
documented multi-second noise windows make single reps swing 2-4x, which
is why the min-over-interleaved methodology from bench.py applies):

    scale  rows   per group  old (window)  new (selection)
    1x     600k   200k       0.910 s       0.971 s   (parity)
    10x    6M     2M         6.984 s       7.470 s   (parity under noise)
    30x    18M    6M         16.040 s      8.420 s   (1.9x: the 3-task
                                           sort wall is now visible; the
                                           selection plan stays on
                                           map-side-combined aggregates)
    100x   60M    20M        78.093 s      13.723 s  (5.7x, min of 3; the
                                           wall compounds per decade, the
                                           selection cells stay near
                                           linear)

Usage: MIVDP_SCALE=30 REPS=5 MIVDP_CHECK=1 python tools/exp_a8_selection_ab.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from temporai_mivdp_spark.operators import aggregates as agg_ops
from temporai_mivdp_spark.session import get_session
from temporai_mivdp_spark.sources.readers import fan_out

SCALE = int(os.environ.get("MIVDP_SCALE", "10"))
REPS = int(os.environ.get("REPS", "5"))
CHECK = os.environ.get("MIVDP_CHECK", "0") == "1"

spark = get_session(
    app_name=f"a8-scale-{SCALE}x",
    master="local[32]",
    shuffle_partitions=32,
    extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
)
spark.sparkContext.setLogLevel("ERROR")

path = f"/tmp/a8_scale_{SCALE}x_32f.parquet"
if not os.path.exists(path):
    n = 600_000 * SCALE
    gen = spark.range(0, n, 1, 32).select(
        F.col("id").alias("l_orderkey"),
        (F.col("id") % 7).alias("l_linenumber"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("l_returnflag"),
        # heavy-tailed deterministic values with tie mass: ~25% of rows
        # collapse onto round numbers so tie runs exist at scale
        F.when(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(4)) == 0,
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)) * 1000).cast("double"),
        )
        .otherwise(
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000_000)) / 100.0)
        )
        .alias("l_extendedprice"),
    )
    gen.write.mode("overwrite").parquet(path)  # 32 files: see module docstring
    print(f"wrote {n} rows -> {path}", flush=True)


def old_winsorize(df, keys, value_col, p_lo, p_hi):
    v = F.col(value_col)
    w_rank = Window.partitionBy(*keys).orderBy(F.col("__v").asc())
    w_grp = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        df.filter(v.isNotNull())
        .select(*keys, v.alias("__v"))
        .withColumn("__rn", F.row_number().over(w_rank) - 1)
        .withColumn("__n", F.count(F.lit(1)).over(w_grp))
    )

    def order_stats(p, out):
        idx = (F.col("__n") - 1) * F.lit(p)
        lo_i, hi_i = F.floor(idx), F.ceil(idx)
        return [
            F.max(F.when(F.col("__rn") == lo_i, F.col("__v"))).alias(f"__{out}_vl"),
            F.max(F.when(F.col("__rn") == hi_i, F.col("__v"))).alias(f"__{out}_vh"),
            F.max(idx - lo_i).alias(f"__{out}_frac"),
        ]

    stats = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__n") - 1) * p_lo))
        | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_lo))
        | (F.col("__rn") == F.floor((F.col("__n") - 1) * p_hi))
        | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_hi))
    ).groupBy(*keys).agg(*order_stats(p_lo, "lo"), *order_stats(p_hi, "hi"))
    bounds = stats.select(
        *keys,
        (F.col("__lo_vl") + (F.col("__lo_vh") - F.col("__lo_vl")) * F.col("__lo_frac")).alias("__lo"),
        (F.col("__hi_vl") + (F.col("__hi_vh") - F.col("__hi_vl")) * F.col("__hi_frac")).alias("__hi"),
    )
    joined = df.join(F.broadcast(bounds), on=keys, how="left")
    out = joined.withColumn(
        value_col,
        F.when(v < F.col("__lo"), F.col("__lo"))
        .when(v > F.col("__hi"), F.col("__hi"))
        .otherwise(v),
    )
    return out.drop("__lo", "__hi")


def build(variant):
    li = fan_out(spark.read.parquet(path), "l_orderkey")
    if variant == "old":
        out = old_winsorize(li, ["l_returnflag"], "l_extendedprice", 0.05, 0.95)
    else:
        out = agg_ops.winsorize(
            li, group_key="l_returnflag", value_col="l_extendedprice",
            lower_pct=5.0, upper_pct=95.0, impute=True,
        )
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round("l_extendedprice", 4).alias("price_winsorized"),
    )


dfs = {v: build(v) for v in ("old", "new")}
if CHECK:
    h = {
        v: df.select(F.sum(F.xxhash64("l_orderkey", "l_linenumber", "price_winsorized")).alias("h")).collect()[0]["h"]
        for v, df in dfs.items()
    }
    assert h["old"] == h["new"], h
    print(f"identical hashes: {h['old']}", flush=True)
for df in dfs.values():
    df.write.format("noop").mode("overwrite").save()
samples = {v: [] for v in dfs}
for _ in range(REPS):
    for v, df in dfs.items():
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        samples[v].append(round(time.perf_counter() - t0, 3))
for v, s in samples.items():
    print(f"{SCALE}x {v}: best={min(s)} all={s}", flush=True)
spark.stop()
