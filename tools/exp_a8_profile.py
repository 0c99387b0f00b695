"""Stage-prefix profile of a8_winsorize (guide §1.1: find where the time
goes before changing anything): times noop-sink materializations of
successively deeper prefixes of the exact-winsorize plan at the bench
point (sf0.1, local[$SPARK_GRAFT_CPUS]).

Prefixes:
  scan      fan_out(lineitem, l_orderkey) -> notNull filter -> (k, v)
  ranked    + the per-group rank window (row_number + count over
            partitionBy(l_returnflag) orderBy(v)) -- the 3-partition sort
  bounds    + order-stat filter + interpolation aggregate (3 rows)
  full      the whole catalog query (bounds broadcast-joined back + clamp)

Usage: python tools/exp_a8_profile.py   [REPS=5]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from temporai_mivdp_spark.queries import QUERIES, _t  # noqa: E402
from temporai_mivdp_spark.session import get_session  # noqa: E402
from temporai_mivdp_spark.sources.readers import fan_out  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("REPS", "5"))
    spark = get_session(
        app_name="a8-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = fan_out(_t(spark, sf_dir, "lineitem"), "l_orderkey")
    v = F.col("l_extendedprice")
    scan = li.filter(v.isNotNull()).select("l_returnflag", v.alias("__v"))

    w_rank = Window.partitionBy("l_returnflag").orderBy(F.col("__v").asc())
    w_grp = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = scan.withColumn("__rn", F.row_number().over(w_rank) - 1).withColumn(
        "__n", F.count(F.lit(1)).over(w_grp)
    )

    p_lo, p_hi = 0.05, 0.95

    def order_stats(p: float, out: str):
        idx = (F.col("__n") - 1) * F.lit(p)
        lo_i, hi_i = F.floor(idx), F.ceil(idx)
        return [
            F.max(F.when(F.col("__rn") == lo_i, F.col("__v"))).alias(f"__{out}_vl"),
            F.max(F.when(F.col("__rn") == hi_i, F.col("__v"))).alias(f"__{out}_vh"),
            F.max(idx - lo_i).alias(f"__{out}_frac"),
        ]

    bounds = (
        ranked.filter(
            (F.col("__rn") == F.floor((F.col("__n") - 1) * p_lo))
            | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_lo))
            | (F.col("__rn") == F.floor((F.col("__n") - 1) * p_hi))
            | (F.col("__rn") == F.ceil((F.col("__n") - 1) * p_hi))
        )
        .groupBy("l_returnflag")
        .agg(*order_stats(p_lo, "lo"), *order_stats(p_hi, "hi"))
    )

    full = QUERIES["a8_winsorize"](spark, sf_dir)

    prefixes = {"scan": scan, "ranked": ranked, "bounds": bounds, "full": full}
    # warm-up
    for df in prefixes.values():
        df.write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in prefixes}
    for _ in range(reps):
        for nm, df in prefixes.items():
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples[nm].append(round(time.perf_counter() - t0, 3))
    for nm, s in samples.items():
        print(f"{nm}: best={min(s)} all={s}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
