"""Skew evidence at 100x (r11 verdict "Next round" §8).

Builds a 100x inflation of the events table and then makes it
deliberately hostile: a deterministic 30% of all fact rows are
reassigned to ONE hot user_id — the crawl-corpus shape (one canonical
source id, one bot user, one empty-string key) where hash partitioning
concentrates a third of the shuffle on one task.

Three join+rollup strategies over the same data, identical results
(asserted), different physical distribution:

* plain/AQE-off  — shuffle join on user_id, groupBy rollup: the hot
                   key's partition is a straggler on both sides.
* plain/AQE-on   — Spark's own runtime mitigation
                   (spark.sql.adaptive.skewJoin): splits oversized
                   partitions of a sort-merge join at runtime.
* salted         — operators/skew.py::salted_join +
                   salted_group_count: the engine's explicit fallback
                   for the shapes AQE can't fix (broadcast-ineligible
                   dims, aggregation buffers).

autoBroadcastJoinThreshold is -1 throughout: the inflated dim (150k
rows) would otherwise broadcast, which dodges join skew entirely — the
honest framing is that salting exists precisely for dims too large to
broadcast, so the demo forces the shuffle-join regime a 100 TB dim
lives in. Max-partition share of the joined fact side is reported along
with wall times (the distribution claim, not just the clock).

Usage: python tools/scale_skew_demo.py [copies] [repeats]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from temporai_mivdp_spark.operators import skew as skew_ops  # noqa: E402
from temporai_mivdp_spark.session import get_session  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
SHIFT = 10_000_000
HOT_USER = 777
HOT_TENTH = 3  # pmod(xxhash64(event_id), 10) < 3  ->  30% of rows go hot


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_session(
        app_name="mivdp-skew-demo",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="mivdp_skew_")
    try:
        # cross-join inflation: one plan regardless of copy count (a
        # copies-branch union chokes the analyzer past ~100 branches)
        ks = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__k")
        ev = spark.read.parquet(f"{BASE_SF}/events.parquet").select(
            "event_id", "user_id", "event_type", ks
        )
        hot = ev.select(
            (F.col("event_id") + F.col("__k") * SHIFT).alias("event_id"),
            (F.col("user_id") + F.col("__k") * SHIFT).alias("user_id"),
            "event_type",
        ).withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(10)) < HOT_TENTH,
                F.lit(HOT_USER),
            ).otherwise(F.col("user_id")),
        )
        hot.repartition(max(8, copies // 4)).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        cust = spark.read.parquet(f"{BASE_SF}/customer.parquet").select(
            "c_custkey", "c_mktsegment", ks
        )
        cust.select(
            (F.col("c_custkey") + F.col("__k") * SHIFT).alias("c_custkey"),
            "c_mktsegment",
        ).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")

        def frames():
            fact = spark.read.parquet(f"{tmp}/events.parquet")
            dim = spark.read.parquet(f"{tmp}/customer.parquet").select(
                F.col("c_custkey").alias("user_id"),
                F.col("c_mktsegment").alias("segment"),
            )
            return fact, dim

        def plain():
            fact, dim = frames()
            return fact.join(dim, "user_id").groupBy(
                "segment", "event_type"
            ).agg(F.count(F.lit(1)).alias("n"))

        def salted():
            fact, dim = frames()
            j = skew_ops.salted_join(fact, dim, "user_id", salt_buckets=32)
            return skew_ops.salted_group_count(
                j, ["segment", "event_type"], salt_buckets=32, count_name="n"
            )

        def split_hot():
            fact, dim = frames()
            j = skew_ops.skew_split_join(
                fact, dim, "user_id", hot_keys=[HOT_USER]
            )
            return skew_ops.salted_group_count(
                j, ["segment", "event_type"], salt_buckets=32, count_name="n"
            )

        variants = {
            "plain_aqe_off": (plain, {"spark.sql.adaptive.enabled": "false"}),
            "plain_aqe_on": (plain, {
                "spark.sql.adaptive.enabled": "true",
                "spark.sql.adaptive.skewJoin.enabled": "true",
            }),
            "salted_aqe_off": (salted, {"spark.sql.adaptive.enabled": "false"}),
            "split_hot_aqe_off": (split_hot, {"spark.sql.adaptive.enabled": "false"}),
        }
        only = [a for a in sys.argv[3:] if not a.startswith("-")]
        if only:
            variants = {k: v for k, v in variants.items() if k in only}

        # result parity across variants (salting must be invisible)
        base_rows = None
        for name, (build, conf) in variants.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            rows = {tuple(r) for r in build().collect()}
            if base_rows is None:
                base_rows = rows
            assert rows == base_rows, f"{name} diverged"

        # max-partition share of the join-side shuffle (the distribution
        # claim): count rows per partition as the join would see them
        def max_share(df, cols) -> float:
            dist = (
                df.repartition(32, *[F.col(c) for c in cols])
                .rdd.mapPartitions(lambda it: [sum(1 for _ in it)])
                .collect()
            )
            return max(dist) / max(1, sum(dist))

        fact, _dim = frames()
        plain_share = max_share(fact, ["user_id"])
        # the salted join distributes on (user_id, salt); same full-row
        # hash salt salted_join itself applies
        salted_share = max_share(
            fact.withColumn(
                "__salt",
                F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(32)),
            ),
            ["user_id", "__salt"],
        )

        best = {}
        for name, (build, conf) in variants.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            df = build()
            df.write.format("noop").mode("overwrite").save()  # warm
            t_best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t_best = min(t_best, time.perf_counter() - t0)
            best[name] = t_best
            print(f"{name}: {t_best:.2f}s", file=sys.stderr, flush=True)

        n_fact = frames()[0].count()
        print(f"(fact rows: {n_fact:,}; hot key holds ~{HOT_TENTH*10}% of them)")
        print("| variant | best s | vs plain_aqe_off |")
        print("|---|---|---|")
        for name, t in best.items():
            print(f"| {name} | {t:.2f} | {t / best['plain_aqe_off']:.2f}x |")
        print(f"| max-partition share, plain hash(user_id) | {plain_share:.1%} | |")
        print(f"| max-partition share, salted (user_id, salt) | {salted_share:.1%} | |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
