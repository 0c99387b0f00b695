"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed twice: one warm-up collect at sf0.001 amortizes JVM
/ codegen startup out of the measurement, then the timed run at the bench
scale factor. Timing includes full execution to a driver-side count/collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401  (registers llm-data queries)
from temporai_mivdp_spark.session import get_session  # noqa: E402

#: Headline set: the flagship join-agg plus the operators that dominate the
#: reference pipeline's cost profile (cohort labeling, cleaning windows,
#: bucketing, densification) — these are the plans whose scaling matters.
HEADLINE = [
    "flagship_revenue_by_nation",
    "j8_interval_exists_label",
    "a7_mode_vote_filter",
    "a8_winsorize",
    "w3_tumbling_bucket",
    "w4_w8_dense_grid_indicator",
    "w5_w6_w7_impute_active",
    "a2_two_level_agg",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "sim_topk_bruteforce",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_session(
        app_name="mivdp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, d: str) -> None:
        # noop sink: materializes EVERY output column (a bare .count() would
        # let Catalyst prune the computed columns away and time nothing).
        QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()

    names = [n for n in HEADLINE if n in QUERIES]
    # Warm-up: JIT/codegen/classloading on the tiny sf, not the timed one.
    for name in names:
        run(name, "/root/testdata/sf0.001")

    timings: dict[str, float] = {}
    for name in names:
        # best-of-3: the first sf-scale run still pays shuffle-file and JIT
        # warmup, and run 2 can still catch a GC pause from run 1's garbage;
        # the minimum is the stable per-query cost (tools/scaling.py's
        # best-of-3 readings track this within noise)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(name, sf_dir)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
