"""Measure the pandas crossover BASELINE.md predicts (r11 verdict "Next
round" §5).

BASELINE.md's slope table (pandas 8-12x per decade vs Spark 1.3-3.8x)
implies the remaining curves cross at sf1-10. This tool extends the
measurement one decade past sf0.1 — an sf1-equivalent built with
scale_decade_full.inflate (10x of every table, disjoint-universe key
shifts) — for the three operators the r11 verdict named:
``a8_winsorize``, ``a2_two_level_agg``, ``text_quality``.

Same charity rules as tools/pandas_baseline.py: pandas gets vectorized
implementations with every table PRE-LOADED into RAM before the timer;
Spark re-scans parquet inside every timed run. Interleaved best-of-N.

Usage: python tools/pandas_crossover.py [repeats]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401
from temporai_mivdp_spark.session import get_session  # noqa: E402
from pandas_baseline import pd_text_quality, pd_two_level, pd_winsorize  # noqa: E402
from scale_decade_full import BASE_SF, inflate  # noqa: E402

NAMES = ["a8_winsorize", "a2_two_level_agg", "text_quality"]


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session(
        app_name="mivdp-pandas-crossover",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="mivdp_sf1_")
    try:
        t0 = time.perf_counter()
        inflate(spark, tmp)  # 10x of sf0.1 = sf1-equivalent
        print(f"inflated sf1-equivalent in {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)

        def load(sf_dir: str) -> dict:
            return {
                "li": pd.read_parquet(f"{sf_dir}/lineitem.parquet"),
                "docs": pd.read_parquet(f"{sf_dir}/documents.parquet")[
                    ["doc_id", "text"]
                ],
            }

        tables = {"sf0.1": load(BASE_SF), "sf1": load(tmp)}

        def pandas_cases(lbl: str) -> dict:
            t = tables[lbl]
            return {
                "a8_winsorize": lambda: pd_winsorize(t["li"]),
                "a2_two_level_agg": lambda: pd_two_level(t["li"]),
                "text_quality": lambda: pd_text_quality(t["docs"]),
            }

        scales = [("sf0.1", BASE_SF), ("sf1", tmp)]
        spark_dfs = {
            (n, lbl): QUERIES[n](spark, sf) for n in NAMES for lbl, sf in scales
        }
        # warm + semantics check
        for lbl, _sf in scales:
            for n, fn in pandas_cases(lbl).items():
                n_pd = len(fn())
                n_sp = spark_dfs[(n, lbl)].count()
                assert n_pd == n_sp, (n, lbl, n_pd, n_sp)
                spark_dfs[(n, lbl)].write.format("noop").mode("overwrite").save()

        best_pd = {(n, lbl): float("inf") for n in NAMES for lbl, _ in scales}
        best_sp = dict(best_pd)
        for _ in range(repeats):
            for lbl, _sf in scales:
                cases = pandas_cases(lbl)
                for n in NAMES:
                    t0 = time.perf_counter()
                    cases[n]()
                    best_pd[(n, lbl)] = min(
                        best_pd[(n, lbl)], time.perf_counter() - t0
                    )
                    t0 = time.perf_counter()
                    spark_dfs[(n, lbl)].write.format("noop").mode(
                        "overwrite"
                    ).save()
                    best_sp[(n, lbl)] = min(
                        best_sp[(n, lbl)], time.perf_counter() - t0
                    )

        print("(pandas pre-loaded in RAM; Spark re-scans parquet each run)")
        print("| operator | pandas sf0.1 | pandas sf1 | pd growth "
              "| spark sf0.1 | spark sf1 | spark growth | crossed? |")
        print("|---|---|---|---|---|---|---|---|")
        for n in NAMES:
            p1, p2 = best_pd[(n, "sf0.1")], best_pd[(n, "sf1")]
            s1, s2 = best_sp[(n, "sf0.1")], best_sp[(n, "sf1")]
            crossed = "YES" if s2 < p2 else "not yet"
            print(f"| {n} | {p1:.3f} | {p2:.3f} | {p2 / p1:.1f}x "
                  f"| {s1:.3f} | {s2:.3f} | {s2 / s1:.1f}x | {crossed} |")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
