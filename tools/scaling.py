"""Scale-factor sweep for the headline queries.

Times every bench.py headline query at sf0.001 / sf0.01 / sf0.1 (noop
sink, best-of-N) and prints a markdown table with the 0.01->0.1 runtime
ratio — the observable that distinguishes "fixed overhead dominates"
(ratio ~1) from "data-linear" (ratio ~10) from "superlinear blowup"
(ratio >> 10, a plan that will not survive a 100 TB corpus). Usage:

    python tools/scaling.py [repeats]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401
from temporai_mivdp_spark.session import get_session  # noqa: E402

from bench import HEADLINE  # noqa: E402

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session(
        app_name="mivdp-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf: str) -> None:
        QUERIES[name](spark, f"/root/testdata/sf{sf}").write.format("noop").mode(
            "overwrite"
        ).save()

    # warm-up pass: JIT/codegen/classloading
    for name in HEADLINE:
        run(name, "0.001")

    rows = []
    for name in HEADLINE:
        best = {}
        for sf in SFS:
            b = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                run(name, sf)
                b = min(b, time.perf_counter() - t0)
            best[sf] = b
        ratio = best["0.1"] / best["0.01"]
        rows.append((name, *(best[sf] for sf in SFS), ratio))

    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio |")
    print("|---|---|---|---|---|")
    for name, a, b, c, r in rows:
        print(f"| {name} | {a:.3f} | {b:.3f} | {c:.3f} | {r:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    main()
