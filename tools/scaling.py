"""Scale-factor sweep for the headline queries.

Times every bench.py headline query at sf0.001 / sf0.01 / sf0.1 (noop
sink, interleaved best-of-N) and prints a markdown table with the
0.01->0.1 runtime ratio — the observable that distinguishes "fixed
overhead dominates" (ratio ~1) from "data-linear" (ratio ~10) from
"superlinear blowup" (ratio >> 10, a plan that will not survive a
100 TB corpus). Usage:

    python tools/scaling.py [repeats]

Methodology matches bench.py: DataFrames are built once (plan
construction excluded from the timed region) and the timed runs are
interleaved round-robin across every (query, sf) cell so a transient
host stall spoils at most one sample per cell instead of all of them
(consecutive best-of-3 produced nonsense ratios when a stall covered a
whole cell's samples).
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
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "16g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    cells = [(name, sf) for name in HEADLINE for sf in SFS]
    dfs = {
        (name, sf): QUERIES[name](spark, f"/root/testdata/sf{sf}")
        for name, sf in cells
    }
    # non-catalog extras whose asymptotics matter (built here so their
    # plan construction is also outside the timed region)
    from temporai_mivdp_spark.sources import load_table  # noqa: PLC0415
    from temporai_mivdp_spark.llmdata import dedup as _dd  # noqa: PLC0415

    for sf in SFS:
        docs = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        bloom = _dd.shingle_bloom(docs.orderBy("doc_id").limit(50), n=3, m_bits=1 << 20, k_hashes=4)
        dfs[("x_bloom_contamination", sf)] = _dd.bloom_contamination(docs, bloom, n=3)
        dfs[("x_repeated_spans", sf)] = _dd.repeated_spans(docs, window=10, min_docs=2)
    EXTRAS = ["x_bloom_contamination", "x_repeated_spans"]
    cells += [(name, sf) for name in EXTRAS for sf in SFS]

    def run(cell) -> None:
        dfs[cell].write.format("noop").mode("overwrite").save()

    # warm-up: JIT/codegen/classloading + first-touch shuffle files
    for cell in cells:
        run(cell)

    best = {cell: float("inf") for cell in cells}
    for _ in range(repeats):
        for cell in cells:
            t0 = time.perf_counter()
            run(cell)
            best[cell] = min(best[cell], time.perf_counter() - t0)

    print("| query | sf0.001 s | sf0.01 s | sf0.1 s | 0.01→0.1 ratio |")
    print("|---|---|---|---|---|")
    for name in HEADLINE + EXTRAS:
        a, b, c = (best[(name, sf)] for sf in SFS)
        print(f"| {name} | {a:.3f} | {b:.3f} | {c:.3f} | {c / b:.1f}× |")
    spark.stop()


if __name__ == "__main__":
    main()
