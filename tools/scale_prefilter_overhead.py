"""Overhead of the round-12 default-on sampled hot-key prefilter at the
100x cell (r11 verdict "Next round" §1 close-out).

Times the catalog-equivalent dedup_ngram_jaccard (augmented corpus,
n=3, threshold=0.5, cap=1000) in three prefilter variants at three
scales (sf0.1 / 10x / 100x, same inflation as scale_third_decade):

* off      — prefilter_hot=False: the r11 default (unbounded buffers)
* sampled  — hot_sample_inv=8: the r12 DEFAULT (deterministic 1/8
             doc-sample detector; lower-bound counts, so results are
             bit-identical to `off` by construction)
* full     — hot_sample_inv=1: the r11 opt-in exact full count, re-based
             on the leaner count_distinct detector (the r11 version also
             re-ran the per-doc collect_set object-agg and measured +32%)

The bench corpus is boilerplate-free, so every variant's hot set is
empty and the measurement isolates pure detector overhead — the number
the default-on decision is accountable to. Grouped timing (all cells of
one scale warmed+timed together) per the scale_third_decade finding on
asymmetric-cell GC pollution.

Usage: python tools/scale_prefilter_overhead.py [repeats]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from temporai_mivdp_spark.llmdata import dedup  # noqa: E402
from temporai_mivdp_spark.queries_llm import _augmented  # noqa: E402
from temporai_mivdp_spark.session import get_session  # noqa: E402
from scale_third_decade import BASE_SF, inflate_documents  # noqa: E402

VARIANTS = {
    "off": dict(prefilter_hot=False),
    "sampled": dict(hot_sample_inv=8),
    "full": dict(hot_sample_inv=1),
}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_session(
        app_name="mivdp-prefilter-overhead",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {}
    try:
        for copies in (10, 100):
            d = tempfile.mkdtemp(prefix=f"mivdp_prefilter_{copies}x_")
            t0 = time.perf_counter()
            inflate_documents(spark, d, copies)
            print(
                f"inflated {copies}x in {time.perf_counter()-t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )
            dirs[copies] = d

        scales = [("sf0.1", BASE_SF), ("10x", dirs[10]), ("100x", dirs[100])]
        dfs = {
            (v, lbl): dedup.ngram_jaccard_pairs(
                _augmented(spark, sf), n=3, threshold=0.5, **kw
            )
            for v, kw in VARIANTS.items()
            for lbl, sf in scales
        }
        best = {cell: float("inf") for cell in dfs}

        def run(cell) -> None:
            dfs[cell].write.format("noop").mode("overwrite").save()

        for lbl, _sf in scales:  # grouped, ascending
            group = [(v, lbl) for v in VARIANTS]
            for cell in group:  # warm
                t0 = time.perf_counter()
                run(cell)
                print(
                    f"warmup {cell[0]} @{lbl}: {time.perf_counter()-t0:.1f}s",
                    file=sys.stderr,
                    flush=True,
                )
            for _ in range(repeats):
                for cell in group:
                    t0 = time.perf_counter()
                    run(cell)
                    best[cell] = min(best[cell], time.perf_counter() - t0)

        print("| variant | sf0.1 s | 10x s | 100x s | 100x vs off |")
        print("|---|---|---|---|---|")
        for v in VARIANTS:
            a, b, c = (best[(v, lbl)] for lbl, _ in scales)
            rel = c / best[("off", "100x")] - 1
            print(f"| {v} | {a:.3f} | {b:.3f} | {c:.3f} | {rel:+.1%} |")
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
