"""Core-count sweep at an inflated scale factor (r12 verdict item 2).

The driver's own scaling block compares local[8] vs local[32] at sf0.1,
where every headline query is 0.3-2.7 s and overhead-bound — the ratios
come out ~0.8-1.1 and the driver's heuristic flagged
``suspect_cpus_ignored`` even though bench.py provably honors
$SPARK_GRAFT_CPUS (it reads the env into the master URL and
shuffle_partitions; BENCH_FULL.json now records the session's actual
parallelism). This tool produces the measurement the sf0.1 bench cannot:
a core sweep at an inflated SF where the queries are CPU-bound, so more
cores actually help and the ratio is discriminating.

Method: inflate the sf0.1 documents table in-place (scale_third_decade's
delimited word-salt construction — per-copy token sets are disjoint, so
work grows exactly linearly), then for each core count in the sweep
START A FRESH JVM (one python subprocess per core count, exactly like
the driver's own low-core rerun) that times the target queries with the
bench methodology (build once, warm once, interleaved min-of-R noop-sink
rounds). Same data dir for every core count; the inflation is built once
by the parent.

Usage: python tools/scale_core_sweep.py [--copies=30] [--reps=3]
         [--cpus=8,32] [--only=name1,name2]
Child mode (internal): --child --dir=D --cpus=N --reps=R --only=...
Prints one table: query | t(local[8]) | t(local[32]) | ratio.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: CPU-bound headline queries at the inflated scale: the trigram/bigram
#: text stack, the dedup pair stack, and the winsorize selection tier
#: (lineitem is NOT inflated, so a8 stays on its sf0.1 input — excluded
#: by default; use exp_a8_selection_ab.py's synthetic table for a8
#: core-scaling).
DEFAULT_TARGETS = [
    "text_langid",
    "text_quality",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "pipeline_guard_corpus",
]


def child(d: str, cpus: int, reps: int, targets: list[str]) -> None:
    from temporai_mivdp_spark.queries import QUERIES
    import temporai_mivdp_spark.queries_llm  # noqa: F401
    from temporai_mivdp_spark.session import get_session

    spark = get_session(
        app_name=f"core-sweep-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    dfs = {}
    for name in targets:
        QUERIES[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
        dfs[name] = QUERIES[name](spark, d)
        dfs[name].write.format("noop").mode("overwrite").save()
    samples: dict[str, list[float]] = {n: [] for n in targets}
    for _ in range(reps):
        for name in targets:
            t0 = time.perf_counter()
            dfs[name].write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
    print("CHILD_RESULT " + json.dumps(
        {n: round(min(s), 3) for n, s in samples.items()}
    ), flush=True)
    spark.stop()


def main() -> None:
    opts = {a.split("=", 1)[0]: a.split("=", 1)[1]
            for a in sys.argv[1:] if "=" in a}
    if "--child" in sys.argv:
        child(
            opts["--dir"],
            int(opts["--cpus"]),
            int(opts["--reps"]),
            opts["--only"].split(","),
        )
        return

    copies = int(opts.get("--copies", "30"))
    reps = int(opts.get("--reps", "3"))
    cpu_list = [int(c) for c in opts.get("--cpus", "8,32").split(",")]
    targets = opts.get("--only", ",".join(DEFAULT_TARGETS)).split(",")

    from temporai_mivdp_spark.session import get_session
    from scale_third_decade import inflate_documents

    d = tempfile.mkdtemp(prefix=f"mivdp_core_sweep_{copies}x_")
    spark = get_session(
        app_name="core-sweep-inflate",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    inflate_documents(spark, d, copies)
    print(f"inflated {copies}x in {time.perf_counter()-t0:.1f}s -> {d}",
          file=sys.stderr, flush=True)
    spark.stop()

    results: dict[int, dict[str, float]] = {}
    for cpus in cpu_list:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--child",
            f"--dir={d}", f"--cpus={cpus}", f"--reps={reps}",
            "--only=" + ",".join(targets),
        ]
        out = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if not line:
            sys.stderr.write(out.stdout[-2000:] + out.stderr[-2000:])
            raise SystemExit(f"child local[{cpus}] produced no result")
        results[cpus] = json.loads(line[0][len("CHILD_RESULT "):])
        print(f"local[{cpus}]: {results[cpus]}", flush=True)

    lo, hi = min(cpu_list), max(cpu_list)
    print(f"\n| query ({copies}x inflation) | local[{lo}] s | local[{hi}] s "
          "| ratio lo/hi |")
    print("|---|---|---|---|")
    for n in targets:
        a, b = results[lo][n], results[hi][n]
        print(f"| {n} | {a:.3f} | {b:.3f} | {a / b:.2f} |")


if __name__ == "__main__":
    main()
