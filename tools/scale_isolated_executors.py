"""Validate the cluster-operating-point claim behind the r11 18.2x
analysis (r11 verdict "Next round" §2).

Round 11 measured dedup_ngram_jaccard's second decade (10x -> 100x,
one local[32]/24g JVM) at ~18x — super-linear — and isolated the excess
to the two collect_* ObjectHashAggregate external sorts saturating the
SHARED heap, concluding a real cluster (per-executor heap isolation,
per-executor data at the decade-1 operating point) would not accumulate
it. That conclusion was inference; this tool measures it.

Emulation in the 128 GiB sandbox:

* shared   — one local[32]/24g JVM runs the catalog query at 10x and
             100x (the r11 cell, re-measured same-day for a fair base).
* isolated — TWO local[16]/12g JVMs run CONCURRENTLY (same total cores
             and heap as `shared`, but two OS processes = two isolated
             heaps), each over a disjoint half of the corpus: instance A
             gets copies 0..K/2-1, instance B copies K/2..K-1. Each
             instance therefore sees half the rows on half the cores —
             identical per-core load to `shared` at the same K — but its
             external sorts never compete with the other half's for one
             heap.

Comparable decades: shared 10x -> 100x vs isolated per-instance
5x -> 50x (both are a 10x growth at fixed per-core load). If the
shared-heap-saturation explanation is right, the isolated per-instance
decade ratio should sit near the linear regime (~10-13x, where decade 1
ran) rather than ~18x; if the excess were compounding plan debt it
would follow the data into the isolated instances.

Usage: python tools/scale_isolated_executors.py [repeats]
       (worker mode, internal: --worker SF_DIR CORES MEM_GB REPEATS)
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

QUERY = "dedup_ngram_jaccard"


def _worker(sf_dir: str, cores: int, mem_gb: int, repeats: int) -> None:
    from temporai_mivdp_spark.queries import QUERIES
    import temporai_mivdp_spark.queries_llm  # noqa: F401
    from temporai_mivdp_spark.session import get_session

    spark = get_session(
        app_name=f"mivdp-isolated-{cores}c",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": f"{mem_gb}g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = QUERIES[QUERY](spark, sf_dir)

        def run() -> float:
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        warm = run()
        best = min(run() for _ in range(repeats))
        print(f"WORKER_RESULT {json.dumps({'warm': warm, 'best': best})}", flush=True)
    finally:
        spark.stop()


def _inflate_range(out_dir: str, k_from: int, k_to: int) -> None:
    """Copies k_from..k_to-1 of the sf0.1 documents table (delimited
    word-salt construction and doc-id banding identical to
    scale_third_decade.inflate_documents, restricted to a copy range so
    disjoint halves share zero shingles and zero doc ids)."""
    from pyspark.sql import functions as F

    from scale_third_decade import BASE_SF, DOC_SHIFT
    from temporai_mivdp_spark.session import get_session

    spark = get_session(
        app_name="mivdp-isolated-inflate",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "8g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
        parts = [
            docs.select(
                (F.col("doc_id") + k * DOC_SHIFT).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1q{k}z").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for k in range(k_from, k_to)
        ]
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        n = k_to - k_from
        union.repartition(max(4, n // 4)).write.mode("overwrite").parquet(
            f"{out_dir}/documents.parquet"
        )
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "embeddings"):
            src = Path(BASE_SF) / f"{name}.parquet"
            if src.exists():
                shutil.copy(src, f"{out_dir}/{name}.parquet")
    finally:
        spark.stop()


def _spawn(sf_dir: str, cores: int, mem_gb: int, repeats: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, __file__, "--worker", sf_dir, str(cores),
         str(mem_gb), str(repeats)],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=str(Path(__file__).resolve().parent.parent),
    )


def _collect(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"worker failed rc={proc.returncode}")
    for line in out.splitlines():
        if line.startswith("WORKER_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"no WORKER_RESULT in worker output: {out[-500:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _, _, sf_dir, cores, mem, repeats = sys.argv
        _worker(sf_dir, int(cores), int(mem), int(repeats))
        return

    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dirs: dict[str, str] = {}
    try:
        # shared cells reuse the scale_third_decade ranges (0..K-1);
        # isolated halves split the same copy space disjointly
        cells = {
            "full_10x": (0, 10),
            "full_100x": (0, 100),
            "A_5x": (0, 5),
            "B_5x": (50, 55),
            "A_50x": (0, 50),
            "B_50x": (50, 100),
        }
        for name, (k0, k1) in cells.items():
            d = tempfile.mkdtemp(prefix=f"mivdp_iso_{name}_")
            t0 = time.perf_counter()
            _inflate_range(d, k0, k1)
            print(f"inflated {name} in {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            dirs[name] = d

        results: dict[str, dict] = {}

        # shared-heap decade (sequential: one JVM owns the box)
        for name in ("full_10x", "full_100x"):
            results[name] = _collect(_spawn(dirs[name], 32, 24, repeats))
            print(f"shared {name}: {results[name]}", file=sys.stderr, flush=True)

        # isolated instances, CONCURRENT (two heaps share the box)
        for scale in ("5x", "50x"):
            pa = _spawn(dirs[f"A_{scale}"], 16, 12, repeats)
            pb = _spawn(dirs[f"B_{scale}"], 16, 12, repeats)
            results[f"A_{scale}"] = _collect(pa)
            results[f"B_{scale}"] = _collect(pb)
            print(f"isolated {scale}: A={results[f'A_{scale}']} "
                  f"B={results[f'B_{scale}']}", file=sys.stderr, flush=True)

        sh = results["full_100x"]["best"] / results["full_10x"]["best"]
        ra = results["A_50x"]["best"] / results["A_5x"]["best"]
        rb = results["B_50x"]["best"] / results["B_5x"]["best"]
        print("| config | small s | large s | decade ratio |")
        print("|---|---|---|---|")
        print(f"| shared local[32]/24g (10x->100x) "
              f"| {results['full_10x']['best']:.2f} "
              f"| {results['full_100x']['best']:.2f} | {sh:.1f}x |")
        print(f"| isolated A local[16]/12g (5x->50x, concurrent) "
              f"| {results['A_5x']['best']:.2f} "
              f"| {results['A_50x']['best']:.2f} | {ra:.1f}x |")
        print(f"| isolated B local[16]/12g (5x->50x, concurrent) "
              f"| {results['B_5x']['best']:.2f} "
              f"| {results['B_50x']['best']:.2f} | {rb:.1f}x |")
        pair_wall = max(results["A_50x"]["best"], results["B_50x"]["best"])
        print(f"| isolated pair wall-clock at 100x total | — "
              f"| {pair_wall:.2f} | vs shared "
              f"{results['full_100x']['best']:.2f} |")
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
