"""One-decade-beyond-sf0.1 scale validation for the dedup family.

sf0.1 is the largest driver-generated corpus (5k docs); this tool
materializes a deterministic 10x inflation (50k docs) and times the
text-dedup queries on it, printing the sf0.1 -> 10x ratio per query.
A ratio near 10x is data-linear; well above it means a stage lost its
bound and would not survive the next three decades to 100 TB.

Inflation must not change the *semantics density* of the corpus, or the
measurement conflates plan scalability with data shape: near-dup
candidate pairs per doc must stay constant. Each copy k therefore
rewrites the text by appending the copy index to every word
(``regexp_replace(text, '(\\S+)', '$1K')``), so each copy has exactly
the original token/shingle counts and word-frequency distribution but
shares zero shingles with any other copy. Within one copy the pairwise
structure is exactly the original corpus's, so total candidate pairs
grow by exactly 10x — linear, as a real 10x corpus ingest would be.

The inflated corpus is written once to a local parquet dir shaped like
a testdata sf dir (documents.parquet only — the dedup family reads
nothing else), then the standard catalog callables run against it
unmodified.

Usage: python tools/scale_decade.py [repeats] [--check]

``--check`` additionally counts each query's output rows at both scales
and verifies the 10x corpus yields ~10x the output (the linear-growth
invariant the inflation was designed to produce) — a guard that the
salting actually isolated the copies.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from temporai_mivdp_spark.queries import QUERIES  # noqa: E402
import temporai_mivdp_spark.queries_llm  # noqa: E402,F401
from temporai_mivdp_spark.session import get_session  # noqa: E402

FAMILY = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
]


def _x_bloom(spark, sf_dir):
    from temporai_mivdp_spark.llmdata import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bloom = dedup.shingle_bloom(docs.orderBy("doc_id").limit(50), n=3, m_bits=1 << 20, k_hashes=4)
    return dedup.bloom_contamination(docs, bloom, n=3)


def _x_spans(spark, sf_dir):
    from temporai_mivdp_spark.llmdata import dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dedup.repeated_spans(docs, window=10, min_docs=2)


#: non-catalog extras with the same superlinear-risk profile; per-doc
#: (bloom) and per-shared-span (spans) outputs both grow exactly 10x
#: under the copy-salted inflation, so --check applies unchanged
EXTRAS = {"x_bloom_contamination": _x_bloom, "x_repeated_spans": _x_spans}
COPIES = 10
BASE_SF = "/root/testdata/sf0.1"


def inflate(spark, out_dir: str) -> None:
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = []
    for k in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1{k}").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session(
        app_name="mivdp-scale-decade",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            # the 10x cells' shuffle state plus the base cells in one JVM:
            # 16g leaves the base samples exposed to full-GC pauses from the
            # big cells (observed: a 1.4s query reading 13s), 24g does not
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="mivdp_decade_")
    try:
        inflate(spark, tmp)

        names = FAMILY + list(EXTRAS)
        cells = [(name, sf) for name in names for sf in (BASE_SF, tmp)]
        dfs = {
            (name, sf): (
                EXTRAS[name](spark, sf) if name in EXTRAS else QUERIES[name](spark, sf)
            )
            for name, sf in cells
        }

        def run(cell) -> None:
            dfs[cell].write.format("noop").mode("overwrite").save()

        for cell in cells:  # warm-up
            t0 = time.perf_counter()
            run(cell)
            print(
                f"warmup {cell[0]} @{'10x' if cell[1] == tmp else 'sf0.1'}:"
                f" {time.perf_counter() - t0:.1f}s",
                file=sys.stderr,
                flush=True,
            )

        best = {cell: float("inf") for cell in cells}
        for _ in range(repeats):
            for cell in cells:
                t0 = time.perf_counter()
                run(cell)
                best[cell] = min(best[cell], time.perf_counter() - t0)

        print("| query | sf0.1 s | 10x s | ratio |")
        print("|---|---|---|---|")
        for name in names:
            a, b = best[(name, BASE_SF)], best[(name, tmp)]
            print(f"| {name} | {a:.3f} | {b:.3f} | {b / a:.1f}× |")

        if "--check" in sys.argv:
            for name in names:
                ra = dfs[(name, BASE_SF)].count()
                rb = dfs[(name, tmp)].count()
                ok = 8 <= rb / max(ra, 1) <= 12
                print(f"rows {name}: {ra} -> {rb} ({'ok' if ok else 'NOT ~10x'})")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
