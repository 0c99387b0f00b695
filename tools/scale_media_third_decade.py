"""Third measured decade for the media tier (r11 verdict "Next round"
§7): multimodal_metadata + dedup_image_phash at sf0.1 / 10x / 100x.

The claim under test: the Arrow-batch mapInPandas boundary (binary
payload in, decoded accounting out) holds its slope through a third
decade — per-row Python decode cost is constant, batches scale with
partitions, and nothing in the plan accumulates super-linear state
(both entries end in either a row-local projection or one hash-groupBy
on a 16-byte key).

Inflation: documents-only, word-salted copies with a 50k doc-id shift —
scale_decade_full's media sweeps use a 600k shift which overruns the
9e6 hostile-lattice floor past 10 copies; 50k keeps copy 99's ids below
5M, so every inflated row still synthesizes REAL decodable media (the
fixtures derive payloads from doc_id arithmetic, which is shift-stable:
each copy reproduces the same class mix). Grouped timing per the
scale_third_decade GC-pollution finding.

Usage: python tools/scale_media_third_decade.py [repeats]
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

TARGETS = ["multimodal_metadata", "dedup_image_phash"]
BASE_SF = "/root/testdata/sf0.1"
MEDIA_SHIFT = 50_000  # 99 * 50k + 4999 < 9e6 hostile floor


def inflate_media_docs(spark, out_dir: str, copies: int) -> None:
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = [
        docs.select(
            (F.col("doc_id") + k * MEDIA_SHIFT).alias("doc_id"),
            F.regexp_replace("text", r"(\S+)", f"$1q{k}z").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        for k in range(copies)
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.repartition(max(4, copies // 4)).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        src = Path(BASE_SF) / f"{name}.parquet"
        if src.exists():
            shutil.copy(src, f"{out_dir}/{name}.parquet")


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_session(
        app_name="mivdp-media-third-decade",
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
            d = tempfile.mkdtemp(prefix=f"mivdp_media3_{copies}x_")
            t0 = time.perf_counter()
            inflate_media_docs(spark, d, copies)
            print(f"inflated {copies}x in {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr, flush=True)
            dirs[copies] = d

        scales = [("sf0.1", BASE_SF), ("10x", dirs[10]), ("100x", dirs[100])]
        dfs = {
            (n, lbl): QUERIES[n](spark, sf)
            for n in TARGETS
            for lbl, sf in scales
        }
        best = {c: float("inf") for c in dfs}

        def run(cell):
            dfs[cell].write.format("noop").mode("overwrite").save()

        for lbl, _sf in scales:  # grouped ascending
            group = [(n, lbl) for n in TARGETS]
            for cell in group:
                t0 = time.perf_counter()
                run(cell)
                print(f"warmup {cell[0]} @{lbl}: {time.perf_counter()-t0:.1f}s",
                      file=sys.stderr, flush=True)
            for _ in range(repeats):
                for cell in group:
                    t0 = time.perf_counter()
                    run(cell)
                    best[cell] = min(best[cell], time.perf_counter() - t0)

        # linear-row sanity: decode accounting must scale with the corpus
        for n in TARGETS:
            c1 = dfs[(n, "sf0.1")].count()
            c100 = dfs[(n, "100x")].count()
            assert abs(c100 - 100 * c1) <= 0.01 * 100 * c1, (n, c1, c100)

        print("| query | sf0.1 s | 10x s | 100x s | decade1 | decade2 |")
        print("|---|---|---|---|---|---|")
        for n in TARGETS:
            a, b, c = (best[(n, lbl)] for lbl, _ in scales)
            print(f"| {n} | {a:.3f} | {b:.3f} | {c:.3f} "
                  f"| {b / a:.1f}x | {c / b:.1f}x |")
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
