"""One-decade-beyond-sf0.1 scale sweep for the FULL headline set.

``tools/scale_decade.py`` covers the dedup family; this tool gives every
bench.py headline query its second measured decade by materializing a
deterministic 10× inflation of every table the headline set reads
(lineitem, orders, customer, events, documents, embeddings — dims
nation/region copied as-is) and timing sf0.1 vs 10× with the bench
methodology (DataFrames built once, interleaved round-robin, min over
rounds, noop sink).

Inflation preserves per-key semantics so ratios measure PLAN scaling,
not data-shape drift — each copy k is a disjoint parallel universe:

* ``customer.c_custkey``, ``orders.o_orderkey/o_custkey``,
  ``lineitem.l_orderkey/l_partkey/l_suppkey``, ``events.event_id/
  user_id``, ``embeddings.vec_id`` all shift by ``k·10^7`` — group
  counts grow 10×, per-group cardinality is untouched (how a larger
  TPC-H SF actually grows), and intra-copy join fan-outs equal the
  original's.
* ``documents`` uses the word-salt rewrite from scale_decade.py (same
  token counts, zero cross-copy shingles).
* probe-style queries (flagship's 25-nation output, sim_topk's 5
  probes) keep constant output by design — ``--check`` skips them.

Usage: python tools/scale_decade_full.py [repeats] [--check]
       [--only name1,name2]   (sweep a subset, e.g. newly added queries)
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
    "text_langid",
    "text_bpe_count",
    "pipeline_guard_corpus",
]

#: queries whose output is probe- or dimension-bounded by design: row
#: growth is NOT expected to track data growth
CHECK_EXEMPT = {"flagship_revenue_by_nation", "sim_topk_bruteforce",
                "dedup_minhash_lsh"}

#: the media fixtures synthesize payloads from doc_id, routing
#: doc_id >= 9e6 to the HOSTILE lattice — so a media sweep must shift
#: documents by a value that keeps every copy under 9e6 AND preserves
#: the fixture class residues (600000 ≡ 0 mod 2,3,5,6 and
#: 600000/5 ≡ 0 mod 5, 600000/6 ≡ 0 mod 5: every copy reproduces the
#: base corpus's exact payload-class mix, so the 10× ratio measures
#: decode throughput, not class drift)
MEDIA_ENTRIES = {
    "multimodal_metadata", "multimodal_frame_sampling",
    "multimodal_image_roundtrip", "multimodal_audio_roundtrip",
    "multimodal_video_roundtrip", "dedup_image_phash",
}
MEDIA_DOC_SHIFT = 600_000

COPIES = 10
SHIFT = 10_000_000
BASE_SF = "/root/testdata/sf0.1"


def _inflate_shift(df, cols: list[str], k: int):
    out = df
    for c in cols:
        out = out.withColumn(c, F.col(c) + F.lit(k * SHIFT))
    return out


def inflate(spark, out_dir: str, doc_shift: int = SHIFT, copies: int = COPIES) -> None:
    plans = {
        "customer": ["c_custkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "embeddings": ["vec_id"],
    }
    for name, shift_cols in plans.items():
        base = spark.read.parquet(f"{BASE_SF}/{name}.parquet")
        union = _inflate_shift(base, shift_cols, 0)
        for k in range(1, copies):
            union = union.unionByName(_inflate_shift(base, shift_cols, k))
        out = union.repartition(max(8, copies)) if copies > 10 else union
        out.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
    # documents: word-salted copies (see scale_decade.py rationale).
    # Salt is the DELIMITED q{k}z fence from scale_third_decade.py: the
    # bare-digit suffix can collide across copies once k reaches double
    # digits (round-11 finding), and the fence is equally disjoint at 10.
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = []
    for k in range(copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + k * doc_shift).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1q{k}z").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    union.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    # dims: copied as-is (they are dims at every SF)
    for name in ("region", "nation", "supplier", "part"):
        src = Path(BASE_SF) / f"{name}.parquet"
        if src.exists():
            spark.read.parquet(str(src)).write.mode("overwrite").parquet(
                f"{out_dir}/{name}.parquet"
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = int(args[0]) if args else 3
    headline = list(HEADLINE)
    copies = COPIES
    grouped = "--grouped" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
            # any catalog query, not just the headline set — one-off
            # sweeps of newly added entries use this
            headline = [n for n in only.split(",") if n in QUERIES]
        elif a.startswith("--copies="):
            # third-decade sweeps: --copies=100 --grouped (grouped keeps
            # the big cell's heap churn out of the small cell's samples,
            # see scale_third_decade.py)
            copies = int(a.split("=", 1)[1])
    spark = get_session(
        app_name="mivdp-scale-decade-full",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            # 10x shuffle state + base cells share one JVM; 24g keeps the
            # small cells clear of full-GC pauses (see scale_decade.py)
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="mivdp_decade_full_")
    try:
        media_only = bool(headline) and set(headline) <= MEDIA_ENTRIES
        if not media_only and set(headline) & MEDIA_ENTRIES:
            # review fix: a mixed sweep would silently inflate documents
            # with the default shift, landing every media copy's doc_id
            # in the hostile range (>= 9e6) and measuring NULL-row
            # accounting instead of decode — refuse instead
            raise SystemExit(
                "media entries must be swept separately (their doc-id "
                "shift conflicts with the text entries'): got "
                + ",".join(sorted(set(headline) & MEDIA_ENTRIES))
                + " mixed with non-media queries"
            )
        if media_only and copies > 10:
            # MEDIA_DOC_SHIFT * (copies-1) must stay under the 9e6
            # hostile-lattice floor; it only does for <= 10 copies
            raise SystemExit("media sweeps support at most 10 copies")
        inflate(
            spark,
            tmp,
            doc_shift=MEDIA_DOC_SHIFT if media_only else SHIFT,
            copies=copies,
        )
        big = f"{copies}x"
        cells = [(name, sf) for name in headline for sf in (BASE_SF, tmp)]
        dfs = {(name, sf): QUERIES[name](spark, sf) for name, sf in cells}

        def run(cell) -> None:
            dfs[cell].write.format("noop").mode("overwrite").save()

        def warmup(subset) -> None:
            for cell in subset:
                t0 = time.perf_counter()
                run(cell)
                print(
                    f"warmup {cell[0]} @{big if cell[1] == tmp else 'sf0.1'}:"
                    f" {time.perf_counter() - t0:.1f}s",
                    file=sys.stderr,
                    flush=True,
                )

        best = {cell: float("inf") for cell in cells}

        def timed(subset) -> None:
            for _ in range(repeats):
                for cell in subset:
                    t0 = time.perf_counter()
                    run(cell)
                    best[cell] = min(best[cell], time.perf_counter() - t0)

        if grouped:
            for sf in (BASE_SF, tmp):  # ascending scale
                group = [c for c in cells if c[1] == sf]
                warmup(group)
                timed(group)
        else:
            warmup(cells)
            timed(cells)

        print(f"| query | sf0.1 s | {big} s | ratio |")
        print("|---|---|---|---|")
        for name in headline:
            a, b = best[(name, BASE_SF)], best[(name, tmp)]
            print(f"| {name} | {a:.3f} | {b:.3f} | {b / a:.1f}× |")

        if "--check" in sys.argv:
            for name in headline:
                if name in CHECK_EXEMPT:
                    continue
                ra = dfs[(name, BASE_SF)].count()
                rb = dfs[(name, tmp)].count()
                ok = 0.8 * copies <= rb / max(ra, 1) <= 1.2 * copies
                print(
                    f"rows {name}: {ra} -> {rb} "
                    f"({'ok' if ok else f'NOT ~{copies}x'})"
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
