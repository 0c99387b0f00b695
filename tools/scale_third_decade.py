"""Third measured decade for the two slowest headline queries.

The round-10 verdict (item 4): ``text_langid`` and
``dedup_ngram_jaccard`` are the two most expensive headline entries, and
their scale claims rest on ONE measured decade (sf0.1 -> 10x,
tools/scale_decade_full.py). This tool adds the second measured decade —
a 100x inflation of the sf0.1 documents table (5k -> 500k docs,
~150 MB of text) — and reports BOTH per-decade ratios, so the claims
"the trigram explode is row-local" and "the posting-list frequency cap
bounds the quadratic term" are tested across two decades, not
extrapolated from one.

Inflation reuses the word-salt construction from scale_decade.py, with
one change: the salt is DELIMITED (``$1q{k}z`` instead of ``$1{k}``),
because at 100 copies the bare-digit suffix can collide across copies
(copy 1 of token "foo1" and copy 11 of token "foo" both yield
"foo111"-shaped tokens when the base corpus contains digit-final
tokens); with the ``q...z`` fence, copy k's token set is
``{t + "q"+str(k)+"z"}`` and a cross-copy collision would require a
base token to end in another full fence, which the fence's structure
makes impossible for distinct k. Each copy therefore preserves the
original token/shingle counts exactly and shares zero shingles with any
other copy: candidate pairs grow exactly linearly, as a real corpus
ingest would.

Both queries read ONLY documents, so only documents is inflated;
the other tables are copied at sf0.1 size for sf-dir shape.

Usage: python tools/scale_third_decade.py [repeats] [--check]
       [--only name1,name2]   (any documents-only catalog queries)
       [--grouped]            (see below)

``--grouped`` times cells grouped by scale, ascending (all sf0.1
rounds, then all 10x, then all 100x; each scale warmed immediately
before its own timed rounds) instead of the bench default of
interleaving every cell per round. Interleaving guards same-sized
cells against transient host stalls, but with 100x-asymmetric cells it
POLLUTES the small ones: the 100x cell's heap churn and GC debt leak
into the next small-cell sample (measured on dedup_span_coverage —
the 10x cell's interleaved timed runs came out 3x slower than its own
warmup). Grouped order keeps each cell's JVM state representative of
its own scale, at the cost of host-drift sensitivity across groups —
use grouped for per-decade ratio claims, interleaved for totals.
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

TARGETS = ["text_langid", "dedup_ngram_jaccard"]

#: output rows are corpus-linear for both targets (langid emits one row
#: per (lang) group with counts — constant rows but linear work — so
#: the --check growth guard applies only to the dedup pairs)
CHECK_LINEAR = {"dedup_ngram_jaccard"}

BASE_SF = "/root/testdata/sf0.1"
DOC_SHIFT = 10_000_000


def inflate_documents(spark, out_dir: str, copies: int) -> None:
    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    parts = []
    for k in range(copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + k * DOC_SHIFT).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1q{k}z").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    # repartition so the 100x cell reads a realistic multi-file layout
    # instead of one fat task per original input file
    union.repartition(max(4, copies // 4)).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "embeddings"):
        src = Path(BASE_SF) / f"{name}.parquet"
        if src.exists():
            shutil.copy(src, f"{out_dir}/{name}.parquet")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeats = int(args[0]) if args else 2
    check = "--check" in sys.argv
    grouped = "--grouped" in sys.argv
    targets = list(TARGETS)
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            # caller's responsibility: documents-only queries (the other
            # tables are copied at sf0.1 size, so a query reading them
            # would measure a mixed, meaningless cell)
            targets = [n for n in a.split("=", 1)[1].split(",") if n in QUERIES]
            if not targets:
                raise SystemExit("--only matched no catalog queries")
            # same hazard scale_decade_full guards: DOC_SHIFT lands the
            # inflated copies' doc_ids in the media fixtures' hostile
            # range (>= 9e6), so media entries would measure NULL-row
            # accounting instead of decode — refuse them here
            from scale_decade_full import MEDIA_ENTRIES

            media = sorted(set(targets) & MEDIA_ENTRIES)
            if media:
                raise SystemExit(
                    "media entries cannot use this tool's doc-id shift: "
                    + ",".join(media)
                )

    spark = get_session(
        app_name="mivdp-scale-third-decade",
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
            d = tempfile.mkdtemp(prefix=f"mivdp_decade3_{copies}x_")
            t0 = time.perf_counter()
            inflate_documents(spark, d, copies)
            print(
                f"inflated {copies}x in {time.perf_counter()-t0:.1f}s -> {d}",
                file=sys.stderr,
                flush=True,
            )
            dirs[copies] = d

        scales = (BASE_SF, dirs[10], dirs[100])
        cells = [(n, sf) for n in targets for sf in scales]
        dfs = {(n, sf): QUERIES[n](spark, sf) for n, sf in cells}

        def run(cell) -> None:
            dfs[cell].write.format("noop").mode("overwrite").save()

        label = {BASE_SF: "sf0.1", dirs[10]: "10x", dirs[100]: "100x"}

        def warmup(subset) -> None:
            for cell in subset:
                t0 = time.perf_counter()
                run(cell)
                print(
                    f"warmup {cell[0]} @{label[cell[1]]}: "
                    f"{time.perf_counter()-t0:.1f}s",
                    file=sys.stderr,
                    flush=True,
                )

        best = {cell: float("inf") for cell in cells}

        def timed_rounds(subset) -> None:
            for _ in range(repeats):
                for cell in subset:
                    t0 = time.perf_counter()
                    run(cell)
                    best[cell] = min(best[cell], time.perf_counter() - t0)

        if grouped:
            for sf in scales:  # ascending: each scale warms and times itself
                group = [(n, s) for n, s in cells if s == sf]
                warmup(group)
                timed_rounds(group)
        else:
            warmup(cells)
            timed_rounds(cells)

        if check:
            for n in [q for q in targets if q in CHECK_LINEAR]:
                counts = {
                    label[sf]: dfs[(n, sf)].count()
                    for sf in (BASE_SF, dirs[10], dirs[100])
                }
                print(f"check {n}: rows {counts}", file=sys.stderr, flush=True)
                base = counts["sf0.1"]
                assert abs(counts["10x"] - 10 * base) <= 0.01 * 10 * base, counts
                assert abs(counts["100x"] - 100 * base) <= 0.01 * 100 * base, counts

        print("| query | sf0.1 s | 10x s | 100x s | decade1 | decade2 |")
        print("|---|---|---|---|---|---|")
        for n in targets:
            a = best[(n, BASE_SF)]
            b = best[(n, dirs[10])]
            c = best[(n, dirs[100])]
            print(
                f"| {n} | {a:.3f} | {b:.3f} | {c:.3f} "
                f"| {b / a:.1f}× | {c / b:.1f}× |"
            )
    finally:
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
