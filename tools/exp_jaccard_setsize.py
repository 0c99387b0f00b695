"""A/B experiment (round 12): per-doc shingle-set construction inside
ngram_jaccard_pairs.

A (shipped rounds 5-11): groupBy(id).agg(collect_set) -> size + explode
   — ObjectHashAgg pair.
B (candidate, REJECTED at 30x: +12%): groupBy(id, shingle) fixed-width
   dedup -> count(*) over (partition by id) — HashAggregate + Window.
C (shipped round 12): row-local array_distinct sets (the live
   ngram_jaccard_pairs) — zero set-building aggregation.

Both sit above the same doc_id-fanned corpus, so with hash(doc_id)
partitioning every stage of either variant is exchange-free until the
posting-list shuffle. Times the FULL query (pairs + jaccard) per variant,
interleaved min-of-R, and verifies the two results are identical rows.

Usage: python tools/exp_jaccard_setsize.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from temporai_mivdp_spark.llmdata.dedup import (
    _hashed_shingle_rows,
    _hot_shingle_hashes,
    normalize_text,
)
from temporai_mivdp_spark.session import get_session
from temporai_mivdp_spark.sources import fan_out, load_table


def _pairs(sh: DataFrame, id_col: str, threshold: float, cap: int) -> DataFrame:
    posts = sh.groupBy("shingle").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("__sz").alias("sz")))
        ).alias("__entries"),
        F.count(F.lit(1)).alias("__df"),
    ).filter(F.col("__df") <= cap)
    ea = posts.select(F.posexplode("__entries").alias("__pos", "__ea"), "__entries")
    pairs = ea.select(
        F.col("__ea.id").alias("id_a"),
        F.col("__ea.sz").alias("sa"),
        F.explode(F.expr("slice(__entries, __pos + 2, size(__entries))")).alias("__eb"),
    )
    inter = (
        pairs.select("id_a", "sa", F.col("__eb.id").alias("id_b"), F.col("__eb.sz").alias("sb"))
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    jac = inter.withColumn(
        "jaccard", F.col("__inter") / (F.col("sa") + F.col("sb") - F.col("__inter"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = 0
    for a in sys.argv[1:]:
        if a.startswith("--inflate="):
            copies = int(a.split("=", 1)[1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n, cap, threshold, id_col = 3, 1000, 0.5, "doc_id"
    spark = get_session(
        app_name="exp-jaccard-setsize",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g",
                    "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if copies > 1:
        # word-salted linear inflation, same construction as
        # tools/scale_third_decade.py (delimited salt, disjoint shingles)
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_third_decade import inflate_documents

        tmp = tempfile.mkdtemp(prefix=f"exp_jac_{copies}x_")
        inflate_documents(spark, tmp, copies)
        sf_dir = tmp
        print(f"inflated {copies}x -> {tmp}")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zqx")).alias("text"),
    )
    corpus = fan_out(docs.unionByName(mutated), "doc_id")

    toks = corpus.select(
        id_col, F.split(normalize_text(F.col("text")), " ").alias("__toks")
    ).filter(F.size("__toks") >= n)
    hot = _hot_shingle_hashes(toks, n, id_col, cap=cap, sample_inv=8)

    # A: collect_set (shipped)
    sets = _hashed_shingle_rows(toks, n, id_col).groupBy(id_col).agg(
        F.collect_set("shingle").alias("__set")
    )
    sh_a = sets.select(
        id_col, F.size("__set").alias("__sz"), F.explode("__set").alias("shingle")
    ).join(F.broadcast(hot), "shingle", "left_anti")
    qa = _pairs(sh_a, id_col, threshold, cap)

    # B: fixed-width dedup + window size — REJECTED round 12 (min 32.6s
    # vs A's 29.0s at 30x, identical results); kept here as the record.
    # C: the live ngram_jaccard_pairs (row-local array_distinct sets,
    # explode_outer, sampled hot prefilter) — shipped since round 12.
    from temporai_mivdp_spark.llmdata.dedup import ngram_jaccard_pairs

    qb = ngram_jaccard_pairs(
        corpus, n=n, threshold=threshold, max_shingle_freq=cap, hot_sample_inv=8
    )

    # result equivalence
    ra = sorted(map(tuple, qa.collect()))
    rb = sorted(map(tuple, qb.collect()))
    assert ra == rb, f"results differ: {len(ra)} vs {len(rb)} rows"
    print(f"results identical: {len(ra)} pairs")

    for q in (qa, qb):  # warm
        q.write.format("noop").mode("overwrite").save()
    R = int(os.environ.get("REPS", "7"))
    ta, tb = [], []
    for _ in range(R):
        t0 = time.perf_counter(); qa.write.format("noop").mode("overwrite").save(); ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); qb.write.format("noop").mode("overwrite").save(); tb.append(time.perf_counter() - t0)
    print(f"A collect_set : min={min(ta):.3f} all={[round(x,3) for x in ta]}")
    print(f"C row-local set: min={min(tb):.3f} all={[round(x,3) for x in tb]}")
    spark.stop()


if __name__ == "__main__":
    main()
