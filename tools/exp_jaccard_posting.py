"""Posting-stage experiment (r12 verdict item 4): the
``groupBy(shingle).agg(sort_array(collect_list(struct(id, sz))))``
posting-list build is dedup_ngram_jaccard's documented 100x excess — an
ObjectHashAggregate whose hash map over every shingle row falls back to
sort-based aggregation and external-sorts struct rows on one shared
heap. Three variants over the IDENTICAL upstream (row-local sets,
sampled hot prefilter — the shipped ngram_jaccard_pairs up to ``sh``):

A (shipped): posting collect_list -> posexplode/slice pair emit.
B (materialize + self-join): write ``sh`` once per run to a run-keyed
  scratch parquet (the r11 SMJ-self-join rejection was subtree
  duplication — materialization removes it), then a shuffled-hash
  self-join on shingle with id_a < id_b. Timed INCLUDING the write.
C (sort-based streaming emit, the verdict's suggested technique):
  repartition(shingle) + sortWithinPartitions(shingle, id) +
  ``mapInArrow`` pair generation — fixed memory (one run buffered, runs
  bounded by the prefilter at ~2*cap*inv), vectorized across runs by
  run-length classes (np.triu_indices broadcast), no aggregation
  buffers at all.

All three feed the identical size-filter + pair-count + jaccard tail;
results are asserted identical before timing. Interleaved min-of-R.

Usage: python tools/exp_jaccard_posting.py [sf_dir] [--inflate=N]
       [--variants=A,B,C]   (REPS env, default 5)
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from temporai_mivdp_spark.llmdata.dedup import (
    _hashed_shingle_sets,
    _hot_shingle_hashes,
    normalize_text,
)
from temporai_mivdp_spark.session import get_session
from temporai_mivdp_spark.sources import fan_out, load_table

N, CAP, THRESHOLD, ID = 3, 1000, 0.5, "doc_id"


def _tail(sized: DataFrame, threshold: float) -> DataFrame:
    if threshold > 0.0:
        best = F.least(F.col("sa"), F.col("sb"))
        sized = sized.filter(
            best / (F.col("sa") + F.col("sb") - best) >= threshold
        )
    inter = sized.groupBy("id_a", "id_b", "sa", "sb").agg(
        F.count(F.lit(1)).alias("__inter")
    )
    jac = inter.withColumn(
        "jaccard", F.col("__inter") / (F.col("sa") + F.col("sb") - F.col("__inter"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def variant_a(sh: DataFrame) -> DataFrame:
    posts = sh.groupBy("shingle").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ID).alias("id"), F.col("__sz").alias("sz")))
        ).alias("__entries"),
        F.count(F.lit(1)).alias("__df"),
    ).filter(F.col("__df") <= CAP)
    ea = posts.select(F.posexplode("__entries").alias("__pos", "__ea"), "__entries")
    pairs = ea.select(
        F.col("__ea.id").alias("id_a"),
        F.col("__ea.sz").alias("sa"),
        F.explode(F.expr("slice(__entries, __pos + 2, size(__entries))")).alias("__eb"),
    )
    sized = pairs.select(
        "id_a", "sa", F.col("__eb.id").alias("id_b"), F.col("__eb.sz").alias("sb")
    )
    return _tail(sized, THRESHOLD)


def variant_b(spark, sh: DataFrame, scratch_root: str):
    """Returns (build_fn) -> DataFrame: the materialization is part of
    each timed run (fresh run-keyed path), the join plan reads it.
    A's exact __df <= CAP posting filter is reproduced by a cheap
    map-side-combined count over the materialized parquet + broadcast
    anti-join of the (few) over-cap keys."""

    def build() -> DataFrame:
        path = os.path.join(scratch_root, f"sh_{uuid.uuid4().hex}")
        sh.write.mode("overwrite").parquet(path)
        shm = spark.read.parquet(path)
        over = (
            shm.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") > CAP)
            .select("shingle")
        )
        shm = shm.join(F.broadcast(over), "shingle", "left_anti")
        a = shm.select(
            F.col("shingle"),
            F.col(ID).alias("id_a"),
            F.col("__sz").alias("sa"),
        )
        b = shm.select(
            F.col("shingle").alias("__sh_b"),
            F.col(ID).alias("id_b"),
            F.col("__sz").alias("sb"),
        )
        joined = a.join(
            b.hint("shuffle_hash"),
            (a.shingle == F.col("__sh_b")) & (F.col("id_a") < F.col("id_b")),
        ).select("id_a", "sa", "id_b", "sb")
        return _tail(joined, THRESHOLD)

    return build


def variant_c(spark, sh: DataFrame) -> DataFrame:
    import pyarrow as pa

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # A's exact __df <= CAP filter is applied INSIDE emit (a run's length
    # IS the doc frequency, fully visible once the partition is sorted)
    sorted_sh = sh.select("shingle", F.col(ID).alias("id"), "__sz").repartition(
        parts, "shingle"
    ).sortWithinPartitions("shingle", "id")

    out_schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("sa", pa.int32()),
            ("id_b", pa.int64()),
            ("sb", pa.int32()),
        ]
    )

    def emit(batches):
        import numpy as np

        carry_sh = np.empty(0, dtype=np.int64)
        carry_id = np.empty(0, dtype=np.int64)
        carry_sz = np.empty(0, dtype=np.int64)

        def pairs_of(shv, idv, szv, complete_only):
            # complete runs only (the last run may continue in the next
            # batch); returns (out_arrays, leftover slice start)
            if len(shv) == 0:
                return None, 0
            starts = np.flatnonzero(np.r_[True, shv[1:] != shv[:-1]])
            last_start = starts[-1]
            if complete_only:
                shv_c, idv_c, szv_c = (
                    shv[:last_start], idv[:last_start], szv[:last_start]
                )
                starts = starts[:-1]
            else:
                shv_c, idv_c, szv_c = shv, idv, szv
            if len(starts) == 0:
                return None, last_start if complete_only else len(shv)
            lens = np.diff(np.r_[starts, len(shv_c)])
            outs = []
            for L in np.unique(lens):
                if L < 2 or L > CAP:  # cap: run length IS the doc freq
                    continue
                s = starts[lens == L]
                idx = s[:, None] + np.arange(L)
                ia, ib = np.triu_indices(L, 1)
                outs.append(
                    (
                        idv_c[idx[:, ia]].ravel(),
                        szv_c[idx[:, ia]].ravel(),
                        idv_c[idx[:, ib]].ravel(),
                        szv_c[idx[:, ib]].ravel(),
                    )
                )
            return outs, (last_start if complete_only else len(shv))

        def to_batch(outs):
            if not outs:
                return None
            id_a = np.concatenate([o[0] for o in outs])
            sa = np.concatenate([o[1] for o in outs])
            id_b = np.concatenate([o[2] for o in outs])
            sb = np.concatenate([o[3] for o in outs])
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(id_a, pa.int64()),
                    pa.array(sa.astype(np.int32), pa.int32()),
                    pa.array(id_b, pa.int64()),
                    pa.array(sb.astype(np.int32), pa.int32()),
                ],
                schema=out_schema,
            )

        for batch in batches:
            shv = np.concatenate([carry_sh, batch.column(0).to_numpy()])
            idv = np.concatenate([carry_id, batch.column(1).to_numpy()])
            szv = np.concatenate(
                [carry_sz, batch.column(2).to_numpy().astype(np.int64)]
            )
            outs, cut = pairs_of(shv, idv, szv, complete_only=True)
            carry_sh, carry_id, carry_sz = shv[cut:], idv[cut:], szv[cut:]
            rb = to_batch(outs)
            if rb is not None and rb.num_rows:
                yield rb
        outs, _ = pairs_of(carry_sh, carry_id, carry_sz, complete_only=False)
        rb = to_batch(outs)
        if rb is not None and rb.num_rows:
            yield rb

    sized = sorted_sh.mapInArrow(emit, "id_a long, sa int, id_b long, sb int")
    return _tail(sized, THRESHOLD)


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    copies = 0
    variants = ["A", "B", "C"]
    for a in sys.argv[1:]:
        if a.startswith("--inflate="):
            copies = int(a.split("=", 1)[1])
        elif a.startswith("--variants="):
            variants = a.split("=", 1)[1].split(",")
        elif not a.startswith("--"):
            sf_dir = a
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(os.environ.get("REPS", "5"))
    spark = get_session(
        app_name="exp-jaccard-posting",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if copies > 1:
        import tempfile

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from scale_third_decade import inflate_documents

        tmp = tempfile.mkdtemp(prefix=f"exp_jacpost_{copies}x_")
        inflate_documents(spark, tmp, copies)
        sf_dir = tmp
        print(f"inflated {copies}x -> {tmp}", flush=True)

    import tempfile

    scratch_root = tempfile.mkdtemp(prefix="exp_jacpost_scratch_")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zqx")).alias("text"),
    )
    corpus = fan_out(docs.unionByName(mutated), "doc_id")
    toks = corpus.select(
        ID, F.split(normalize_text(F.col("text")), " ").alias("__toks")
    ).filter(F.size("__toks") >= N)
    sets = _hashed_shingle_sets(toks, N, ID)
    sh = sets.select(
        ID, F.size("__set").alias("__sz"), F.explode_outer("__set").alias("shingle")
    )
    hot = _hot_shingle_hashes(toks, N, ID, cap=CAP, sample_inv=8)
    sh = sh.join(F.broadcast(hot), "shingle", "left_anti")

    builders = {}
    if "A" in variants:
        builders["A collect_list "] = lambda: variant_a(sh)
    if "B" in variants:
        builders["B mat+SHJ      "] = variant_b(spark, sh, scratch_root)
    if "C" in variants:
        builders["C sort+mapArrow"] = lambda: variant_c(spark, sh)

    # identity check (hash of sorted pair set — full collect at 100x is
    # driver-heavy, so compare count + xxhash sum)
    sigs = {}
    for name, b in builders.items():
        df = b()
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("id_a", "id_b", F.round(F.col("jaccard"), 9))
            ).alias("h"),
        ).collect()[0]
        sigs[name] = (row.n, row.h)
        print(f"{name}: n={row.n} h={row.h}", flush=True)
    assert len(set(sigs.values())) == 1, f"variants disagree: {sigs}"
    print("identical pair output", flush=True)

    # warm
    for b in builders.values():
        b().write.format("noop").mode("overwrite").save()
    samples = {name: [] for name in builders}
    for _ in range(reps):
        for name, b in builders.items():
            t0 = time.perf_counter()
            b().write.format("noop").mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
    for name, s in samples.items():
        print(f"{name}: min={min(s):.3f} all={s}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
