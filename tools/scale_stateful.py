"""Scale evidence for the applyInPandasWithState operators (SCALING.md).

Two claims carry the 100 TB argument for these operators and both are
about STATE, not throughput:

1. ``stream_heavy_hitters`` keeps exactly k counters per key, so
   per-batch wall time must stay FLAT as the stream's CUMULATIVE
   distinct-item count grows (an exact per-item aggregation's state —
   and with it per-batch merge cost — grows without bound on the same
   stream). Measured: 8 sequential micro-batches with fully disjoint
   item domains (cumulative distinct grows 8×) → per-batch
   triggerExecution times.

2. State scales with KEYS (k counters / one open session per key),
   linearly and predictably — a 10× key-cardinality step multiplies
   state rows by exactly 10 and batch time by ~the work ratio, nothing
   superlinear. Measured: heavy hitters and emit-once sessions at K and
   10K keys, events-per-key fixed.

Usage: python tools/scale_stateful.py
Prints markdown table rows for SCALING.md.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from temporai_mivdp_spark.session import get_session  # noqa: E402
from temporai_mivdp_spark.streaming import stateful as st  # noqa: E402


def _run_stream(spark, src_dir, schema, build, name):
    """availableNow run over one-file-per-trigger batches; returns
    (per-batch triggerExecution ms, output row count)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = build(stream)
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination(timeout) returns False on timeout — the sink would
    # then hold a PARTIAL result and the tool would report plausible
    # numbers from it; fail loudly instead (same contract as
    # queries._await_or_raise)
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError(f"streaming query {name} did not finish in 600s")
    batches = [
        p["durationMs"]["triggerExecution"]
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    n_out = spark.sql(f"select count(*) c from {name}").collect()[0].c
    return batches, n_out


def hh_flat_state(spark):
    """Claim 1: disjoint item domains per batch — cumulative distinct
    grows 8x, per-batch time must not."""
    keys, per_key, n_batches = 64, 1500, 8
    d = tempfile.mkdtemp(prefix="hh-flat-")
    for b in range(n_batches):
        (
            spark.range(keys * per_key)
            .select(
                (F.col("id") % keys).alias("group_key"),
                F.concat(
                    F.lit(f"b{b}_item"), (F.col("id") % 997).cast("string")
                ).alias("item"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(d)
        )
    schema = "group_key long, item string"
    try:
        batches, _ = _run_stream(
            spark, d, schema, lambda s: st.stream_heavy_hitters(s, k=8), "hh_flat"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return batches


def key_step(spark, keys, per_key, op):
    d = tempfile.mkdtemp(prefix=f"{op}-step-")
    if op == "hh":
        (
            spark.range(keys * per_key)
            .select(
                (F.col("id") % keys).alias("group_key"),
                (F.col("id") % 997).cast("string").alias("item"),
            )
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(d)
        )
        schema = "group_key long, item string"
        build = lambda s: st.stream_heavy_hitters(s, k=8)  # noqa: E731
    else:
        (
            spark.range(keys * per_key)
            .select(
                (F.col("id") % keys).alias("session_key"),
                F.to_timestamp(
                    F.lit("2030-01-01 00:00:00")
                ).alias("base"),
            )
            .withColumn(
                "ts",
                F.col("base")
                + F.make_interval(mins=(F.col("session_key") % 7).cast("int")),
            )
            .drop("base")
            .coalesce(4)
            .write.mode("overwrite")
            .parquet(d)
        )
        schema = "session_key long, ts timestamp"
        build = lambda s: st.stream_session_finalize(  # noqa: E731
            s.withWatermark("ts", "10 minutes"), gap_minutes=30
        )
    name = f"{op}_k{keys}"
    try:
        t0 = time.perf_counter()
        batches, n_out = _run_stream(spark, d, schema, build, name)
        wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return wall, batches, n_out


def main():
    spark = get_session(
        app_name="mivdp-scale-stateful",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    flat = hh_flat_state(spark)
    print("| heavy-hitters batch # (disjoint domains) | triggerExecution ms |")
    print("|---|---|")
    for i, ms in enumerate(flat):
        print(f"| batch {i} (cumulative distinct ≈ {(i + 1) * 997}) | {ms} |")

    print()
    print("| cell | keys | events | wall s | state rows |")
    print("|---|---|---|---|---|")
    for op, label, state_of in (
        ("hh", "heavy hitters k=8", lambda k: 8 * k),
        ("sess", "emit-once sessions", lambda k: k),
    ):
        for keys in (500, 5000):
            wall, batches, n_out = key_step(spark, keys, 400, op)
            print(
                f"| {label} | {keys} | {keys * 400} | {wall:.2f} "
                f"| ≤{state_of(keys)} |"
            )
    spark.stop()


if __name__ == "__main__":
    main()
