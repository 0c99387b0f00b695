"""Tests: skew utilities and the stateful streaming ffill."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from temporai_mivdp_spark.operators.skew import salted_group_count, salted_join
from temporai_mivdp_spark.streaming.stateful import stream_ffill
from tests.conftest import ts


def test_salted_group_count_matches_plain(spark):
    rows = [(1, i) for i in range(500)] + [(2, i) for i in range(7)]
    df = spark.createDataFrame(rows, "k: long, v: long")
    got = {r.k: r.n for r in salted_group_count(df, ["k"], salt_buckets=8).collect()}
    assert got == {1: 500, 2: 7}


def test_salted_join_matches_plain_join(spark):
    facts = spark.createDataFrame(
        [(1, i) for i in range(300)] + [(2, 0), (3, 1)], "k: long, v: long"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "cold")], "k: long, name: string")
    got = salted_join(facts, dim, on="k", salt_buckets=4)
    plain = facts.join(dim, "k")
    assert got.count() == plain.count() == 301
    assert {r.name for r in got.collect()} == {"hot", "cold"}


def test_stream_ffill_carries_state_across_microbatches(spark):
    # two parquet files -> maxFilesPerTrigger=1 -> two micro-batches; the
    # fill for batch-2's leading null must come from batch-1's state.
    d = tempfile.mkdtemp(prefix="ffill-src-")
    batch1 = spark.createDataFrame(
        [(1, ts("2024-01-01 00:00:00"), 5.0), (1, ts("2024-01-01 01:00:00"), None)],
        "series_key: long, ts: timestamp, value: double",
    )
    batch2 = spark.createDataFrame(
        [(1, ts("2024-01-01 02:00:00"), None), (1, ts("2024-01-01 03:00:00"), 9.0)],
        "series_key: long, ts: timestamp, value: double",
    )
    batch1.coalesce(1).write.parquet(os.path.join(d, "b=1"))
    batch2.coalesce(1).write.parquet(os.path.join(d, "b=2"))

    src = (
        spark.readStream.schema(batch1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    q = (
        stream_ffill(src)
        .writeStream.format("memory")
        .queryName("t_ffill")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.ts: r.value_filled
        for r in spark.sql("select * from t_ffill").collect()
    }
    assert got[ts("2024-01-01 01:00:00")] == 5.0
    assert got[ts("2024-01-01 02:00:00")] in (5.0, 9.0)  # 5.0 if batches ordered
    assert got[ts("2024-01-01 03:00:00")] == 9.0
    assert len(got) == 4
