"""Streaming operator tests: parquet file source -> availableNow trigger ->
memory sink, asserting the streaming results equal the batch twin's."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from temporai_mivdp_spark import streaming as st
from temporai_mivdp_spark.operators.timeseries import hours_from_anchor, tumbling_bucket
from tests.conftest import ts


@pytest.fixture(scope="module")
def event_dir(spark):
    rows = [
        (1, ts("2024-01-01 00:10:00"), 5.0),
        (1, ts("2024-01-01 01:20:00"), 7.0),
        (1, ts("2024-01-01 02:05:00"), 9.0),
        (2, ts("2024-01-01 00:40:00"), 1.0),
        (2, ts("2024-01-01 07:00:00"), 3.0),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    d = tempfile.mkdtemp(prefix="stream-src-")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    return d, df


def _run_to_memory(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_tumbling_bucket_matches_batch(spark, event_dir):
    d, batch_df = event_dir
    src = st.read_parquet_stream(spark, d, batch_df.schema)
    bucketed = st.stream_tumbling_bucket(
        src, "ts", ["user_id"], bucket_hours=2,
        aggs=[F.count(F.lit(1)).alias("n"), F.avg("value").alias("v")],
    )
    _run_to_memory(bucketed, "t_buckets")
    got = {
        (r.user_id, r.bucket_start): (r.n, r.v)
        for r in spark.sql("select * from t_buckets").collect()
    }
    # batch twin: floor(hours-from-epoch-anchor / 2) buckets
    anchored = batch_df.withColumn("__a", F.to_timestamp(F.lit("2024-01-01 00:00:00")))
    hourly = hours_from_anchor(anchored, "ts", "__a", out_col="h")
    batch = tumbling_bucket(
        hourly, keys=["user_id"], time_col="h", bucket=2,
        aggs=[F.count(F.lit(1)).alias("n"), F.avg("value").alias("v")],
    )
    want = {
        (r.user_id, ts("2024-01-01 00:00:00") + __import__("datetime").timedelta(hours=2 * r.start_time)): (r.n, r.v)
        for r in batch.collect()
    }
    assert got == want
    assert got[(1, ts("2024-01-01 00:00:00"))] == (2, 6.0)
    assert got[(2, ts("2024-01-01 06:00:00"))] == (1, 3.0)


def test_stream_session_windows(spark, event_dir):
    d, batch_df = event_dir
    src = st.read_parquet_stream(spark, d, batch_df.schema)
    sessions = st.stream_session_windows(src, "ts", ["user_id"], gap="90 minutes")
    _run_to_memory(sessions, "t_sessions")
    rows = spark.sql("select * from t_sessions").collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r.n_events)
    # user 1: all 3 events within 90min gaps -> one session; user 2: two sessions
    assert sorted(per_user[1]) == [3]
    assert sorted(per_user[2]) == [1, 1]


def test_session_window_boundary_is_strict_gt(spark):
    """Load-bearing for the stream_session_agg DuckDB oracle: an event
    exactly `gap` after its predecessor MERGES — Spark's session_window
    starts a new session only when the delta is strictly greater than
    the gap, and session end = last event + gap. The gaps-and-islands
    oracle therefore breaks on `delta > gap`, not `>=`."""
    rows = [("u", t) for t in (0, 100, 250)]
    df = spark.createDataFrame(rows, ["k", "sec"]).withColumn(
        "ts", F.col("sec").cast("timestamp")
    )
    out = (
        df.groupBy(F.session_window("ts", "100 seconds").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("long").alias("st"),
            F.col("w.end").cast("long").alias("en"),
            "n",
        )
    )
    assert sorted(map(tuple, out.collect())) == [(0, 200, 2), (250, 350, 1)]


def test_stream_dedup(spark, event_dir):
    d, batch_df = event_dir
    dup_dir = tempfile.mkdtemp(prefix="stream-dup-")
    batch_df.union(batch_df).coalesce(1).write.mode("overwrite").parquet(dup_dir)
    src = st.read_parquet_stream(spark, dup_dir, batch_df.schema)
    deduped = st.stream_dedup(src, ["user_id", "ts"], "ts")
    q = (
        deduped.writeStream.format("memory").queryName("t_dedup")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.sql("select count(*) c from t_dedup").collect()[0].c == batch_df.count()


def test_stream_sliding_bucket_overlap(spark, event_dir):
    d, batch_df = event_dir
    src = st.read_parquet_stream(spark, d, batch_df.schema)
    out = st.stream_sliding_bucket(
        src, "ts", ["user_id"],
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")],
        window_hours=2, slide_hours=1,
    )
    _run_to_memory(out, "slide_t")
    rows = spark.sql("SELECT * FROM slide_t").collect()
    # user 1 event at 00:10 belongs to windows [23:00-01:00) and [00:00-02:00)
    u1 = [r for r in rows if r.user_id == 1]
    per_event_windows = 2  # window/slide
    assert sum(r.n for r in u1) == 3 * per_event_windows
    # the 01:00-03:00 window holds events at 01:20 and 02:05
    w = [r for r in u1 if r.window_start.hour == 1 and r.window_start.day == 1]
    assert w and w[0].n == 2 and w[0].total == 16.0
    with pytest.raises(ValueError, match="multiple"):
        st.stream_sliding_bucket(src, "ts", ["user_id"], [F.count(F.lit(1)).alias("n")],
                                 window_hours=3, slide_hours=2)


def test_stream_interval_join(spark, event_dir):
    d, batch_df = event_dir
    # right stream: follow-up events; one lands 70 min after user 1's
    # 00:10 event (outside 1h), one 25 min after (inside)
    follow = spark.createDataFrame(
        [
            (1, ts("2024-01-01 00:35:00"), 100.0),   # 25min after 00:10 -> match
            (1, ts("2024-01-01 01:21:00"), 200.0),   # 71min after 00:10 (no), 1min after 01:20 (yes)
            (2, ts("2024-01-01 03:00:00"), 300.0),   # >1h after 00:40 -> no match
        ],
        "user_id: long, ts: timestamp, value: double",
    )
    d2 = tempfile.mkdtemp(prefix="stream-follow-")
    follow.coalesce(1).write.mode("overwrite").parquet(d2)

    left = st.read_parquet_stream(spark, d, batch_df.schema)
    right = st.read_parquet_stream(spark, d2, follow.schema)
    joined = st.stream_interval_join(left, right, on="user_id", max_delay="1 hour")
    q = (
        joined.writeStream.format("memory").queryName("ivj_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.ts.minute, r.value_r)
        for r in spark.sql("SELECT user_id, ts, value_r FROM ivj_t").collect()
    }
    # u1@00:10 <- u1@00:35 (25min later); u1@01:20 <- u1@01:21 (1min later).
    # u1@01:21 is 71min after 00:10 (outside), u2@03:00 is >1h after 00:40.
    assert got == {(1, 10, 100.0), (1, 20, 200.0)}


def test_stream_enrich_static_join(spark, event_dir):
    d, batch_df = event_dir
    dim = spark.createDataFrame([(1, "gold"), (2, "trial")], "user_id: long, tier: string")
    src = st.read_parquet_stream(spark, d, batch_df.schema)
    out = st.stream_enrich(src, dim, on="user_id")
    q = (
        out.writeStream.format("memory").queryName("enrich_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enrich_t").collect()
    assert len(rows) == 5
    assert all(r.tier == ("gold" if r.user_id == 1 else "trial") for r in rows)


def test_ingest_dedup_stream_rolling_shards(spark):
    """Rolling ingest: shard 2 is deduped against shard 1 purely via the
    persisted state tables (exact keys + LSH bands) across a stream
    restart — no corpus rescan, output idempotently partitioned."""
    import tempfile

    from temporai_mivdp_spark.streaming.ingest import (
        _read_state,
        ingest_dedup_stream,
    )

    base = " ".join(f"tok{i % 17} w{i}" for i in range(20))
    d3 = " ".join(f"body{i} tok{i % 11}" for i in range(20))
    shard1 = [
        (1, "alpha " + base),
        (2, "beta " + base),
        (3, d3),
        (4, "gamma delta " + base),
        (5, "alpha " + base),  # in-shard exact dup of 1 -> min id keeps 1
    ]
    shard2 = [
        (6, "beta " + base),  # cross-shard exact dup of 2
        (7, d3 + " zqx"),  # cross-shard NEAR dup of 3 (one appended token)
        (8, "totally different content " + " ".join(f"q{i}" for i in range(20))),
    ]
    schema = "doc_id long, text string"
    src = tempfile.mkdtemp(prefix="ingest-src-")
    state = tempfile.mkdtemp(prefix="ingest-state-")
    out = tempfile.mkdtemp(prefix="ingest-out-")

    def run_available() -> None:
        writer = ingest_dedup_stream(
            spark, src, state, out, schema, num_hashes=8, bands=4
        )
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination(120)

    spark.createDataFrame(shard1, schema).coalesce(1).write.mode("append").parquet(src)
    run_available()
    got1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2, 3, 4}

    # second shard + stream RESTART: offsets come from the checkpoint,
    # dedup memory from the state tables
    spark.createDataFrame(shard2, schema).coalesce(1).write.mode("append").parquet(src)
    run_available()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2, 3, 4, 8}
    by_batch = {r.doc_id: r.ingest_batch for r in rows}
    assert by_batch[8] > by_batch[1]

    # replay visibility rule: a batch reading state excludes its OWN
    # partition (what makes every write idempotent under at-least-once)
    keys_b1 = _read_state(
        spark, f"{state}/keys", "content_key string, ingest_batch long", -1
    )
    excl = _read_state(
        spark, f"{state}/keys", "content_key string, ingest_batch long",
        int(by_batch[8]),
    )
    assert keys_b1.count() == 5 and excl.count() == 4

    # REAL at-least-once replay: drop the last epoch's commit marker
    # (Structured Streaming will re-run that epoch on restart) AND one of
    # its three writes (the bands partition — simulating a crash between
    # the keys write and the bands write). The replayed epoch must see
    # the state its first attempt saw, recompute the same survivors, and
    # overwrite its own partitions — converging on the identical output.
    import shutil
    from pathlib import Path

    last_epoch = int(by_batch[8])
    commits = sorted(
        p for p in Path(f"{state}/checkpoint/commits").iterdir()
        if not p.name.startswith(".")
    )
    assert commits[-1].name == str(last_epoch)
    commits[-1].unlink()
    # the local-FS checksum sidecar must go with it, or the replay's
    # commit rename collides with the stale .crc
    crc = commits[-1].with_name(f".{commits[-1].name}.crc")
    if crc.exists():
        crc.unlink()
    shutil.rmtree(f"{state}/bands/ingest_batch={last_epoch}")
    run_available()
    replay_rows = spark.read.parquet(out).collect()
    assert {(r.doc_id, r.ingest_batch) for r in replay_rows} == {
        (r.doc_id, r.ingest_batch) for r in rows
    }
    # and the torn state write was healed
    bands = spark.read.parquet(f"{state}/bands")
    assert bands.filter(bands.ingest_batch == last_epoch).count() > 0


def test_streaming_ingest_quality_gate(spark):
    """The row-local quality surface (language-ID, quality score, bloom
    decontamination) composes into ONE streaming ingest projection — no
    state, no shuffle — and matches its batch twin row-for-row."""
    import tempfile

    from temporai_mivdp_spark.llmdata import dedup
    from temporai_mivdp_spark.llmdata.text import language_id

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and keeps running"),
        (2, "el zorro marron salta sobre el perro perezoso cada dia"),
        (3, "leaked benchmark answer forty two"),
        (4, "!!!! ???? 12345 67890 @@@@"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    bench = spark.createDataFrame(
        [(100, "leaked benchmark answer forty two")], "doc_id: long, text: string"
    )
    bloom = dedup.shingle_bloom(bench, n=3, m_bits=1 << 14)

    def gate(df):
        flagged = dedup.bloom_hit_columns(df, bloom, n=3)
        return language_id(flagged, passthrough=["n_bloom_hits", "hit_frac"])

    d = tempfile.mkdtemp(prefix="quality-gate-")
    docs.coalesce(1).write.mode("overwrite").parquet(d)
    src = spark.readStream.schema(docs.schema).parquet(d)
    out = gate(src)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("qgate_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.n_bloom_hits, r.lang_pred)
        for r in spark.sql("select * from qgate_t").collect()
    }
    want = {
        r.doc_id: (r.n_bloom_hits, r.lang_pred) for r in gate(docs).collect()
    }
    assert got == want
    assert got[3][0] > 0 and got[1][0] == 0
    assert got[1][1] == "en" and got[2][1] == "es"


def test_streaming_ann_serving_matches_batch(spark):
    """foreachBatch ANN serving: streamed probes against a persisted IVF
    index produce exactly the batch search's answers."""
    import math
    import tempfile

    from temporai_mivdp_spark.llmdata import similarity
    from temporai_mivdp_spark.streaming.ingest import serve_topk_stream

    rows = []
    for i in range(30):
        axis = i % 3
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = 0.05 * (i % 5)
        norm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / norm for x in v]))
    vectors = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents, _ = similarity.kmeans_fit(vectors, n=4, iterations=3)
    index = tempfile.mkdtemp(prefix="serve-index-")
    similarity.persist_ivf_index(vectors, cents, index)

    probes = vectors.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    probe_dir = tempfile.mkdtemp(prefix="serve-probes-")
    probes.coalesce(1).write.mode("overwrite").parquet(probe_dir)
    out_dir = tempfile.mkdtemp(prefix="serve-out-")

    q = (
        serve_topk_stream(
            spark, probe_dir, index, out_dir,
            schema="probe_id long, embedding array<float>", k=5, nprobe=2,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.probe_id, r.rank): (r.neighbor_id, r.cosine)
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r.probe_id, r.rank): (r.neighbor_id, r.cosine)
        for r in similarity.ivf_topk_from_index(
            spark, index, probes, k=5, nprobe=2
        ).collect()
    }
    assert got == want and got


def test_streaming_curation_gate_parity_with_batch(spark):
    """Round-5 gate upgrade parity: the streaming ingest gate must emit
    the SAME trigram language-ID predictions, REAL pretrained-BPE token
    counts, and keep decisions as the batch `curation_gate` — shard by
    shard, including the quarantine side."""
    import tempfile

    from temporai_mivdp_spark.llmdata.bpe import pretrained_merges
    from temporai_mivdp_spark.llmdata.pipeline import curation_gate
    from temporai_mivdp_spark.streaming.ingest import ingest_curation_stream

    shard_a = [
        (1, "the quick brown fox jumps over the lazy dog and keeps running fast"),
        (2, "el zorro marron salta sobre el perro perezoso cada dia del verano"),
        (3, "short doc"),
        (4, "die kinder spielen auf dem platz vor der schule und lernen sprachen"),
    ]
    shard_b = [
        (5, "in the early morning the city is quiet and the air is very cool"),
        (6, "!!!! ???? ,,,, ;;;; .... !!!! ???? ,,,, ;;;; .... dots and marks"),
        (7, "старый человек медленно идёт по узкой улице и думает о годах"),
        (8, "we prepare a simple meal together in the small kitchen every sunday"),
        # degenerate docs: keep is coalesced to FALSE (punct_ratio is
        # NULL for these), so they must land in quarantine/, not vanish
        # from both sinks — the audit-trail contract
        (9, None),
        (10, ""),
    ]
    schema = "doc_id long, text string"
    src = tempfile.mkdtemp(prefix="cur-gate-src-")
    out = tempfile.mkdtemp(prefix="cur-gate-out-")

    dfa = spark.createDataFrame(shard_a, schema)
    dfb = spark.createDataFrame(shard_b, schema)
    dfa.coalesce(1).write.mode("append").parquet(src)

    writer = ingest_curation_stream(spark, src, out, schema)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)
    dfb.coalesce(1).write.mode("append").parquet(src)
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination(120)

    acc = spark.read.parquet(f"{out}/accepted")
    quar = spark.read.parquet(f"{out}/quarantine")
    got = {
        r.doc_id: (r.lang_pred, r.bpe_tokens, r.n_tokens, True)
        for r in acc.collect()
    } | {
        r.doc_id: (r.lang_pred, r.bpe_tokens, r.n_tokens, False)
        for r in quar.collect()
    }

    batch = curation_gate(
        dfa.unionByName(dfb), pretrained_merges(spark)
    ).collect()
    want = {r.doc_id: (r.lang_pred, r.bpe_tokens, r.n_tokens, r.keep) for r in batch}
    assert got == want
    # the gate genuinely exercises every upgraded column: an accepted en
    # doc, language-routed rejects (es/de/ru), a too-short reject, and a
    # punctuation reject
    assert want[1][0] == "en" and want[1][3]
    assert want[2][0] == "es" and not want[2][3]
    assert want[4][0] == "de" and not want[4][3]
    assert want[7][0] == "ru" and not want[7][3]
    assert not want[3][3] and not want[6][3]
    # null/empty text: present in the output (quarantine side), keep=false;
    # a NULL doc carries null n_tokens (array_size null propagation —
    # round-7 edgecase fix; formerly the -1 size() sentinel)
    assert 9 in got and got[9][3] is False
    assert 10 in got and got[10][3] is False
    assert any(v[2] is None for k, v in want.items() if k in (9, 10))
    # real-text docs only: the empty-string doc reports n_tokens=1
    # (whitespace-split semantics) but zero BPE pieces by design
    assert all(
        v[1] > 0 for k, v in want.items() if v[2] is not None and v[2] > 0 and k <= 8
    )


def test_stream_heavy_hitters_bounds_and_exact_tier(spark):
    """SpaceSaving sketch: (a) with distinct items <= k the counts are
    EXACT (match the batch groupBy), (b) under eviction the guarantees
    est >= true >= est - err hold and the frequent item survives."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="hh-src-")
    # key 1: 2 distinct items (fits k=4 exactly); key 2: 10 distinct
    # tail items + one hot item under k=4 -> evictions happen
    rows1 = [(1, "alpha")] * 5 + [(1, "beta")] * 3
    rows2 = [(2, f"tail{i:02d}") for i in range(10)] + [(2, "hot")] * 8
    rows = [(i, k, it) for i, (k, it) in enumerate(rows1 + rows2)]
    df = spark.createDataFrame(rows, "rid: long, group_key: long, item: string")
    # two files -> two micro-batches: state must carry across batches
    half1 = df.filter(F.col("rid") % 2 == 0).drop("rid")
    half2 = df.filter(F.col("rid") % 2 == 1).drop("rid")
    half1.coalesce(1).write.mode("overwrite").parquet(d)
    half2.coalesce(1).write.mode("append").parquet(d)
    df = df.drop("rid")

    src = st.read_parquet_stream(spark, d, df.schema, max_files_per_trigger=1)
    out = st.stream_heavy_hitters(src, k=4)
    q = (
        out.writeStream.format("memory").queryName("hh_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from hh_t").collect()
    # latest snapshot per key = rows with that key's max n_seen
    latest = {}
    for r in got:
        if r.group_key not in latest or r.n_seen > latest[r.group_key][0]:
            latest[r.group_key] = (r.n_seen, [])
    for r in got:
        if r.n_seen == latest[r.group_key][0]:
            latest[r.group_key][1].append(r)

    # key 1: exact tier (2 distinct <= k=4)
    n1, rows = latest[1]
    assert n1 == 8
    exact = {r.item: (r.est_count, r.max_err) for r in rows}
    assert exact == {"alpha": (5, 0), "beta": (3, 0)}

    # key 2: eviction tier. n_seen = 18, true(hot) = 8 > 18/4 -> hot
    # MUST be in the summary with est >= 8 >= est - err
    n2, rows = latest[2]
    assert n2 == 18
    summ = {r.item: (r.est_count, r.max_err) for r in rows}
    assert len(summ) == 4
    assert "hot" in summ
    est, err = summ["hot"]
    assert est >= 8 >= est - err
    # every estimate is bounded by true + n/k (SpaceSaving worst case)
    for item, (est, err) in summ.items():
        true = 8 if item == "hot" else 1
        assert est <= true + n2 // 4
        assert est - err <= true


# slow tier (r13, conftest default-skip): ~23s replay stress (same finalize path as above)
@pytest.mark.slow
def test_stream_session_finalize_emit_once(spark):
    """Emit-on-close sessions: in-batch gap closes immediately; a
    cross-batch open session emits exactly once when the WATERMARK
    passes its timeout (event-time timeout path); still-open sessions
    emit nothing."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="sess-src-")
    schema = "session_key: long, ts: timestamp"
    # batch 1 / key 1: session A (00:00, 00:10) then 50-min gap ->
    # closes A in-batch; session B (01:00, 01:05) stays open
    f1 = [(1, ts("2024-01-01 00:00:00")), (1, ts("2024-01-01 00:10:00")),
          (1, ts("2024-01-01 01:00:00")), (1, ts("2024-01-01 01:05:00"))]
    # batch 2 / key 9: pushes watermark to ~02:59 > B's timeout 01:35
    f2 = [(9, ts("2024-01-01 03:00:00"))]
    # batch 3: B times out (hasTimedOut path); key 9's 03:00 session
    # closes in-batch via the 3h gap; (9, 06:00) stays open forever
    f3 = [(9, ts("2024-01-01 06:00:00"))]
    for i, rows in enumerate([f1, f2, f3]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(d)

    src = st.read_parquet_stream(
        spark, d, spark.createDataFrame(f1, schema).schema, max_files_per_trigger=1
    ).withWatermark("ts", "1 minute")
    out = st.stream_session_finalize(src, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sess_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.session_key, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sess_t").collect()
    }
    assert got == {
        (1, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2),
        (1, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:05:00"), 2),
        (9, ts("2024-01-01 03:00:00"), ts("2024-01-01 03:00:00"), 1),
    }


def test_fix_mojibake_streaming_matches_batch(spark):
    """fix_mojibake is a projection (regex flag + routed Arrow kernel,
    no aggregation/state) — it must run unchanged inside a streaming
    query and agree with the batch path row for row. This is the
    pre-gate repair stage an ingest pipeline runs before
    curation_gate."""
    import tempfile as _tf

    from temporai_mivdp_spark.llmdata import text as t
    from tests.test_llmdata import _sloppy_display

    orig = "café — naïve 😀"
    rows = [
        (1, _sloppy_display(orig.encode("utf-8"))),
        (2, "plain ascii"),
        (3, "SÃO PAULO"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    d = _tf.mkdtemp(prefix="moji-src-")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    src = st.read_parquet_stream(spark, d, df.schema)
    q = (
        t.fix_mojibake(src)
        .writeStream.format("memory").queryName("moji_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.text, r.was_fixed)
        for r in spark.sql("select * from moji_t").collect()
    }
    want = {r.doc_id: (r.text, r.was_fixed) for r in t.fix_mojibake(df).collect()}
    assert got == want
    assert got[1] == (orig, True)


# slow tier (r13, conftest default-skip): ~79s late-data stress; session finalize semantics stay covered by
# test_stream_session_agg + the stream_session_agg oracle
@pytest.mark.slow
def test_stream_session_finalize_late_row_never_regresses_end(spark):
    """A late-but-within-watermark row joins the open session without
    moving its END backwards: the envelope extends (start may move
    earlier), the count grows, and the timed-out emission reflects the
    true envelope."""
    import tempfile as _tf

    d = _tf.mkdtemp(prefix="sess-late-")
    schema = "session_key: long, ts: timestamp"
    f1 = [(1, ts("2024-01-01 10:00:00"))]
    f2 = [(1, ts("2024-01-01 09:50:00"))]  # late; watermark is 09:00
    f3 = [(9, ts("2024-01-01 13:00:00"))]  # pushes watermark past timeout
    f4 = [(9, ts("2024-01-01 16:00:00"))]  # batch where the timeout fires
    for i, rows in enumerate([f1, f2, f3, f4]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(d)
    src = st.read_parquet_stream(
        spark, d, spark.createDataFrame(f1, schema).schema, max_files_per_trigger=1
    ).withWatermark("ts", "1 hour")
    out = st.stream_session_finalize(src, gap_minutes=30)
    q = (
        out.writeStream.format("memory").queryName("sess_late_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r.session_key, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from sess_late_t").collect()
    }
    assert (1, ts("2024-01-01 09:50:00"), ts("2024-01-01 10:00:00"), 2) in got
    # no emission may carry a regressed end for key 1
    assert not any(k == 1 and e < s for k, s, e, _ in got)


# slow tier (r13, conftest default-skip): ~11s checkpoint-restart stress; the restart class stays covered by
# test_ingest_dedup_stream_mid_feed_kill_and_resume
@pytest.mark.slow
def test_stream_tumbling_bucket_checkpoint_restart_exactly_once(spark):
    """Recovery parity (r11 verdict "Next round" §4): kill a tumbling-
    bucket aggregation between feeds, restart from the checkpoint, and
    the memory-sink result must match the epoch-aligned DuckDB oracle
    over BOTH feeds — exactly-once across the restart.

    The discriminator that makes this a real state-recovery test:
    shard 1's input FILE is deleted before the restart, so shard 1's
    contribution can only come from the restored state store (a fresh
    start over the surviving files would lose bucket counts — asserted
    as the negative control). A torn-commit replay (last commit marker
    deleted) must converge to the same result: the state store rolls
    back to the last committed version before replaying."""
    import shutil
    import tempfile
    from pathlib import Path

    import duckdb

    shard1 = [
        (1, ts("2024-01-01 00:10:00"), 5.0),
        (1, ts("2024-01-01 01:20:00"), 7.0),
        (2, ts("2024-01-01 00:40:00"), 1.0),
    ]
    shard2 = [
        (1, ts("2024-01-01 01:50:00"), 3.0),  # adds to shard1's (1, 00:00) bucket
        (1, ts("2024-01-01 02:05:00"), 9.0),
        (2, ts("2024-01-01 07:00:00"), 3.0),
    ]
    schema = "user_id: long, ts: timestamp, value: double"
    src = tempfile.mkdtemp(prefix="tb-restart-src-")
    ckpt = tempfile.mkdtemp(prefix="tb-restart-ckpt-")

    def run(name: str) -> None:
        stream = st.read_parquet_stream(
            spark, src, spark.createDataFrame(shard1, schema).schema
        )
        bucketed = st.stream_tumbling_bucket(
            stream, "ts", ["user_id"], bucket_hours=2,
            aggs=[F.count(F.lit(1)).alias("n"), F.avg("value").alias("v")],
        )
        q = (
            bucketed.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(shard1, schema).coalesce(1).write.mode("append").parquet(src)
    run("tb_epoch1")

    # crash between feeds: shard 2 lands, shard 1's file is GONE
    for f in Path(src).glob("*.parquet"):
        f.unlink()
    spark.createDataFrame(shard2, schema).coalesce(1).write.mode("append").parquet(src)
    run("tb_epoch2")
    got = {
        (r.user_id, r.bucket_start): (r.n, round(r.v, 6))
        for r in spark.sql("select * from tb_epoch2").collect()
    }

    # epoch-aligned DuckDB oracle over the union of both feeds
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(user_id BIGINT, ts TIMESTAMP, value DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", shard1 + shard2)
    want = {
        (u, b): (n, round(v, 6))
        for u, b, n, v in con.execute(
            "SELECT user_id, to_timestamp(floor(epoch(ts) / 7200) * 7200)"
            "::TIMESTAMP, count(*), avg(value) FROM ev GROUP BY 1, 2"
        ).fetchall()
    }
    assert got == want
    # negative control: the (1, 00:00) bucket NEEDS shard1's state —
    # losing it would leave n=1 (shard2's lone in-bucket row)
    assert got[(1, ts("2024-01-01 00:00:00"))] == (3, 5.0)

    # torn-commit replay: drop the last commit marker (and its local-FS
    # .crc sidecar); the replayed epoch must converge on the same table
    commits = sorted(
        p for p in (Path(ckpt) / "commits").iterdir()
        if not p.name.startswith(".")
    )
    commits[-1].unlink()
    crc = commits[-1].with_name(f".{commits[-1].name}.crc")
    if crc.exists():
        crc.unlink()
    run("tb_replay")
    replay = {
        (r.user_id, r.bucket_start): (r.n, round(r.v, 6))
        for r in spark.sql("select * from tb_replay").collect()
    }
    assert replay == want
    shutil.rmtree(src, ignore_errors=True)


def test_ingest_dedup_stream_mid_feed_kill_and_resume(spark):
    """Recovery parity for the STATEFUL ingest path: all three shards are
    on disk before the query starts (one file per micro-batch); the
    query is killed as soon as the first epoch commits — mid-feed, with
    later epochs unprocessed or torn — then restarted from the
    checkpoint. The resumed run must process exactly the remaining
    epochs (batch ids continue, nothing reprocessed from scratch) and
    the final survivor set must equal the full-feed expectation."""
    import tempfile
    import time
    from pathlib import Path

    from temporai_mivdp_spark.streaming.ingest import ingest_dedup_stream

    base = " ".join(f"tok{i % 17} w{i}" for i in range(20))
    dC = " ".join(f"body{i} tok{i % 11}" for i in range(20))
    shards = [
        [(1, "alpha " + base), (2, "beta unrelated " + dC)],
        [(3, "alpha " + base), (4, " ".join(f"gamma{i} r{i % 7}" for i in range(20)))],
        # 3 = exact dup of 1; 4 = fresh content
        [(5, "beta unrelated " + dC + " zqx"), (6, "fresh " + " ".join(f"q{i}" for i in range(20)))],
        # 5 = near dup of 2 (one appended token)
    ]
    schema = "doc_id long, text string"
    src = tempfile.mkdtemp(prefix="kill-src-")
    state = tempfile.mkdtemp(prefix="kill-state-")
    out = tempfile.mkdtemp(prefix="kill-out-")
    for i, rows in enumerate(shards):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append"
        ).parquet(src)
    # the file source orders shards by modification time; pin mtimes
    # explicitly (widely spaced, write-order) so arrival order — and
    # therefore which of an exact/near-dup pair survives — is
    # deterministic under suite load, where real mtimes can collide
    import os

    now = time.time()
    for f in sorted(Path(src).glob("*.parquet")):
        # parquet part files sort lexicographically in write order only
        # within a job; use the data to order: read each file's min id
        ids = [r.doc_id for r in spark.read.parquet(str(f)).collect()]
        shard_idx = min(ids) // 2  # shards are (1,2), (3,4), (5,6)
        os.utime(f, (now + 100 * shard_idx, now + 100 * shard_idx))

    def writer():
        return ingest_dedup_stream(
            spark, src, state, out, schema,
            num_hashes=8, bands=4, max_files_per_trigger=1,
        )

    q = writer().trigger(availableNow=True).start()
    commits = Path(f"{state}/checkpoint/commits")
    deadline = time.time() + 90
    while time.time() < deadline:
        if commits.exists() and any(
            not p.name.startswith(".") for p in commits.iterdir()
        ):
            break
        time.sleep(0.05)
    q.stop()  # kill: >=1 epoch committed, the rest unprocessed or torn
    q.awaitTermination(60)
    n_committed = len([p for p in commits.iterdir() if not p.name.startswith(".")])
    assert n_committed >= 1

    q2 = writer().trigger(availableNow=True).start()
    q2.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2, 4, 6}
    # batch ids continued across the kill: one epoch per file, no
    # renumbering (a trailing zero-data finalizing batch is tolerated)
    assert {r.ingest_batch for r in rows} <= {0, 1, 2}
    n_final = len([p for p in commits.iterdir() if not p.name.startswith(".")])
    assert n_final in (3, 4), n_final
