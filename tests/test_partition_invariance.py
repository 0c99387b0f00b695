"""Partition-invariance property tests (round-4 task 7).

Every determinism claim in the sampling/packing/dedup/similarity layers
is a claim about INPUT-LAYOUT independence: the same rows must produce
bit-identical results whether they arrive in 1 partition, 64 hash
partitions, or range-partitioned (sorted) shards — the layouts a real
cluster actually re-deals between stages. Fixed-parallelism tests can't
see a violation (e.g. an order-dependent window tie, a per-partition
RNG); these re-run each op under all three layouts and compare full
result sets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporai_mivdp_spark.llmdata import bpe, dedup, sampling, similarity, text


def _docs(spark, n=120):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "the", "and", "quick", "brown"]
    rows = [
        (
            i,
            " ".join(words[(i * 7 + j) % len(words)] for j in range(5 + i % 23)),
            f"src{i % 3}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _layouts(df, key="doc_id"):
    yield "repartition(1)", df.repartition(1)
    yield "repartition(64)", df.repartition(64)
    yield "rangePartition", df.repartitionByRange(8, F.col(key))


def _assert_layout_invariant(df, op, key="doc_id"):
    want = None
    for name, layout in _layouts(df, key):
        got = sorted(tuple(r) for r in op(layout).collect())
        if want is None:
            want = got
        else:
            assert got == want, f"{name} diverged"
    return want


def test_hash_split_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: sampling.hash_split(
            d, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).select("doc_id", "split"),
    )


def test_stratified_hash_sample_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: sampling.stratified_hash_sample(
            d, {"src0": 0.5, "src1": 1.0}, strata_col="source"
        ).select("doc_id"),
    )


def test_temperature_resample_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: sampling.temperature_resample(d, temperature=2.0).select("doc_id"),
    )


def test_source_quota_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: sampling.source_quota(d, max_per_group=15).select(
            "doc_id", "quota_rank"
        ),
    )


def test_pack_sequences_global_and_sharded_invariant(spark):
    docs = _docs(spark).withColumn("n_tokens", F.length("text"))
    _assert_layout_invariant(
        docs,
        lambda d: sampling.pack_sequences(
            d, max_tokens=300, order_col="doc_id"
        ).select("doc_id", "pack_id"),
    )
    _assert_layout_invariant(
        docs,
        lambda d: sampling.pack_sequences(
            d, max_tokens=300, order_col="doc_id", partition_cols=["source"]
        ).select("doc_id", "pack_id"),
    )


def test_token_budget_sample_invariant(spark):
    docs = _docs(spark).withColumn("n_tokens", F.length("text"))
    _assert_layout_invariant(
        docs,
        lambda d: sampling.token_budget_sample(d, 2_000).select("doc_id"),
    )


def test_sample_exact_k_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs, lambda d: sampling.sample_exact_k(d, 37).select("doc_id")
    )


def test_minhash_signatures_and_lsh_candidates_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: dedup.minhash_lsh_candidates(d, num_hashes=8, bands=4),
    )


def test_exact_duplicates_invariant(spark):
    docs = _docs(spark)
    doubled = docs.unionByName(
        docs.select((F.col("doc_id") + 1000).alias("doc_id"), "text", "source")
    )
    _assert_layout_invariant(doubled, dedup.exact_duplicates)


# slow tier (r13, conftest default-skip): ~18s invariance sweep on the heaviest operator; the cheap
# invariance family below stays in the default run
@pytest.mark.slow
def test_duplicate_clusters_invariant(spark):
    # a chain, a star, and singleton pairs
    edges = [(i, i + 1) for i in range(0, 20)] + [(100, j) for j in (101, 102, 103)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    _assert_layout_invariant(pairs, dedup.duplicate_clusters, key="id_a")


def test_lsh_bucket_assignment_invariant(spark):
    emb = spark.createDataFrame(
        [(i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(16)]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    _assert_layout_invariant(
        emb,
        lambda e: similarity.lsh_topk(e, probes, k=5, tables=2, bits=4, dim=16),
        key="vec_id",
    )


def test_bpe_token_count_invariant(spark):
    docs = _docs(spark)
    merges = bpe.train_bpe(docs, num_merges=30)
    _assert_layout_invariant(
        docs, lambda d: bpe.bpe_token_count(d, merges)
    )


def test_language_id_ngram_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(docs, lambda d: text.language_id_ngram(d))


def test_vocabulary_and_encoding_invariant(spark):
    docs = _docs(spark)
    vocabs = []
    for _, layout in _layouts(docs):
        vocabs.append(
            sorted(
                (r["token"], r["token_id"], r["count"])
                for r in text.build_vocabulary(layout, size=40).collect()
            )
        )
    assert vocabs[0] == vocabs[1] == vocabs[2]
    vocab = text.build_vocabulary(docs, size=40)
    _assert_layout_invariant(
        docs,
        lambda d: text.encode_tokens(d, vocab).select(
            "doc_id", F.col("token_ids").cast("string").alias("ids")
        ),
    )


def test_shard_assign_invariant_and_writer_layout(spark, tmp_path):
    """shard_assign's claims are layout claims: (1) shard + order key are
    input-partitioning-independent (row-local md5), (2) the WRITER
    recipe — repartition(n, shard) + sortWithinPartitions(order) +
    partitioned write — produces the same (shard -> ordered doc list)
    regardless of how the input arrived, i.e. byte-reproducible shard
    files on any cluster size."""
    docs = _docs(spark)
    _assert_layout_invariant(
        docs, lambda d: sampling.shard_assign(d, 8, seed="e0")
    )
    contents = []
    for i, (_, layout) in enumerate(_layouts(docs)):
        out = str(tmp_path / f"shards_{i}")
        (
            sampling.shard_assign(layout, 4, seed="e0")
            .repartition(4, F.col("shard"))
            .sortWithinPartitions("shard_order")
            .write.partitionBy("shard")
            .parquet(out)
        )
        per_shard = {}
        for s in range(4):
            rows = spark.read.parquet(f"{out}/shard={s}").collect()
            # file order is the training order; re-sort ONLY by the
            # written row order surrogate (shard_order) to read it back
            per_shard[s] = [r.doc_id for r in sorted(rows, key=lambda r: r.shard_order)]
        contents.append(per_shard)
    assert contents[0] == contents[1] == contents[2]
    assert sum(len(v) for v in contents[0].values()) == docs.count()


def test_span_coverage_invariant(spark):
    docs = _docs(spark)
    _assert_layout_invariant(
        docs, lambda d: dedup.span_coverage(d, n=4, min_docs=2)
    )


def test_incremental_dedup_invariant(spark):
    """Both incremental stages must be layout-independent on BOTH sides:
    the new shard's partitioning and the state tables' partitioning."""
    docs = _docs(spark)
    seen = docs.limit(40).select(
        F.md5(dedup.normalize_text(F.col("text"))).alias("content_key")
    )
    _assert_layout_invariant(
        docs, lambda d: dedup.incremental_exact_novel(d, seen).select(
            "doc_id", "content_key"
        )
    )
    index = dedup.lsh_band_index(docs.limit(60), num_hashes=8, bands=4)
    _assert_layout_invariant(
        docs,
        lambda d: dedup.incremental_lsh_candidates(
            d, index, num_hashes=8, bands=4
        ),
        key="doc_id",
    )


def test_sketch_state_invariant(spark):
    """Sketch state (bucket minima / histogram counts) must not depend on
    input layout — it is what gets PERSISTED and merged across dumps."""
    from temporai_mivdp_spark.operators import sketches

    docs = _docs(spark)
    _assert_layout_invariant(
        docs,
        lambda d: sketches.bucket_min_sketch(
            d.select("text"), F.col("text"), n_buckets=16
        ),
        key="text",
    )


def test_media_roundtrip_fixtures_invariant(spark):
    """The audio/image fixture generators and their decode passes are
    row-local mapInPandas chains — their output must be bit-identical
    whatever the input layout (Arrow batch boundaries move with the
    partitioning, so a batch-shape dependence would surface here)."""
    from temporai_mivdp_spark.llmdata import multimodal
    from temporai_mivdp_spark.queries_llm import (
        _audio_fixture,
        _image_fixture,
        _video_fixture,
    )

    docs = _docs(spark)

    # The fixtures read documents via _t(spark, sf_dir, "documents"), so
    # the layout sweep writes each layout to parquet and points sf_dir
    # at it — the partitioning carries into the parquet file layout.
    import tempfile

    want = None
    for name, layout in _layouts(docs):
        with tempfile.TemporaryDirectory() as d:
            layout.select("doc_id", "text", "source").write.mode(
                "overwrite"
            ).parquet(f"{d}/documents.parquet")
            audio = multimodal.audio_metadata(
                _audio_fixture(spark, d)
            ).drop("bitrate_kbps")
            image = multimodal.decode_image(_image_fixture(spark, d))
            video = multimodal.video_metadata(_video_fixture(spark, d))
            frames = multimodal.sample_frames(
                _video_fixture(spark, d), every_ms=100, strict=False
            )
            got = (
                sorted(tuple(r) for r in audio.collect()),
                sorted(tuple(r) for r in image.collect()),
                sorted(tuple(r) for r in video.collect()),
                sorted(tuple(r) for r in frames.collect()),
            )
            if want is None:
                want = got
            else:
                assert got == want, f"{name} diverged"
