"""Curation-pipeline materialization: the output layout half of
``pipeline_docs_curation`` (queries_llm.py).

A 100 TB curation run is not done when the DataFrame is computed — the
layout it lands in decides every downstream read:

* **Curated metadata + doc texts are written BUCKETED on doc_id**
  (sources.write_bucketed). The first thing every training job does is
  join curated metadata back to payloads; with both tables bucketed
  identically that join is a zero-exchange sort-merge over co-located
  buckets — the dominant shuffle of the read path is gone, forever,
  for every consumer.
* **Sequence-packed text shards are COMPACTED** (sources.compact_parquet)
  into ~target-sized files from actual on-disk bytes: per-shard ingest
  and streaming sinks accrete KB-sized files that turn scans into
  file-listing storms; compaction is the standing repair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from temporai_mivdp_spark.sources.sinks import compact_parquet, write_bucketed


def materialize_curation(
    spark: SparkSession,
    curated: DataFrame,
    docs: DataFrame,
    out_path: str,
    table_prefix: str = "curation",
    num_buckets: int = 8,
    target_file_mb: int = 512,
) -> dict[str, int]:
    """Write the curation pipeline's outputs in their production layout.

    ``curated`` is the per-doc curation metadata (the
    ``pipeline_docs_curation`` result: doc_id, token counts, lang, split,
    pack_id); ``docs`` is the (doc_id, text) payload table. Returns
    ``{"text_files": n}`` — the compacted shard count.

    Bucket count at real scale: size so each bucket's largest file is a
    few hundred MB (e.g. 100 TB / 1024 buckets ≈ 100 GB per bucket split
    across files); at test scale a handful suffices — the co-location
    property, not the count, is what the plan depends on.
    """
    write_bucketed(
        curated,
        f"{table_prefix}_meta",
        bucket_by=["doc_id"],
        num_buckets=num_buckets,
        sort_by=["doc_id"],
    )
    write_bucketed(
        docs,
        f"{table_prefix}_docs",
        bucket_by=["doc_id"],
        num_buckets=num_buckets,
        sort_by=["doc_id"],
    )
    # Packed text shards: curated ⋈ texts ordered by (split, pack_id) —
    # the file stream a training loader consumes. Written first however
    # the upstream parallelism left them, then compacted by real bytes.
    raw = f"{out_path}/text_shards_raw"
    final = f"{out_path}/text_shards"
    (
        spark.table(f"{table_prefix}_meta")
        .join(spark.table(f"{table_prefix}_docs"), "doc_id")
        .write.mode("overwrite")
        .parquet(raw)
    )
    n = compact_parquet(spark, raw, final, target_file_mb=target_file_mb)
    return {"text_files": n}


def training_read(spark: SparkSession, table_prefix: str = "curation") -> DataFrame:
    """The downstream consumer's re-read join: curated metadata ⋈ doc
    payloads on the bucketed key. With both sides bucketed on doc_id the
    physical plan contains NO exchange (asserted in tests) — this is the
    join whose shuffle bucketing exists to delete."""
    return spark.table(f"{table_prefix}_meta").join(
        spark.table(f"{table_prefix}_docs"), "doc_id"
    )
