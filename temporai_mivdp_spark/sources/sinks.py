"""Sinks (S4-S7 in SURVEY.md §2.1).

The reference writes gzipped CSV per stage and re-reads it
(feature_preproc_icu.py:89,254 — in-place overwrite between stages) plus
per-stay CSVs and pickles (data_generation_icu.py:722-724,928-988). Here
the primary sink is immutable, partitioned Parquet: splittable, columnar,
predicate-pushdown-able, and safe to write in parallel from every executor.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S4-S6 primary sink: partitioned Parquet.

    ``partition_by`` replaces the reference's per-stay directory layout
    (data_generation_icu.py:722-724): ``partitionBy("stay_id")`` at small
    scale, or bucketed writes on high-cardinality keys at 100 TB (a
    partition column with millions of distinct values creates millions of
    directories — prefer ``.bucketBy`` via ``saveAsTable`` there).
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink for co-located joins.

    Two tables bucketed identically on the join key (e.g. events and
    cohort on ``stay_id``, 1024 buckets) join WITHOUT a shuffle — at
    100 TB that removes the dominant exchange from every per-stay stage.
    Bucketing beats ``partitionBy`` for high-cardinality keys: millions of
    stay_ids would mean millions of directories; bucketing keeps a fixed
    file count with hash co-location, and ``sort_by`` pre-sorts within
    buckets so window stages skip their sort too.
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # A managed table's location can survive a metastore that forgot
        # the table (fresh derby per session) — .mode("overwrite") alone
        # then fails with LOCATION_ALREADY_EXISTS. Drop both.
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(p):
            fs.delete(p, True)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 512,
    partition_by: list[str] | None = None,
    codec: str | None = None,
) -> int:
    """Small-files compaction: rewrite a Parquet dataset into
    ~``target_file_mb``-sized files. Returns the output file count.

    Incremental pipelines (streaming sinks, per-shard ingest, per-stay
    writes) accrete thousands of KB-sized files; at 100 TB that turns
    every downstream scan into a file-listing + task-scheduling storm and
    wrecks row-group-level pushdown. Compaction is the standing repair:
    size the output from the ACTUAL on-disk bytes (compressed), not row
    counts, so the file count tracks data volume as the table grows.

    Uses ``repartition(n)`` (round-robin shuffle) rather than
    ``coalesce``: coalesce(n) narrows the scan itself to n tasks — a
    giant input would be read by too few workers — and inherits input
    skew; the round-robin exchange costs one pass and yields uniform
    output files. With ``partition_by``, rows are hashed on the partition
    columns instead so each directory is written by as few tasks as
    possible while staying parallel.
    """
    df = spark.read.parquet(src_path)
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for f in df.inputFiles():
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    writer = (
        df.repartition(n, *partition_by) if partition_by else df.repartition(n)
    ).write.mode("overwrite")
    if codec:
        writer = writer.option("compression", codec)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dst_path)
    return n


def write_csv_gz(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    """S4 compatibility sink: gzipped CSV matching the reference artifact
    shape (day_intervals_cohort_v1.py:660-664). ``single_file`` coalesces
    to one partition — only for small outputs; it serializes the write."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode(mode)
        .option("header", "true")
        .option("compression", "gzip")
        # MIMIC-style timestamps; matches readers.read_csv_gz's format so
        # roundtrips are lossless to the second
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
