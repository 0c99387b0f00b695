"""Sinks (S4-S7 in SURVEY.md §2.1).

The reference writes gzipped CSV per stage and re-reads it
(feature_preproc_icu.py:89,254 — in-place overwrite between stages) plus
per-stay CSVs and pickles (data_generation_icu.py:722-724,928-988). Here
the primary sink is immutable, partitioned Parquet: splittable, columnar,
predicate-pushdown-able, and safe to write in parallel from every executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


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
