"""Streaming window operators.

Late data policy: every stateful operator takes a ``watermark`` —
events older than (max seen event time - watermark) are dropped and their
windows finalized. State size is bounded by (watermark / bucket) windows
per key, which is what makes these safe on an unbounded stream; pick the
watermark from the source's real out-of-orderness, not from wishful
thinking.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 16,
    path_glob: str | None = None,
) -> DataFrame:
    """File-based streaming source over a parquet directory (the landing
    pattern for event feeds at rest). ``maxFilesPerTrigger`` bounds
    per-micro-batch work. ``path`` must be a DIRECTORY (the file source
    refuses a bare file as basePath); ``path_glob`` narrows it to
    matching files — e.g. one table's file inside a multi-table
    landing dir."""
    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.parquet(path)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming twin of ``sources.readers.read_jsonl``: a file-based
    JSONL source with the same 100 TB discipline — explicit schema
    (a streaming source cannot infer one anyway) and PERMISSIVE
    corrupt-line routing so one bad landed file never kills the query.
    ``maxFilesPerTrigger`` bounds per-micro-batch work."""
    if corrupt_col not in schema.fieldNames():
        from pyspark.sql.types import StringType

        schema = schema.add(corrupt_col, StringType(), True)
    return (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def stream_tumbling_bucket(
    events: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    bucket_hours: int,
    aggs: Sequence[Column],
    watermark: str = "2 hours",
) -> DataFrame:
    """W3, streaming form: the batch ``groupBy(floor(hours/bucket))``
    becomes ``groupBy(window(ts, "<bucket> hours"))`` — same buckets, same
    aggregates, plus a watermark for late data. Works under every output
    mode; with ``append`` the bucket emits once its watermark passes."""
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), f"{bucket_hours} hours").alias("bucket"),
            *keys,
        )
        .agg(*aggs)
    )
    return out.select(
        F.col("bucket.start").alias("bucket_start"),
        F.col("bucket.end").alias("bucket_end"),
        *[c for c in out.columns if c != "bucket"],
    )


def stream_session_windows(
    events: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based): the streaming generalization of the
    reference's per-stay event grouping — a session closes after ``gap``
    of silence per key. State per key is one open session."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_event"),
            F.max(ts_col).alias("last_event"),
        )
        .select(
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            *keys,
            "n_events",
            "first_event",
            "last_event",
        )
    )


def stream_dedup(
    events: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop repeats of ``key_cols`` within the
    watermark horizon (``dropDuplicatesWithinWatermark`` keeps state
    bounded — plain dropDuplicates on a stream would grow state forever).
    The streaming face of llmdata.dedup.exact_duplicates."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def stream_sliding_bucket(
    events: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    window_hours: int = 4,
    slide_hours: int = 1,
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window aggregation: each event lands in
    ``window_hours / slide_hours`` overlapping windows (rolling stats
    with a bounded emit rate — the streaming twin of the batch
    ``rolling_stats`` range window). State per key is
    ``(watermark + window) / slide`` open windows; the watermark is what
    keeps that finite on an unbounded stream."""
    if window_hours % slide_hours != 0:
        raise ValueError(
            f"window_hours ({window_hours}) must be a multiple of "
            f"slide_hours ({slide_hours}); Spark would otherwise emit "
            "misaligned window boundaries"
        )
    out = (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(
                F.col(ts_col), f"{window_hours} hours", f"{slide_hours} hours"
            ).alias("win"),
            *keys,
        )
        .agg(*aggs)
    )
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *[c for c in out.columns if c != "win"],
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ts_left: str = "ts",
    ts_right: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: match each left event with right
    events of the same key arriving in ``(ts_left, ts_left + max_delay]``
    — the streaming twin of the batch readmission interval-exists join
    (J8: "a later visit within the gap"), and the general shape of
    click→conversion / order→payment attribution.

    Both sides carry watermarks and the join condition carries the time
    range, which is exactly what lets Structured Streaming bound the
    buffered state: a left row can be dropped once the right watermark
    passes ``ts_left + max_delay``. Outer modes emit the unmatched row
    only at that point — ``how="left_outer"`` is the streaming
    "exists?" label with a delay of the watermark.

    Right-side columns come back suffixed ``_r`` (stream-stream joins
    forbid ambiguous names across sides).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lw = left.withWatermark(ts_left, watermark)
    rw = right.withWatermark(ts_right, watermark)
    for c in rw.columns:
        rw = rw.withColumnRenamed(c, f"{c}_r")
    cond = None
    for k in keys:
        eq = lw[k] == rw[f"{k}_r"]
        cond = eq if cond is None else cond & eq
    tr = F.col(f"{ts_right}_r")
    cond = (
        cond
        & (tr > F.col(ts_left))
        & (tr <= F.col(ts_left) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, how)


def stream_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    (broadcast) static dimension — the streaming form of the engine's
    fact x dictionary broadcast joins (J3/J4). The static side is re-read
    per trigger if its underlying files change, so slowly-changing dims
    work without restarting the query; the stream side never shuffles for
    the join."""
    keys = [on] if isinstance(on, str) else list(on)
    return events.join(F.broadcast(dim), keys, how)
