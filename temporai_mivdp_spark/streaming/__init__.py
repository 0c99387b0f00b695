"""Structured Streaming variants of the time-series operators.

The reference is batch-only (SURVEY.md §2.5) — its tumbling-bucket
aggregation (data_generation_icu.py:522-604) is the one operator with a
natural streaming twin. This package keeps the batch and streaming forms
of each operator expression-identical so a pipeline can run either mode:
the bucket ordinal ``floor(hours/bucket)`` of the batch path IS the
``window(ts, "<bucket> hours")`` tumbling window here.

``ingest.py`` extends the same twinning to the LLM-data layer: the
incremental exact/LSH dedup operators become a rolling-ingest
foreachBatch pipeline with idempotent, partition-per-epoch state.
"""

from temporai_mivdp_spark.streaming.ingest import ingest_dedup_stream
from temporai_mivdp_spark.streaming.stateful import (
    stream_ffill,
    stream_heavy_hitters,
    stream_session_finalize,
)
from temporai_mivdp_spark.streaming.windows import (
    read_jsonl_stream,
    read_parquet_stream,
    stream_dedup,
    stream_enrich,
    stream_interval_join,
    stream_session_windows,
    stream_sliding_bucket,
    stream_tumbling_bucket,
)

__all__ = [
    "ingest_dedup_stream",
    "read_jsonl_stream",
    "read_parquet_stream",
    "stream_dedup",
    "stream_enrich",
    "stream_ffill",
    "stream_heavy_hitters",
    "stream_session_finalize",
    "stream_interval_join",
    "stream_session_windows",
    "stream_sliding_bucket",
    "stream_tumbling_bucket",
]
