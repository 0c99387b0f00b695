"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata.

The Spark-side plumbing is real and tested — schema, Arrow-batched
``mapInPandas`` over binary columns, partition sizing — while the actual
codec work (image decode, resampling, frame extraction) is stubbed: the
container ships no media libraries, so decode raises ``NotImplementedError``
unless the deterministic fake is requested (used by tests and the oracle
harness).

Scale notes for the real thing:
* media bytes ride in the same rows as metadata only up to a few MB each;
  beyond that store object-store URIs and fetch inside the UDF batch.
* ``mapInPandas`` receives Arrow batches — decode cost amortizes across a
  batch, and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak
  memory (set it low for video).
* repartition by a content-hash prefix before heavy decode stages so
  stragglers are bounded and retries are cheap.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: canonical media row: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("sniffed_mime", StringType(), True),
    ]
)

_MAGIC = [
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"\x89PNG", "image/png"),
    (b"RIFF", "audio/wav"),
    (b"\x00\x00\x00", "video/mp4"),
]


def _sniff(payload: bytes | None) -> str | None:
    if payload is None:
        return None
    for magic, mime in _MAGIC:
        if payload.startswith(magic):
            return mime
    return "application/octet-stream"


def extract_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column: byte
    length, content hash, magic-number mime sniff. This is the pattern
    every real decode stage follows — per-batch pandas work on
    ``payload`` bytes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else None).astype("Int64"),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "sniffed_mime": payloads.map(_sniff),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, METADATA_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode images to fixed-size float features.

    ``fake=False`` raises: no codec libraries in this container. The
    ``fake=True`` path produces deterministic pseudo-features (md5-seeded)
    with the REAL plumbing — schema, batching, output shape — so the
    downstream pipeline is testable end-to-end.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("features", StringType(), True),  # csv of 8 floats
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv — not available in this "
                    "container; pass fake=True for the deterministic stub"
                )

            def feat(b: bytes | None) -> str | None:
                if b is None:
                    return None
                d = hashlib.md5(b).digest()
                return ",".join(str(round(x / 255.0, 6)) for x in d[:8])

            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": pdf["payload"].map(feat)}
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def resize_image(
    media: DataFrame, target_w: int, target_h: int, fake: bool = False
) -> DataFrame:
    """Resize images to ``target_w × target_h``, emitting a new payload
    plus the recorded dimensions.

    Real path raises (no PIL/opencv in this container); ``fake=True``
    produces a deterministic payload — an md5 keystream over
    ``(content, dims)`` sized like an 8-bit grayscale target — through
    the REAL plumbing: binary-in/binary-out ``mapInPandas``, Arrow
    batches, explicit output schema. Resized payloads are uniform-size,
    so downstream batch memory is exactly ``maxRecordsPerBatch × w × h``
    — set that conf from the target dims in production."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    n_bytes = target_w * target_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv — not available in this "
                    "container; pass fake=True for the deterministic stub"
                )

            def stretch(b: bytes | None) -> bytes | None:
                if b is None:
                    return None
                seed = hashlib.md5(b + f"{target_w}x{target_h}".encode()).digest()
                out = bytearray()
                block = seed
                while len(out) < n_bytes:
                    block = hashlib.md5(block).digest()
                    out.extend(block)
                return bytes(out[:n_bytes])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf["payload"].map(stretch),
                }
            )

    return media.select("media_id", "payload").mapInPandas(batches, out_schema)


def audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature extraction (duration, rms-like level, zero-crossing
    proxy). Real path raises — no audio codec in this container; the
    ``fake=True`` stub derives deterministic values from the content
    hash through the same mapInPandas plumbing a real extractor uses."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("duration_ms", LongType(), True),
            StructField("rms", StringType(), True),  # stringified float, stable
            StructField("zero_crossings", LongType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires soundfile/librosa — not available in "
                    "this container; pass fake=True for the deterministic stub"
                )

            def stats(b: bytes | None) -> tuple[str | None, int | None]:
                if b is None:
                    return None, None
                d = hashlib.md5(b).digest()
                return str(round(d[0] / 255.0, 6)), int.from_bytes(d[1:3], "big")

            pairs = pdf["payload"].map(stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["duration_ms"],
                    "rms": pairs.map(lambda p: p[0]),
                    "zero_crossings": pairs.map(lambda p: p[1]).astype("Int64"),
                }
            )

    return media.select("media_id", "duration_ms", "payload").mapInPandas(
        batches, out_schema
    )


def spread_for_decode(media: DataFrame, partitions: int) -> DataFrame:
    """Repartition by a content-hash prefix before a heavy decode stage:
    pure-random spread (no key skew possible), stable across retries
    (hash of content, not of partition id), and decouples decode
    parallelism from the upstream file layout."""
    return media.repartition(partitions, F.xxhash64(F.col("payload")))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video row into the frame
    timestamps a decoder would extract (sequence + explode — pure
    Catalyst). The decode of each frame is the stubbed stage; the
    partition/batch shape here is the real design."""
    return (
        media.filter(F.col("mime").startswith("video/"))
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "frame_ms")
    )
