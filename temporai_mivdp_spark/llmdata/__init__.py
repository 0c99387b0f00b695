"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond the reference's clinical surface, the engine ships the operators a
100 TB LLM-data pipeline needs, all Spark-first:

  dedup        exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding
  similarity   brute-force cosine top-k + IVF-bucketed approximate search
  text         language-ID heuristic, quality scoring + repetition
               signals, token counting, document fingerprinting
  sampling     deterministic hash split (train/val/test), stratified
               hash sampling, temperature source rebalancing,
               concat-and-chunk sequence packing, context-length
               document chunking with overlap (zero-shuffle)
  multimodal   opaque-binary media columns: schema, Arrow-batched
               metadata/feature extraction; REAL stdlib codecs for
               WAV/PCM audio, 24-bit BMP, 8-bit PNG (zlib + all five
               filters) + header-only dims (JPEG/GIF pixels stubbed —
               no codec libs in this container), deterministic fakes
  pipeline     production output layout: doc_id-bucketed tables
               (zero-exchange re-read joins) + byte-sized compaction
  web          URL canonicalization (tracking params, www, ports,
               fragments), host/registrable-domain extraction,
               URL-level dedup, per-domain caps — all built-in exprs

Portability discipline: the dedup/text hashes are built on md5 (identical
in Spark and DuckDB) so every operator stays oracle-checkable.
"""

from temporai_mivdp_spark.llmdata import (
    dedup,
    multimodal,
    pipeline,
    sampling,
    similarity,
    text,
    web,
)

__all__ = [
    "dedup",
    "multimodal",
    "pipeline",
    "sampling",
    "similarity",
    "text",
    "web",
]
