"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond the reference's clinical surface, the engine ships the operators a
100 TB LLM-data pipeline needs, all Spark-first:

  dedup        exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding;
               bloom-filter decontamination (batch + streaming probes,
               shard merging), repeated-span mining, paraphrase-aware
               contamination expansion
  similarity   brute-force cosine top-k + IVF/LSH approximate search,
               k-means centroid training, per-group mean embeddings
  bpe          real merge-table BPE tokenization: distributed word
               counting, driver-side Sennrich merge training on the
               bounded type table, per-TYPE Arrow-batched application —
               exact token accounting for packing/budget ops
  text         language-ID heuristic, quality scoring + repetition
               signals, CCNet-style perplexity filtering, tf-idf
               keywords, C4-style boilerplate line removal, per-group
               score calibration, token counting, text→ids encoding
               (frequency vocabulary), fingerprinting
  sampling     deterministic hash split (train/val/test; leakage-safe
               across near-dup clusters), stratified hash sampling,
               temperature source rebalancing, token-budget sampling,
               cluster-capped diversity sampling, concat-and-chunk
               sequence packing, context-length chunking (zero-shuffle)
  multimodal   opaque-binary media columns: schema, Arrow-batched
               metadata/feature extraction; REAL stdlib codecs for
               WAV/PCM audio (incl. spectral rFFT features), BMP
               (24/32-bit, paletted 1/4/8-bit, RLE8), full PNG (zlib,
               all five filters, every legal IHDR combo, Adam7),
               BASELINE + PROGRESSIVE JPEG (Huffman, spectral
               selection / successive approximation, any subsampling),
               GIF incl. ANIMATION (disposal 0-3, transparency, timed
               frame sampling) + header-only dims; compressed-audio
               HEADER tier (MP3 frame walk, Ogg Vorbis/Opus pages →
               duration/rate/channels/bitrate + decode_status, no
               entropy decode); deterministic fakes for the rest
               (arithmetic/hierarchical JPEG, non-PCM sample decode)
  pipeline     production output layout: doc_id-bucketed tables
               (zero-exchange re-read joins) + byte-sized compaction
  web          URL canonicalization (tracking params, www, ports,
               fragments), host/registrable-domain extraction,
               URL-level dedup, per-domain caps — all built-in exprs

Portability discipline: the dedup/text hashes are built on md5 (identical
in Spark and DuckDB) so every operator stays oracle-checkable.
"""

from temporai_mivdp_spark.llmdata import (
    bpe,
    dedup,
    multimodal,
    pipeline,
    sampling,
    similarity,
    text,
    web,
)

__all__ = [
    "bpe",
    "dedup",
    "multimodal",
    "pipeline",
    "sampling",
    "similarity",
    "text",
    "web",
]
