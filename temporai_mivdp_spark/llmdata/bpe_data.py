"""Fixed in-repo seed corpus for the PRETRAINED BPE merge table.

Real training-data pipelines do not train a tokenizer inside every
counting query — they count with a tokenizer trained once, offline
(GPT-2's BPE, a sentencepiece model, ...), and the per-corpus trainer
(`bpe.train_bpe`) is that separate offline job. The pretrained table
used by the catalog queries follows the repo's no-stored-model
discipline (md5 LSH planes, trigram langid tables): it is re-derived
deterministically from this fixed seed text at call time, so any
session — and the DuckDB oracle, via inlined VALUES literals — rebuilds
the identical merge list. No model file, no RNG.

The seed is ordinary prose: the multilingual language-ID samples
(``langid_data.TRAIN_SAMPLES`` — reused, not duplicated) plus an
English data-engineering passage, so the learned merges cover both
everyday English subwords and the query/table vocabulary a data-systems
corpus actually contains. Composed for this repo.
"""

from __future__ import annotations

from temporai_mivdp_spark.llmdata.langid_data import TRAIN_SAMPLES

_TECH_PASSAGE = (
    "The query engine reads each table as a stream of row batches and "
    "keeps every scan as close to the data as it can. A filter that "
    "reaches the scan is fast; a filter that runs after a join is slow. "
    "The planner will sort, hash, and merge: a hash join for the big "
    "table, a broadcast for the small one, and a sort merge join when "
    "both sides are large. Each group by key becomes a partial "
    "aggregate, and the agg combines on the map side before the "
    "shuffle moves any value across the cluster. A window over the "
    "order column computes a running value per key without a second "
    "pass over the data. The customer table joins the orders line by "
    "line, and the part and supplier columns prune early when the "
    "filter is pushed down. A spark executor holds one partition of "
    "the batch in memory, sorts it, and spills the rest. The vector "
    "reader decodes a column at a time, so a scan of two columns never "
    "pays for ten. When the stream restarts, the checkpoint replays "
    "the last batch and the state table restores every key and value. "
    "A slow query is usually a big shuffle: group the data by the join "
    "key first, keep the small table broadcast, and let the fast path "
    "stay fast."
)

#: The fixed seed corpus the pretrained merge table derives from.
SEED_TEXT: str = " ".join(list(TRAIN_SAMPLES.values()) + [_TECH_PASSAGE])
