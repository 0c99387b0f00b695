"""Adversarial-corpus differential: the oracle harness over degenerate rows.

The standard harness (tools/oracle_check.py) runs engine vs DuckDB on
the driver's clean synthetic tables — which contain no null text, no
empty strings, no whitespace-only documents. Null/empty inputs are
exactly where engine semantics silently fork (Spark's ``size(null)`` is
-1 while DuckDB's ``len(NULL)`` is NULL — the bug class the
quality-model mirror test caught in round 7), so this tool re-runs the
SAME per-entry comparison on a corpus whose ``documents`` table is
augmented with adversarial rows:

null text, empty string, whitespace-only, mixed-whitespace, a single
token, punctuation-only, digits-only, a single uppercase char,
repeated stopwords, a 5000-token giant, CRLF lines, and an exact
duplicate of a base-corpus document (cross-dup against real data).

This base tier's adversarial text is ASCII so it isolates NULL/empty/
shape semantics; the ``--unicode`` tier carries the non-ASCII rows.
(Historically the base tier was ASCII-only out of necessity — the
counters used ``\\b``, whose Java/RE2 semantics diverge off ASCII;
round 10 replaced ``\\b`` with an explicit [a-z0-9_] boundary both
engines agree on, so the unicode tier now checks every entry.)

Usage: python tools/edgecase_check.py [--unicode|--embeddings] [query ...]
Exit 0 iff every checked entry matches its oracle on the augmented
corpus. tests/test_entry.py::test_edgecase_corpus_parity runs the same
augmentation for a fast subset; this tool is the full sweep.

``--embeddings`` augments the EMBEDDINGS table instead (null vector,
all-zero vector with zero norm, huge magnitudes, float32 denormals, a
NaN-poisoned vector, an exact duplicate and an exact negation of a base
row) and checks the embedding-reading entries — the degenerate-vector
counterpart of the text tier: zero-norm cosine (0/0), NaN propagation
through ranking, and null-vector exclusion are exactly where engine
semantics fork.

``--unicode`` swaps in the UNICODE adversarial rows (accents, CJK,
Cyrillic, emoji, NBSP, combining marks). Since round 10 NO entry is
skipped: the stopword/marker counters that used ``\\b`` (Java
Unicode-aware vs RE2 ASCII — the old UNICODE_EXEMPT class) now use an
explicit [a-z0-9_] boundary both engines evaluate identically, so the
md5/normalize/shingle/chunk/rank chains AND the counting features must
be byte-portable across engines on any UTF-8 text, and this tier
proves it.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import duckdb  # noqa: E402

BASE = "/root/testdata/sf0.001"

#: (doc_id, text) — ids far above any real id; lang/source chosen to
#: flow through every filter the catalog applies (langid entries
#: re-predict language themselves)
ADVERSARIAL_DOCS = [
    (9_000_001, None),
    (9_000_002, ""),
    (9_000_003, "   "),
    (9_000_004, " \t\n  \r\n "),
    (9_000_005, "word"),
    (9_000_006, "!!!???;;;,,,..."),
    (9_000_007, "12345 67890 11111"),
    (9_000_008, "A"),
    (9_000_009, "the the the the the the"),
    (9_000_010, "tok " * 5000),
    (9_000_011, "line one\r\nline two\r\nline one\r\n"),
]


#: unicode tier: exercises multibyte lower/md5/strlen/split portability
UNICODE_DOCS = [
    (9_100_001, "Café straße naïve jalapeño crème brûlée résumé"),
    (9_100_002, "日本語のテキストです 機械学習 データ処理 大規模 分散"),
    (9_100_003, "Привет мир это русский текст для проверки"),
    (9_100_004, "mixed ascii and 中文 plus émojis 🎉🚀 and ñ"),
    (9_100_005, "nbsp separated tokens here"),
    (9_100_006, "combining á é marks vs precomposed á é"),
    (9_100_007, "ΑΒΓΔ ελληνικά κείμενο UPPER Ελληνικά"),
    (9_100_008, "tab\tand em-space whitespace kinds"),
]

#: the catalog entries that read the embeddings table — the --embeddings
#: tier's domain (everything else never sees a vector)
EMBEDDING_ENTRIES = [
    "dedup_embedding_neardup",
    "dedup_semantic",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "sim_mean_vectors",
    "embed_kmeans",
    "stream_serve_topk",
]


def adversarial_vectors(base_vec: list[float], base_label: int, dim: int):
    """(vec_id, embedding|None, label) rows: ids far above any real id so
    deterministic_centroids (lowest-id seeds) never elects one."""
    nan = float("nan")
    return [
        (9_000_001, None, 0),                       # null vector
        (9_000_002, [0.0] * dim, 0),                # zero norm -> 0/0 cosine
        (9_000_003, [1.0e30] * dim, 1),             # huge magnitudes
        (9_000_004, [1.0e-40] * dim, 1),            # float32 denormals
        (9_000_005, [-1.0] * dim, 0),               # uniform negative
        (9_000_006, list(base_vec), base_label),    # exact dup: cosine = 1
        (9_000_007, [-x for x in base_vec], base_label),  # negation: cosine = -1
        (9_000_008, [nan] + [1.0] * (dim - 1), 1),  # NaN poison
    ]


#: RETIRED (round 10): formerly the entries whose stopword/marker
#: counters used \b — Java's \b is Unicode-aware, DuckDB/RE2's is
#: ASCII, so their parity domain was ASCII-only by measurement. The
#: counters now use an explicit [a-z0-9_] boundary (lookarounds on the
#: Spark side, the doubled-boundary-char form on the RE2 side — see
#: llmdata/text.py::_BOUNDARY_L and queries_llm._PAD), which both
#: engines evaluate identically on any Unicode text, so the unicode
#: tier checks every entry.
UNICODE_EXEMPT: set[str] = set()


def build_embeddings_corpus(out_dir: str) -> None:
    """Copy every sf0.001 table; augment EMBEDDINGS with the adversarial
    vectors (see ``adversarial_vectors``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for p in Path(BASE).glob("*.parquet"):
        if p.name == "embeddings.parquet":
            continue
        target = Path(out_dir) / p.name
        if p.is_dir():
            shutil.copytree(p, target)
        else:
            shutil.copy(p, target)

    base = pq.read_table(f"{BASE}/embeddings.parquet")
    base_vec = base.column("embedding")[0].as_py()
    base_label = base.column("label")[0].as_py()
    rows = adversarial_vectors(base_vec, base_label, len(base_vec))
    extra = pa.table(
        {
            "vec_id": pa.array(
                [r[0] for r in rows], type=base.schema.field("vec_id").type
            ),
            "embedding": pa.array(
                [r[1] for r in rows], type=base.schema.field("embedding").type
            ),
            "label": pa.array(
                [r[2] for r in rows], type=base.schema.field("label").type
            ),
        }
    )
    pq.write_table(pa.concat_tables([base, extra]), f"{out_dir}/embeddings.parquet")


def build_corpus(out_dir: str, rows_override=None) -> None:
    """Copy every sf0.001 table; augment documents with the adversarial
    rows (plus an exact duplicate of the first base document)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    for p in Path(BASE).glob("*.parquet"):
        if p.name == "documents.parquet":
            continue
        target = Path(out_dir) / p.name
        if p.is_dir():
            shutil.copytree(p, target)
        else:
            shutil.copy(p, target)

    base = pq.read_table(f"{BASE}/documents.parquet")
    first_text = base.column("text")[0].as_py()
    rows = (
        rows_override
        if rows_override is not None
        else ADVERSARIAL_DOCS + [(9_000_012, first_text)]
    )
    extra = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=base.schema.field("doc_id").type),
            "text": pa.array([r[1] for r in rows], type=base.schema.field("text").type),
            "lang": pa.array(["en"] * len(rows), type=base.schema.field("lang").type),
            "source": pa.array(["src1"] * len(rows), type=base.schema.field("source").type),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else None for r in rows],
                type=base.schema.field("n_chars").type,
            ),
        }
    )
    pq.write_table(pa.concat_tables([base, extra]), f"{out_dir}/documents.parquet")


def main() -> int:
    unicode_tier = "--unicode" in sys.argv
    emb_tier = "--embeddings" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("--")}
    if emb_tier:
        only = only & set(EMBEDDING_ENTRIES) if only else set(EMBEDDING_ENTRIES)

    import __spark_entry__ as entrymod
    from temporai_mivdp_spark.session import get_test_session

    tmp = tempfile.mkdtemp(prefix="mivdp_edgecase_")
    try:
        if emb_tier:
            build_embeddings_corpus(tmp)
        else:
            build_corpus(tmp, rows_override=UNICODE_DOCS if unicode_tier else None)

        # same comparison core as oracle_check (kept in that module) —
        # driver-bug-compatible pandas canonicalization included
        sys.path.insert(0, "tools")
        from oracle_check import compare_entry, duck_connection

        spark = get_test_session(cpus=8)
        con = duck_connection(tmp)
        qs, oracles = entrymod.queries(), entrymod.oracle_sql()

        failures, checked = [], 0
        for name, fn in qs.items():
            if only and name not in only:
                continue
            if name not in oracles:
                continue
            if unicode_tier and name in UNICODE_EXEMPT:
                print(f"skip  {name}: \\b parity is ASCII-domain (UNICODE_EXEMPT)")
                continue
            checked += 1
            t0 = time.time()
            try:
                sdf = fn(spark, tmp)
                problems, n_rows = compare_entry(sdf, con, oracles[name])
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL  {name}: error: {e}")
                continue
            if problems:
                failures.append(name)
                print(f"FAIL  {name}: " + "; ".join(problems))
            else:
                print(f"PASS  {name}: {n_rows} rows ({time.time()-t0:.1f}s)")

        tier = (
            "degenerate-vector"
            if emb_tier
            else ("unicode" if unicode_tier else "degenerate-row")
        )
        print(f"\n{checked - len(failures)}/{checked} pass on the {tier} adversarial corpus")
        return 1 if failures else 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
