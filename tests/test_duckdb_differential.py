"""DuckDB differentials for operators OUTSIDE the 50-entry driver
catalog: the same engine-vs-engine check `tools/oracle_check.py` runs
for catalog queries, applied in pytest to the round-3 additions so the
cap doesn't cap the rigor. Each test runs the Spark op and an
independent DuckDB SQL restatement over the identical rows and compares
exact values (floats to 1e-9 — these plans are deterministic by
construction)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from temporai_mivdp_spark.llmdata import dedup, text

NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

DOCS = [
    (1, "the licensed header text appears here\nunique body alpha one two"),
    (2, "the licensed header text appears here\nother body beta three"),
    (3, "no shared content in this one at all whatsoever"),
    (4, "short doc"),
    (5, "the licensed header text appears here\nthird body gamma"),
    (6, "repeated inside repeated inside repeated inside itself only"),
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    return con


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_repeated_spans_matches_duckdb(spark, duck, docs):
    got = {
        (r.n_docs, r.n_occurrences, r.span)
        for r in dedup.repeated_spans(docs, window=6, min_docs=2).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            f"""
            WITH t AS (
              SELECT doc_id, string_split({NORM}, ' ') AS w FROM documents
            ),
            spans AS (
              SELECT doc_id, array_to_string(w[i:i+5], ' ') AS span
              FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 5)) AS i
                    FROM t WHERE len(w) >= 6)
            ),
            per_doc AS (
              SELECT span, doc_id, count(*) AS occ FROM spans GROUP BY 1, 2
            )
            SELECT count(*) AS n_docs, CAST(sum(occ) AS BIGINT) AS n_occurrences, span
            FROM per_doc GROUP BY span HAVING count(*) >= 2
            """
        ).fetchall()
    }
    assert got == want
    assert got, "the shared header must produce spans"


def test_quantile_normalize_matches_duckdb(spark, duck):
    rows = [(i, f"g{i % 2}", float((i * 7) % 13)) for i in range(20)]
    sdf = spark.createDataFrame(rows, "doc_id: long, grp: string, score: double")
    duck.register("scores", pd.DataFrame(rows, columns=["doc_id", "grp", "score"]))
    got = {
        r.doc_id: r.score_pct
        for r in text.quantile_normalize(sdf, "score", group_col="grp").collect()
    }
    want = dict(
        duck.execute(
            "SELECT doc_id, percent_rank() OVER (PARTITION BY grp ORDER BY score) "
            "FROM scores"
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_tfidf_matches_duckdb(spark, duck, docs):
    got = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf, r.rank)
        for r in text.tfidf_top_terms(docs, k=3).collect()
    }
    want = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in duck.execute(
            f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split({NORM}, ' ')) AS term FROM documents
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf FROM toks
              WHERE term != '' GROUP BY 1, 2
            ),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
            scored AS (
              SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                     tf.tf * ln(n.nd * 1.0 / dfq.df) AS tfidf
              FROM tf JOIN dfq USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, df, tfidf,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, term ASC) AS rank
            FROM scored QUALIFY tfidf > 0 AND rank <= 3
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for k, (tf_s, df_s, tfidf_s, rank_s) in got.items():
        tf_d, df_d, tfidf_d, rank_d = want[k]
        assert (tf_s, df_s, rank_s) == (tf_d, df_d, rank_d), (k, got[k], want[k])
        assert abs(tfidf_s - tfidf_d) < 1e-9


def test_strip_common_lines_matches_duckdb(spark, duck, docs):
    got = {
        r.doc_id: r.text
        for r in text.strip_common_lines(docs, min_docs=2).collect()
    }
    want = dict(
        duck.execute(
            """
            WITH split AS (
              SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents
            ),
            lines AS (
              SELECT doc_id, parts[pos] AS line, pos
              FROM (SELECT doc_id, parts,
                           unnest(generate_series(1, len(parts))) AS pos
                    FROM split)
            ),
            freq AS (
              SELECT trim(line) AS t FROM lines WHERE trim(line) != ''
              GROUP BY trim(line) HAVING count(DISTINCT doc_id) >= 2
            ),
            kept AS (
              SELECT doc_id, line, pos FROM lines
              WHERE trim(line) = '' OR trim(line) NOT IN (SELECT t FROM freq)
            )
            SELECT d.doc_id,
                   coalesce((SELECT string_agg(line, chr(10) ORDER BY pos)
                             FROM kept WHERE kept.doc_id = d.doc_id), '')
            FROM documents d
            """
        ).fetchall()
    )
    assert got == want


def test_mean_vectors_matches_duckdb(spark, duck):
    rows = [
        ("a", [1.0, 3.0, 5.0]),
        ("a", [3.0, 5.0, 7.0]),
        ("b", [10.0, 0.0, 2.0]),
    ]
    sdf = spark.createDataFrame(rows, "src: string, embedding: array<double>")
    duck.register("vecs", pd.DataFrame(rows, columns=["src", "embedding"]))
    from temporai_mivdp_spark.llmdata import similarity

    got = {
        r.src: (list(r.embedding), r.n_vectors)
        for r in similarity.mean_vectors(sdf, "src").collect()
    }
    want = {
        r[0]: (list(r[1]), r[2])
        for r in duck.execute(
            """
            WITH ex AS (
              SELECT src, pos, embedding[pos] AS x
              FROM (SELECT src, embedding,
                           unnest(generate_series(1, len(embedding))) AS pos
                    FROM vecs)
            ),
            per_pos AS (
              SELECT src, pos, avg(x) AS m, count(*) AS c FROM ex GROUP BY 1, 2
            )
            SELECT src, list(m ORDER BY pos), CAST(max(c) AS BIGINT)
            FROM per_pos GROUP BY src
            """
        ).fetchall()
    }
    assert got == want


def test_perplexity_matches_duckdb(spark, duck):
    clean_rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug"),
        (3, "a cat ran to the dog"),
    ]
    test_rows = [
        (10, "the cat sat on the rug"),
        (11, "zq xv totally unseen words"),
        (12, "a"),
    ]
    clean = spark.createDataFrame(clean_rows, "doc_id: long, text: string")
    docs = spark.createDataFrame(test_rows, "doc_id: long, text: string")
    duck.register("clean", pd.DataFrame(clean_rows, columns=["doc_id", "text"]))
    duck.register("crawl", pd.DataFrame(test_rows, columns=["doc_id", "text"]))

    lm = text.bigram_lm(clean, alpha=0.4)
    got = {
        r.doc_id: (r.n_scored, r.ppl)
        for r in text.perplexity(docs, lm, oov_logp=-20.0).collect()
    }
    want = dict(
        duck.execute(
            f"""
            WITH ctoks AS (
              SELECT string_split({NORM}, ' ') AS w
              FROM (SELECT text FROM clean) WHERE len(string_split({NORM}, ' ')) > 0
            ),
            uni AS (
              SELECT u AS w, count(*) AS c
              FROM (SELECT unnest(w) AS u FROM ctoks) GROUP BY u
            ),
            tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n, count(*) AS v FROM uni),
            big AS (
              SELECT w[i] AS w1, w[i+1] AS w2, count(*) AS c12
              FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
                    FROM ctoks WHERE len(w) >= 2)
              GROUP BY 1, 2
            ),
            p_uni AS (
              SELECT uni.w, 0.6 * uni.c / tot.n + 0.4 / tot.v AS p
              FROM uni CROSS JOIN tot
            ),
            lp_big AS (
              SELECT big.w1, big.w2,
                     ln(0.6 * big.c12 / u1.c + 0.4 * pu.p) AS logp
              FROM big
              JOIN uni u1 ON u1.w = big.w1
              JOIN p_uni pu ON pu.w = big.w2
            ),
            pairs AS (
              SELECT doc_id, w[i] AS w1, w[i+1] AS w2
              FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
                    FROM (SELECT doc_id, string_split({NORM}, ' ') AS w FROM crawl)
                    WHERE len(w) >= 2)
            ),
            scored AS (
              SELECT p.doc_id,
                     coalesce(lb.logp, ln(pu.p), -20.0) AS lp
              FROM pairs p
              LEFT JOIN lp_big lb ON lb.w1 = p.w1 AND lb.w2 = p.w2
              LEFT JOIN p_uni pu ON pu.w = p.w2
            ),
            per_doc AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
                     exp(-avg(lp)) AS ppl
              FROM scored GROUP BY doc_id
            )
            SELECT c.doc_id, (coalesce(n_scored, 0), ppl)
            FROM crawl c LEFT JOIN per_doc USING (doc_id)
            """
        ).fetchall()
    )
    assert set(got) == set(want)
    for k in got:
        n_s, p_s = got[k]
        n_d, p_d = want[k]
        assert n_s == n_d, (k, got[k], want[k])
        if p_s is None:
            assert p_d is None
        else:
            assert abs(p_s - p_d) < 1e-6 * max(1.0, abs(p_d)), (k, p_s, p_d)


def test_vocab_encode_matches_duckdb(spark, duck, docs):
    from temporai_mivdp_spark.llmdata import text as t

    vocab = t.build_vocabulary(docs, size=6)
    got_v = {r.token: r.token_id for r in vocab.collect()}
    want_v = dict(
        duck.execute(
            f"""
            WITH toks AS (
              SELECT unnest(string_split({NORM}, ' ')) AS token FROM documents
            ),
            c AS (
              SELECT token, count(*) AS cnt FROM toks
              WHERE token != '' GROUP BY token
            )
            SELECT token,
                   row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
            FROM c QUALIFY token_id <= 6
            """
        ).fetchall()
    )
    assert got_v == want_v

    got_e = {r.doc_id: list(r.token_ids) for r in t.encode_tokens(docs, vocab).collect()}
    want_e = dict(
        duck.execute(
            f"""
            WITH v AS (
              SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS tid
              FROM (SELECT u AS token, count(*) AS cnt
                    FROM (SELECT unnest(string_split({NORM}, ' ')) AS u FROM documents)
                    WHERE u != '' GROUP BY u)
              QUALIFY tid <= 6
            ),
            toks AS (
              SELECT doc_id, w[i] AS token, i
              FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
                    FROM (SELECT doc_id,
                                 list_filter(string_split({NORM}, ' '), x -> x != '') AS w
                          FROM documents))
            )
            SELECT d.doc_id,
                   coalesce((SELECT list(coalesce(v.tid, 0) ORDER BY toks.i)
                             FROM toks LEFT JOIN v USING (token)
                             WHERE toks.doc_id = d.doc_id), [])
            FROM documents d
            """
        ).fetchall()
    )
    assert set(got_e) == set(want_e)
    for k in got_e:
        assert got_e[k] == list(want_e[k]), (k, got_e[k], want_e[k])


def test_bpe_oracle_handles_bar_tokens(duck):
    """Delimiter-safety differential for the recursive-CTE BPE replay:
    corpus tokens containing a literal '|' must count identically to
    `apply_merges_py` (the oracle maps '|' -> chr(1) on both the seed
    segmentation and the merge-table symbols, so the bar encoding never
    sees a corpus bar)."""
    import re

    from temporai_mivdp_spark.llmdata.bpe import (
        apply_merges_py,
        pretrained_merges_list,
    )
    from temporai_mivdp_spark.queries_llm import _bpe_oracle_ctes

    rows = [
        (1, "plain|bar token and a|b|c pipes"),
        (2, "||| only bars ||"),
        (3, "normal words the cat sat"),
        (4, "mixed the|cat sat"),
    ]
    con = duckdb.connect()
    con.register("bardocs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = dict(
        con.execute(
            "WITH RECURSIVE "
            + _bpe_oracle_ctes("bardocs")
            + " SELECT doc_id, bpe_tokens FROM bcnt"
        ).fetchall()
    )

    ranks = {p: i for i, p in enumerate(pretrained_merges_list())}
    want = {}
    for doc_id, txt in rows:
        norm = re.sub(r"\s+", " ", txt.lower()).strip()
        n = sum(len(apply_merges_py(w, ranks)) for w in norm.split(" ") if w)
        if n:
            want[doc_id] = n
    assert got == want, (got, want)
