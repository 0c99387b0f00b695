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
