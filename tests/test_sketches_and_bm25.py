"""Unit tests for the round-7 additions: the mergeable bucketed-minimum
distinct sketch (operators/sketches.py) and BM25 retrieval
(llmdata/text.py::bm25_topk). Both are engine-portable-by-construction;
these tests pin the algebraic contracts (mergeability, estimator
regimes, ranking math) that the catalog oracles then re-check
engine-vs-engine.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from temporai_mivdp_spark.llmdata.text import bm25_topk
from temporai_mivdp_spark.operators import sketches


def _h52(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:13], 16)


def _bucket(key: str, k: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[13:17], 16) % k


def _py_sketch(keys, k):
    """Pure-Python replay of bucket_min_sketch for one group."""
    mins: dict[int, int] = {}
    for key in keys:
        b = _bucket(key, k)
        h = _h52(key)
        if b not in mins or h < mins[b]:
            mins[b] = h
    return mins


def _py_estimate(mins, k):
    occ = len(mins)
    if occ < k:
        return -float(k) * math.log(1.0 - occ / float(k))
    return (k * (k - 1.0) * sketches.HASH_WIDTH) / float(sum(mins.values()))


def test_sketch_rows_bounded_and_null_excluded(spark):
    rows = [(g, f"k{i % 7}") for g in ("a", "b") for i in range(50)]
    rows += [("a", None), ("b", None)]
    df = spark.createDataFrame(rows, ["g", "k"])
    sk = sketches.bucket_min_sketch(df, F.col("k"), ["g"], n_buckets=16).collect()
    # ≤ groups × k rows no matter the input size; nulls count nothing
    assert len(sk) <= 2 * 16
    expected = _py_sketch([f"k{i}" for i in range(7)], 16)
    for g in ("a", "b"):
        got = {r.bucket: r.min_hash for r in sk if r.g == g}
        assert got == expected


def test_sketch_merge_equals_whole_corpus_sketch(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B), exactly — the
    property that lets per-day sketch rows fold without rescans. The
    slices overlap on purpose (min is idempotent)."""
    all_keys = [f"key{i}" for i in range(200)]
    a = spark.createDataFrame([(k,) for k in all_keys[:120]], ["k"])
    b = spark.createDataFrame([(k,) for k in all_keys[90:]], ["k"])
    union = spark.createDataFrame([(k,) for k in all_keys], ["k"])
    merged = sketches.merge_sketches(
        sketches.bucket_min_sketch(a, F.col("k"), n_buckets=32),
        sketches.bucket_min_sketch(b, F.col("k"), n_buckets=32),
    )
    whole = sketches.bucket_min_sketch(union, F.col("k"), n_buckets=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_estimate_regimes_match_python_replay(spark):
    """Both estimator branches are pure functions of exact integers; the
    Spark result must equal the Python replay to the last bit."""
    # partial occupancy: 5 distinct keys into 64 buckets
    few = spark.createDataFrame([(f"x{i}",) for i in range(5)], ["k"])
    est = sketches.bucket_min_distinct(few, F.col("k"), n_buckets=64).collect()[0]
    mins = _py_sketch([f"x{i}" for i in range(5)], 64)
    assert est.n_buckets_occupied == len(mins) < 64
    assert est.distinct_est == _py_estimate(mins, 64)

    # full occupancy: 3000 distinct keys saturate 16 buckets
    many = spark.createDataFrame([(f"y{i}",) for i in range(3000)], ["k"])
    est2 = sketches.bucket_min_distinct(many, F.col("k"), n_buckets=16).collect()[0]
    mins2 = _py_sketch([f"y{i}" for i in range(3000)], 16)
    assert est2.n_buckets_occupied == 16 == len(mins2)
    assert est2.distinct_est == _py_estimate(mins2, 16)


def test_estimate_accuracy_band(spark):
    """k=64 → relative error ≈ 1/√64 = 12.5%; assert a 3-sigma-ish band
    on a deterministic 2000-distinct corpus (duplicates must not move
    the estimate at all — min is duplicate-blind)."""
    keys = [f"doc-{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys + keys[:500]], ["k"])
    est = sketches.bucket_min_distinct(df, F.col("k"), n_buckets=64).collect()[0]
    assert 2000 * 0.6 < est.distinct_est < 2000 * 1.4
    nodup = sketches.bucket_min_distinct(
        spark.createDataFrame([(k,) for k in keys], ["k"]), F.col("k"), n_buckets=64
    ).collect()[0]
    assert nodup.distinct_est == est.distinct_est


def test_histogram_merge_and_quantile_regimes(spark):
    """Counts add across disjoint slices (merge == whole-corpus
    histogram), and the quantile estimate is the exact lower edge of
    the ceil(q·n)-th bucket — checked against a Python replay."""
    vals_a = [float(i) for i in range(100)]
    vals_b = [float(i) for i in range(50, 250)]
    a = spark.createDataFrame([(v,) for v in vals_a], ["v"])
    b = spark.createDataFrame([(v,) for v in vals_b], ["v"])
    union = spark.createDataFrame([(v,) for v in vals_a + vals_b], ["v"])
    merged = sketches.merge_histograms(
        sketches.fixed_width_histogram(a, F.col("v"), width=10.0),
        sketches.fixed_width_histogram(b, F.col("v"), width=10.0),
    )
    whole = sketches.fixed_width_histogram(union, F.col("v"), width=10.0)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    est = sketches.estimate_quantile(whole, 0.5, 10.0).collect()[0]
    allv = sorted(vals_a + vals_b)
    n = len(allv)
    # python replay: lower edge of the bucket holding the ceil(q·n)-th value
    target = allv[math.ceil(0.5 * n) - 1]
    assert est.n_rows == n
    assert est.quantile_est == math.floor(target / 10.0) * 10.0
    # the estimate under-shoots the order statistic by < one bucket width
    assert 0 <= target - est.quantile_est < 10.0


def test_histogram_grouped_nulls_and_negative_values(spark):
    df = spark.createDataFrame(
        [("a", -15.0), ("a", -5.0), ("a", None), ("b", 4.0), ("b", 7.0)],
        ["g", "v"],
    )
    hist = sketches.fixed_width_histogram(df, F.col("v"), ["g"], width=10.0)
    got = {(r.g, r.bucket): r.cnt for r in hist.collect()}
    # floor semantics on negatives: -15/10 -> bucket -2, -5/10 -> bucket -1
    assert got == {("a", -2): 1, ("a", -1): 1, ("b", 0): 2}
    q = {r.g: r.quantile_est for r in sketches.estimate_quantile(hist, 0.5, 10.0).collect()}
    assert q == {"a": -20.0, "b": 0.0}


def _py_bm25(corpus: dict[str, str], terms, k1=1.2, b=0.75):
    """Pure-Python replay of bm25_topk's exact arithmetic, nano-unit
    quantization included, association pinned the same way."""
    toks = {d: t.split() for d, t in corpus.items()}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(dl)
    avgdl = sum(dl.values()) / n
    out = {}
    for d, t in toks.items():
        su = 0
        for term in terms:
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (float(n) - df + 0.5) / (df + 0.5))
            contrib = idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl[d] / avgdl))))
            su += math.floor(contrib * 1e9 + 0.5)
        if su:
            out[d] = su / 1e9
    return out


def test_bm25_ranking_matches_python_replay(spark):
    corpus = {
        "d1": "apple banana apple",
        "d2": "apple",
        "d3": "cherry banana cherry banana",
        "d4": "dog dog dog dog dog",
    }
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, ("apple", "cherry"), k=10).collect()}
    assert got == _py_bm25(corpus, ("apple", "cherry"))
    # d4 has no query term: absent, not zero-scored
    assert "d4" not in got
    # rarer term (cherry, df=1) must outweigh the common one at equal tf
    assert got["d3"] > got["d2"]


def test_bm25_topk_cuts_and_tie_breaks(spark):
    """k cuts the result; ties on the integer nano-score break on doc_id
    ascending (the deterministic, oracle-matching order)."""
    corpus = {f"d{i}": "same text here" for i in range(6)}
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = [r.doc_id for r in bm25_topk(df, ("same",), k=3).collect()]
    assert got == ["d0", "d1", "d2"]


def _py_pmi(corpus, min_count=1):
    """Pure-Python replay of pmi_bigrams' exact arithmetic (same
    left-to-right ln association)."""
    toks = [t.lower().split() for t in corpus]
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in toks:
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n_uni = sum(uni.values())
    n_big = sum(big.values())
    out = {}
    for (a, b), c in big.items():
        if c < min_count:
            continue
        out[(a, b)] = (
            math.log(float(c))
            - math.log(float(uni[a]))
            - math.log(float(uni[b]))
            + 2.0 * math.log(float(n_uni))
            - math.log(float(n_big))
        )
    return out


def test_pmi_bigrams_matches_python_replay(spark):
    from temporai_mivdp_spark.llmdata.text import pmi_bigrams

    corpus = [
        "new york is big",
        "new york city",
        "big data new york",
        "york new",  # reversed pair: direction matters
        "solo",  # single token: unigram yes, bigram no
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"])
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in pmi_bigrams(df, k=100, min_count=1).collect()}
    want = _py_pmi(corpus)
    assert set(got) == set(want)
    for pair, pmi in want.items():
        assert got[pair][1] == pmi, pair
    # the 3x collocation outranks every 1x pair of equally-common words
    assert got[("new", "york")][0] == 3
    assert got[("new", "york")][1] > got[("york", "new")][1]
    # min_count prunes, k cuts, ordering is (pmi desc, words asc)
    top = pmi_bigrams(df, k=2, min_count=3).collect()
    assert [(r.w1, r.w2) for r in top] == [("new", "york")]


def test_bm25_empty_corpus_and_no_hits(spark):
    df = spark.createDataFrame([], "doc_id string, text string")
    out = bm25_topk(df, ("apple",), k=5)
    assert out.columns == ["doc_id", "bm25"] and out.count() == 0
    df2 = spark.createDataFrame([("d1", "cat")], ["doc_id", "text"])
    assert bm25_topk(df2, ("zebra",), k=5).count() == 0


def test_weighted_sample_replay_scale_invariance_and_bias(spark):
    """A-ES weighted sampling: (a) priorities match the pure-Python
    replay bit for bit, (b) scaling every weight by a constant leaves
    the elected sample identical (priority order scales uniformly),
    (c) heavier rows are actually over-represented, (d) null/zero
    weights are excluded, (e) repartitioning does not change the
    sample."""
    from temporai_mivdp_spark.llmdata.sampling import weighted_sample_k

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(500)]
    rows += [(9001, None), (9002, 0.0), (9003, -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])

    got = {
        r.doc_id: r.pri
        for r in weighted_sample_k(df, "w", 50, priority_col="pri").collect()
    }

    def py_pri(doc_id, w):
        h = int(hashlib.md5(f"ws{doc_id}".encode()).hexdigest()[:13], 16)
        return -math.log((h + 1.0) / 4503599627370496.0) / w

    pris = sorted(
        (py_pri(i, w), i) for i, w in rows if w is not None and w > 0
    )
    want = {i: p for p, i in pris[:50]}
    # JVM Math.log and C libm may differ in the last ulp, so the replay
    # matches to relative 1e-12 (the oracle harness canonicalizes floats
    # at 6 decimals — far looser); the elected SET must match exactly
    assert set(got) == set(want)
    for i in want:
        assert math.isclose(got[i], want[i], rel_tol=1e-12), i
    assert not {9001, 9002, 9003} & set(got)

    # heavy rows are 10% of the population but ~90% of the weight mass
    heavy = sum(1 for i in got if i % 10 == 0)
    assert heavy > 25

    scaled = df.withColumn("w", F.col("w") * 7.0)
    same = {r.doc_id for r in weighted_sample_k(scaled, "w", 50).collect()}
    assert same == set(got)

    rep = {r.doc_id for r in weighted_sample_k(df.repartition(13), "w", 50).collect()}
    assert rep == set(got)
