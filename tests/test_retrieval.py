"""BM25 / RRF fusion / DSIR selection.

BM25 parity is checked against an independent pure-Python Okapi
implementation (own tokenizer, own idf) on a hand corpus — not against the
Spark expression tree — so a formula transcription error cannot cancel out.
"""

import math

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.export import dsir_select, dsir_weights
from siddhi_io_cdc_spark.functions.retrieval import bm25_score, bm25_topk, rrf_fuse

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles data between executors during wide transformations"),
    (2, "spark spark spark everything is spark here spark again"),
    (3, "a very long document about nothing in particular that mentions spark "
        "once among many many many many many many many many other words"),
    (4, "shuffle partitions control spark parallelism"),
    (5, ""),
]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: [w for w in t.lower().split() if w] for i, t in corpus}
    n = len(toks)
    avg = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, v in toks.items():
        s = 0.0
        for q in terms:
            tf = v.count(q)
            if not tf:
                continue
            df = sum(1 for w in toks.values() if q in w)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avg))
        if s:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")


def test_bm25_matches_independent_reference(docs):
    got = {r.doc_id: r.bm25 for r in bm25_score(docs, ["spark", "shuffle"]).collect()}
    ref = _py_bm25(CORPUS, ["spark", "shuffle"])
    assert set(got) == set(ref)
    for i, s in ref.items():
        assert got[i] == pytest.approx(s, abs=2e-6)


def test_bm25_term_saturation_and_length_norm(docs):
    """tf saturates (doc 2's 5x'spark' ≪ 5x doc 1's score) and long docs
    are penalized (doc 3 mentions spark once in a long text → lowest)."""
    got = {r.doc_id: r.bm25 for r in bm25_score(docs, ["spark"]).collect()}
    assert got[2] < 5 * got[1]
    assert got[3] == min(got.values())
    assert 0 not in got and 5 not in got  # no query term / empty text


def test_bm25_topk_rank_and_ties(docs):
    top = bm25_topk(docs, ["spark", "shuffle"], k=3).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    scores = [r.bm25 for r in top]
    assert scores == sorted(scores, reverse=True)


def test_bm25_validates_terms(docs):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_score(docs, [])
    with pytest.raises(ValueError, match="distinct"):
        bm25_score(docs, ["a", "a"])


def test_rrf_fusion_prefers_doubly_ranked(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id LONG, rank INT")
    b = spark.createDataFrame([(12, 1), (13, 2)], "doc_id LONG, rank INT")
    fused = rrf_fuse([a, b], k=4).collect()
    assert fused[0].doc_id == 12  # ranked in both lists
    assert fused[0].rrf == pytest.approx(1 / 63 + 1 / 61)
    assert [r.rank for r in fused] == [1, 2, 3, 4]
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])


DSIR_CORPUS = [
    # target domain: arithmetic text; raw mixes in cooking text
    (0, "add two plus two equals four", "math"),
    (1, "seven minus three equals four", "math"),
    (2, "multiply two by three equals six", "math"),
    (3, "stir the soup and add salt", "food"),
    (4, "bake the bread then add butter", "food"),
    (5, "two plus three equals five", "food"),  # mislabeled math-y text
    (6, "", "food"),
]


@pytest.fixture(scope="module")
def dsir_docs(spark):
    return spark.createDataFrame(DSIR_CORPUS, "doc_id LONG, text STRING, lang STRING")


def test_dsir_weights_rank_target_like_text_higher(dsir_docs):
    w = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(dsir_docs, F.col("lang") == "math", buckets=64).collect()
    }
    # math-like docs (incl. the mislabeled 5) outscore cooking docs
    assert min(w[0], w[1], w[2], w[5]) > max(w[3], w[4])
    assert w[6] is None  # featureless doc gets NULL, stays in output


def test_dsir_select_top_n(dsir_docs):
    sel = dsir_select(dsir_docs, F.col("lang") == "math", n=4, buckets=64)
    ids = {r.doc_id for r in sel.collect()}
    assert ids == {0, 1, 2, 5}
    assert sel.count() == 4


def test_dsir_validates_buckets(dsir_docs):
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(dsir_docs, F.col("lang") == "math", buckets=1)


def test_bm25_absent_term_is_harmless(docs):
    """A query term absent from the whole corpus contributes no score and
    does not perturb the other terms' ranking (exact 0.0 in the fixed-order
    sum)."""
    base = {r.doc_id: r.bm25 for r in bm25_score(docs, ["spark"]).collect()}
    wide = {r.doc_id: r.bm25 for r in bm25_score(docs, ["spark", "zzzmissing"]).collect()}
    assert base == wide
