"""Lexical retrieval: Okapi BM25 scoring/top-k and reciprocal-rank fusion.

The reference engine has no retrieval operators; these extend the
LLM-data-pipeline surface (RAG ingest, decontamination, data selection all
want a lexical ranker next to the embedding rankers in
``functions/similarity.py``).

Design for 100 TB — BM25 for a FIXED query needs no inverted index and no
token shuffle at all:

- ``bm25_score`` is map-only per document: the document length and the
  per-query-term frequencies are array expressions over the split text
  (``len(query_terms)`` is query-sized, so the per-row work is bounded).
  The corpus statistics — N, total tokens, and each term's document
  frequency — are ONE 1-row aggregate, broadcast back with a cross join.
  Total exchanges: the 1-row aggregate and the final TakeOrdered; zero
  fact-sized shuffles, zero joins on the fact table.
- The per-document score sums the query terms in FIXED literal order with
  ``tf = 0`` terms contributing an exact ``0.0`` (IEEE ``0.0 + x == x``),
  so the double result is bit-reproducible — stronger than the unordered
  ``F.sum`` the explode formulation would give.

Exactness (the contract-gate rules, see ``__spark_entry__`` docstring):
``ln`` over small-rational inputs is bit-identical between the JVM and
DuckDB in practice (the n-gram NLL family relies on the same fact), the
summation order is fixed, and every ordering ties break on the id column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.text import normalize_text
from siddhi_io_cdc_spark.util import fan_out

__all__ = ["bm25_score", "bm25_topk", "rrf_fuse"]


def bm25_score(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 score of every document containing at least one query
    term: ``sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``
    with the standard smoothed idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (Robertson/Zaragoza 2009, eq. 3.2 — always positive, so adding a query
    term can never demote a document).

    Returns ``(doc_id, bm25)`` with ``bm25`` rounded to 6 decimals.
    ``dl/avgdl`` is computed as ``dl * n_docs / total_tokens`` (one
    multiply, one divide, in that order) so an oracle can restate the exact
    IEEE operation sequence.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct (duplicate terms double-count)")

    words = F.filter(F.split(normalize_text(text_col), " "), lambda w: w != "")

    def term_freq(term: str) -> Column:
        # a single-arg closure: F.filter treats a 2-parameter lambda as the
        # (element, index) form, so the loop variable must be captured here
        return F.size(F.filter(words, lambda w: w == F.lit(term))).cast("bigint")

    staged = fan_out(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("bigint").alias("dl"),
        *[term_freq(t).alias(f"tf{i}") for i, t in enumerate(query_terms)],
    )
    # ONE corpus-wide 1-row aggregate: N, total tokens, df per query term.
    stats = staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("bigint")).alias(f"df{i}")
            for i in range(len(query_terms))
        ],
    )

    norm_len = F.col("dl") * F.col("n_docs") / F.col("total_tokens")

    def term_score(i: int) -> Column:
        tf, dfq = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - dfq + F.lit(0.5)) / (dfq + F.lit(0.5))
        )
        s = idf * (
            tf
            * F.lit(k1 + 1.0)
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm_len))
        )
        # exact 0.0 for absent terms: 0.0 + x == x in IEEE, so the fixed-
        # order sum below is unaffected by which terms are missing
        return F.when(tf > 0, s).otherwise(F.lit(0.0))

    score = reduce(
        lambda a, i: a + term_score(i), range(1, len(query_terms)), term_score(0)
    )
    matched = reduce(
        lambda a, i: a | (F.col(f"tf{i}") > 0),
        range(1, len(query_terms)),
        F.col("tf0") > 0,
    )
    return (
        staged.crossJoin(F.broadcast(stats))
        .where(matched)
        .select("doc_id", F.round(score, 6).alias("bm25"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by BM25, deterministic total order
    ``(bm25 desc, doc_id asc)``. Distributed TakeOrdered — the rank column
    is assigned AFTER the limit, so the single-partition window only ever
    sees ``k`` rows."""
    from pyspark.sql import Window

    top = (
        bm25_score(df, query_terms, k1=k1, b=b, text_col=text_col, id_col=id_col)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): fuse any number of
    ``(id, rank)`` rankings by ``sum_r 1/(rrf_k + rank_r)``; top-``k`` by
    ``(rrf desc, id asc)``.

    Each input is typically already a bounded top-k (the standard hybrid
    BM25 + dense pattern), so the union is tiny; the op stays correct on
    unbounded rankings too — one hash aggregate on the id, no global sort
    before the limit. The fused score is rounded to 9 decimals: addition of
    2-3 reciprocals is magnitude-homogeneous, so rounding makes the sum
    independent of which retriever's row arrives first.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))).alias("__rr"),
        )
        for r in rankings
    ]
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    top = (
        unioned.groupBy("doc_id")
        .agg(F.round(F.sum("__rr"), 9).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))
