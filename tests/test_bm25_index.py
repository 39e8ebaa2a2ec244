"""Incremental BM25 inverted index: probe parity, CDC maintenance, replay.

The core contract mirrors the IVF applier's: after applying a changelog,
``bm25_topk_indexed`` must return EXACTLY what ``bm25_topk`` returns over a
fresh scan of the equivalent corpus state — scores bit-identical, not just
rankings.
"""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.retrieval import bm25_topk
from siddhi_io_cdc_spark.streaming.bm25_index import (
    apply_changelog_bm25,
    bm25_topk_indexed,
    write_bm25_index,
)

TERMS = ["spark", "shuffle", "join"]

DOCS = [
    (0, "spark shuffle join spark"),
    (1, "the quick brown fox avoids distributed systems"),
    (2, "join strategies in spark include broadcast and shuffle joins"),
    (3, "shuffle shuffle shuffle everywhere"),
    (4, "spark spark spark spark"),
    (5, "completely unrelated text about gardening"),
]


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _ranking(df):
    return [(r.doc_id, r.bm25, r.rank) for r in df.collect()]


@pytest.fixture()
def index_path(tmp_path):
    return str(tmp_path / "bm25idx")


def test_probe_matches_scan(spark, index_path):
    docs = _corpus(spark, DOCS)
    write_bm25_index(spark, docs, index_path, nbuckets=8, doc_buckets=4)
    got = _ranking(bm25_topk_indexed(spark, index_path, TERMS, k=10))
    want = _ranking(bm25_topk(docs, TERMS, k=10))
    assert got == want  # bit-identical scores, same order


def _changelog(spark, rows):
    # (doc_id, text, before_text, operation, ts_ms)
    return spark.createDataFrame(
        rows, "doc_id LONG, text STRING, before_text STRING, operation STRING, ts_ms LONG"
    )


def test_incremental_apply_matches_fresh_rebuild(spark, index_path):
    docs = _corpus(spark, DOCS)
    write_bm25_index(spark, docs, index_path, nbuckets=8, doc_buckets=4)
    batch = _changelog(
        spark,
        [
            (6, "new doc about spark shuffle behavior", None, "insert", 10),
            (4, "rewritten without the magic words", DOCS[4][1], "update", 11),
            (3, None, DOCS[3][1], "delete", 12),
            # two events for one key: only the LATEST (by ts) wins
            (7, "transient spark doc", None, "insert", 13),
            (7, None, "transient spark doc", "delete", 14),
        ],
    )
    apply_changelog_bm25(spark, index_path, batch, batch_id=1)

    final_rows = [DOCS[0], DOCS[1], DOCS[2], DOCS[5],
                  (4, "rewritten without the magic words"),
                  (6, "new doc about spark shuffle behavior")]
    want = _ranking(bm25_topk(_corpus(spark, final_rows), TERMS, k=10))
    got = _ranking(bm25_topk_indexed(spark, index_path, TERMS, k=10))
    assert got == want

    # update dropped 'spark' from doc 4: its postings must be gone
    postings = spark.read.parquet(index_path + "/postings")
    assert postings.where("doc_id = 4 AND term = 'spark'").count() == 0
    assert postings.where("doc_id = 3").count() == 0  # deleted doc


def test_replay_is_idempotent(spark, index_path):
    docs = _corpus(spark, DOCS)
    write_bm25_index(spark, docs, index_path, nbuckets=8, doc_buckets=4)
    batch = _changelog(
        spark, [(6, "spark appears here", None, "insert", 10),
                (0, None, DOCS[0][1], "delete", 11)]
    )
    apply_changelog_bm25(spark, index_path, batch, batch_id=7)
    before = _ranking(bm25_topk_indexed(spark, index_path, TERMS, k=10))
    # clean re-run: marker short-circuits
    apply_changelog_bm25(spark, index_path, batch, batch_id=7)
    # crash-replay without marker: converges to the same state
    apply_changelog_bm25(spark, index_path, batch, batch_id=None)
    after = _ranking(bm25_topk_indexed(spark, index_path, TERMS, k=10))
    assert after == before


def test_missing_before_image_raises(spark, index_path):
    docs = _corpus(spark, DOCS)
    write_bm25_index(spark, docs, index_path, nbuckets=8, doc_buckets=4)
    no_before = spark.createDataFrame(
        [(0, "changed", "update", 10)],
        "doc_id LONG, text STRING, operation STRING, ts_ms LONG",
    )
    with pytest.raises(ValueError, match="before_text"):
        apply_changelog_bm25(spark, index_path, no_before, batch_id=2)
    null_before = _changelog(spark, [(0, "changed", None, "update", 10)])
    with pytest.raises(ValueError, match="NULL"):
        apply_changelog_bm25(spark, index_path, null_before, batch_id=3)


def test_probe_reads_only_query_buckets(spark, index_path):
    docs = _corpus(spark, DOCS)
    write_bm25_index(spark, docs, index_path, nbuckets=8, doc_buckets=4)
    plan = bm25_topk_indexed(spark, index_path, ["spark"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "tbucket" in plan  # partition filter reached the scan
