"""Composed incremental maintenance: ONE changelog stream drives the BM25
index, the DSIR LM state, and the CMS sketch in a single foreachBatch —
and a crash BETWEEN appliers replays safely (each applier's own marker /
versioned-pointer skip makes the composite idempotent per batch_id, so the
half-applied batch converges instead of double-applying).

This is the serving topology the per-module tests imply but never
exercise together.
"""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.export import dsir_weights
from siddhi_io_cdc_spark.functions.retrieval import bm25_topk
from siddhi_io_cdc_spark.functions.sketch import cms_point_estimates, cms_sketch
from siddhi_io_cdc_spark.streaming.bm25_index import (
    apply_changelog_bm25,
    bm25_topk_indexed,
    write_bm25_index,
)
from siddhi_io_cdc_spark.streaming.dsir import (
    apply_changelog_dsir,
    dsir_weights_from_state,
    write_dsir_state,
)
from siddhi_io_cdc_spark.streaming.sketch import (
    apply_changelog_cms,
    read_cms,
    write_cms_state,
)

SCHEMA = (
    "doc_id bigint, text string, lang string, "
    "before_text string, before_lang string, operation string, ts_ms bigint"
)


def TARGET():
    return F.col("lang") == "en"


def BEFORE_TARGET():
    return F.col("before_lang") == "en"


@pytest.fixture()
def corpus0(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join quality text", "en"),
            (2, "der schnelle shuffle fuchs", "de"),
            (3, "spark spark spark everywhere", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )


def _batch(spark):
    return spark.createDataFrame(
        [
            (4, "fresh spark document arrives", "en", None, None, "insert", 10),
            (2, "translated shuffle text now english", "en",
             "der schnelle shuffle fuchs", "de", "update", 11),
            (3, None, None, "spark spark spark everywhere", "en", "delete", 12),
        ],
        SCHEMA,
    )


def _final(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join quality text", "en"),
            (2, "translated shuffle text now english", "en"),
            (4, "fresh spark document arrives", "en"),
        ],
        "doc_id bigint, text string, lang string",
    )


def _apply_all(spark, batch, paths, batch_id, skip_after=None):
    """The composed foreachBatch body; ``skip_after`` simulates a crash
    after the Nth applier."""
    appliers = [
        lambda: apply_changelog_bm25(spark, paths["bm25"], batch, batch_id=batch_id),
        lambda: apply_changelog_dsir(
            spark, batch, paths["dsir"], TARGET(), BEFORE_TARGET(),
            batch_id=batch_id,
        ),
        lambda: apply_changelog_cms(spark, batch, paths["cms"], batch_id=batch_id),
    ]
    for i, a in enumerate(appliers, 1):
        a()
        if skip_after is not None and i >= skip_after:
            return  # crash here: later appliers never saw the batch


def _assert_state_matches_rebuild(spark, paths, final):
    from siddhi_io_cdc_spark.streaming.sketch import _tokens

    terms = ["spark", "shuffle", "english"]
    got = [(r.doc_id, r.bm25, r.rank)
           for r in bm25_topk_indexed(spark, paths["bm25"], terms, k=10).collect()]
    want = [(r.doc_id, r.bm25, r.rank) for r in bm25_topk(final, terms, k=10).collect()]
    assert got == want

    gw = {r["doc_id"]: (r["dsir_weight"], r["n_features"])
          for r in dsir_weights_from_state(spark, final, paths["dsir"]).collect()}
    ww = {r["doc_id"]: (r["dsir_weight"], r["n_features"])
          for r in dsir_weights(final, TARGET(), buckets=64).collect()}
    assert gw == ww

    want_sk = {(r.d, r.bucket): r.cnt
               for r in cms_sketch(_tokens(final, "text"), "tok",
                                   width=64, depth=2).collect()}
    got_sk = {(r.d, r.bucket): r.cnt for r in read_cms(spark, paths["cms"]).collect()}
    assert got_sk == want_sk


def test_composed_appliers_with_crash_replay(spark, corpus0, tmp_path):
    paths = {
        "bm25": str(tmp_path / "bm25"),
        "dsir": str(tmp_path / "dsir"),
        "cms": str(tmp_path / "cms"),
    }
    write_bm25_index(spark, corpus0, paths["bm25"], nbuckets=16, doc_buckets=4)
    write_dsir_state(spark, corpus0, paths["dsir"], TARGET(), buckets=64)
    write_cms_state(spark, corpus0, paths["cms"], width=64, depth=2)

    batch = _batch(spark)
    # crash after the SECOND applier (bm25 + dsir applied, cms not)
    _apply_all(spark, batch, paths, batch_id=1, skip_after=2)
    # replay of the whole batch: bm25/dsir skip via their markers, cms applies
    _apply_all(spark, batch, paths, batch_id=1)
    # a second full replay is a no-op everywhere
    _apply_all(spark, batch, paths, batch_id=1)

    _assert_state_matches_rebuild(spark, paths, _final(spark))
