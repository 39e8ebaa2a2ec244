"""End-to-end streaming pipeline: cdc-poll source → envelope-less events →
tumbling window aggregation, across multiple micro-batches. This is the
production composition (source + shaping + windowed agg) in one query."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.sources.polling import register_cdc_poll
from siddhi_io_cdc_spark.streaming.windows import tumbling_agg


def _append(path, ids, vals):
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vals, pa.float64())}),
        os.path.join(path, f"p-{time.time_ns()}.parquet"),
    )


def test_cdc_poll_feeds_tumbling_window(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    _append(tbl, [0, 50, 120], [1.0, 2.0, 3.0])
    register_cdc_poll(spark)
    stream = (
        spark.readStream.format("cdc-poll")
        .option("path", tbl)
        .option("pollingColumn", "id")
        .option("startFrom", "earliest")
        .load()
    )
    windowed = tumbling_agg(
        stream,
        F.timestamp_seconds(F.col("id")),
        100,
        {"n": F.count(F.lit(1)), "sv": F.sum("v")},
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("cdc_windows")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.window_start: (r.n, r.sv) for r in spark.sql("select * from cdc_windows").collect()}
        assert got == {0: (2, 3.0), 100: (1, 3.0)}
        _append(tbl, [130, 220], [4.0, 5.0])  # next micro-batch updates windows
        q.processAllAvailable()
        got = {r.window_start: (r.n, r.sv) for r in spark.sql("select * from cdc_windows").collect()}
        assert got == {0: (2, 3.0), 100: (2, 7.0), 200: (1, 5.0)}
    finally:
        q.stop()


def test_incremental_minhash_matches_batch(spark, sf_dir, tmp_path):
    """Streaming near-dedup parity: replaying the corpus through the
    incremental LSH index in 3 micro-batches yields EXACTLY the pairs the
    batch operator finds over the full corpus."""
    from siddhi_io_cdc_spark.functions.dedup import minhash_lsh_pairs
    from siddhi_io_cdc_spark.streaming.dedup import incremental_minhash_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    # Plant cross-batch near-dups: variants of docs 0-4 with shifted ids so
    # original and variant land in DIFFERENT batches (id % 3 differs).
    nd = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailmarker")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd)

    store = str(tmp_path / "lsh_store")
    got = set()
    for i in range(3):
        batch = corpus.where(F.col("doc_id") % 3 == i)
        pairs = incremental_minhash_pairs(
            spark, store, batch, jaccard_threshold=0.7, num_buckets=8, batch_id=i
        )
        got |= {(r.id_a, r.id_b, r.jaccard) for r in pairs.collect()}

    expect = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.7).collect()
    }
    assert expect, "fixture must plant at least one near-dup pair"
    assert got == expect

    # Replay of the last batch (foreachBatch crash-recovery): same pairs out,
    # no index double-count.
    replay = incremental_minhash_pairs(
        spark, store, corpus.where(F.col("doc_id") % 3 == 2),
        jaccard_threshold=0.7, num_buckets=8, batch_id=2,
    )
    got_replay = {(r.id_a, r.id_b, r.jaccard) for r in replay.collect()}
    # replayed emission covers exactly the pairs touching batch 2
    assert got_replay == {
        (a, b, j) for (a, b, j) in expect if a % 3 == 2 or b % 3 == 2
    }


def test_foreach_batch_minhash_dedup_stream(spark, sf_dir, tmp_path):
    """The foreachBatch adapter on a live stream: pairs land under
    batch=<id> dirs and a replayed batch overwrites, not duplicates."""
    from siddhi_io_cdc_spark.streaming.dedup import foreach_batch_minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    nd = docs.where(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailmarker")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd)

    src = str(tmp_path / "src")
    os.makedirs(src)
    corpus.where(F.col("doc_id") % 2 == 0).write.mode("append").parquet(src)

    store, pairs_out = str(tmp_path / "store"), str(tmp_path / "pairs")
    apply_fn = foreach_batch_minhash_dedup(
        spark, store, pairs_out, jaccard_threshold=0.7, num_buckets=8
    )
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = (
        stream.writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        corpus.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    from siddhi_io_cdc_spark.functions.dedup import minhash_lsh_pairs

    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(pairs_out).collect()
    }
    expect = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.7).collect()
    }
    assert expect and got == expect


def test_compact_lsh_index_preserves_pairs(spark, sf_dir, tmp_path):
    """Compaction leaves one file per bucket and does not change what a
    subsequent batch finds."""
    import glob

    from siddhi_io_cdc_spark.streaming.dedup import (
        compact_lsh_index,
        incremental_minhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(45)
    nd = docs.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailmarker")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd)
    store = str(tmp_path / "lsh")

    # Several appends → multiple files per bucket.
    for i in range(3):
        incremental_minhash_pairs(
            spark, store, corpus.where(F.col("doc_id") % 4 == i),
            jaccard_threshold=0.7, num_buckets=4, batch_id=i,
        ).collect()
    rows_before = spark.read.parquet(f"{store}/bands").count()

    compact_lsh_index(spark, store)

    assert spark.read.parquet(f"{store}/bands").count() == rows_before
    for bucket_dir in glob.glob(f"{store}/bands/__bucket=*"):
        files = [f for f in os.listdir(bucket_dir) if f.endswith(".parquet")]
        assert len(files) == 1, f"{bucket_dir}: {files}"

    # The compacted index still probes correctly for the final batch.
    pairs = incremental_minhash_pairs(
        spark, store, corpus.where(F.col("doc_id") % 4 == 3),
        jaccard_threshold=0.7, num_buckets=4, batch_id=3,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    from siddhi_io_cdc_spark.functions.dedup import minhash_lsh_pairs

    expect = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.7).collect()
        if r.id_a % 4 == 3 or r.id_b % 4 == 3
    }
    assert got == expect


def test_incremental_embedding_matches_batch(spark, sf_dir, tmp_path):
    """Streaming embedding near-dup parity: replaying the embeddings table
    in 3 micro-batches through the sign-LSH index yields exactly the batch
    operator's pair set, and replays are idempotent."""
    from siddhi_io_cdc_spark.functions.similarity import embedding_near_dup_pairs
    from siddhi_io_cdc_spark.streaming.dedup import incremental_embedding_pairs

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(120)
    # Plant exact-duplicate vectors with shifted ids so the duplicate and its
    # source land in different batches.
    dup = vecs.where(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 10_000_001).alias("vec_id"), "embedding"
    )
    corpus = vecs.select("vec_id", "embedding").unionByName(dup)
    dim = len(corpus.select("embedding").first()[0])

    store = str(tmp_path / "emb_store")
    got = set()
    for i in range(3):
        batch = corpus.where(F.col("vec_id") % 3 == i)
        pairs = incremental_embedding_pairs(
            spark, store, batch, threshold=0.98, dim=dim, num_buckets=8, batch_id=i
        )
        got |= {(r.id_a, r.id_b, r.cosine) for r in pairs.collect()}

    expect = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dup_pairs(corpus, threshold=0.98, dim=dim).collect()
    }
    assert expect, "fixture must plant at least one near-dup pair"
    assert got == expect

    replay = incremental_embedding_pairs(
        spark, store, corpus.where(F.col("vec_id") % 3 == 1),
        threshold=0.98, dim=dim, num_buckets=8, batch_id=1,
    )
    got_replay = {(r.id_a, r.id_b, r.cosine) for r in replay.collect()}
    assert got_replay == {
        (a, b, c) for (a, b, c) in expect if a % 3 == 1 or b % 3 == 1
    }

def test_compact_crash_between_renames_recovers(spark, sf_dir, tmp_path):
    """A crash between compaction's two renames leaves the live index dir
    missing; the next probe (or compaction) must restore it from the .old-*
    sibling instead of silently treating the index as empty."""
    import glob
    import shutil

    from siddhi_io_cdc_spark.streaming.dedup import (
        compact_lsh_index,
        incremental_minhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    nd = docs.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailmarker")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd)
    store = str(tmp_path / "lsh")
    # Seed the index with the even half (originals of the planted dups).
    incremental_minhash_pairs(
        spark, store, corpus.where(F.col("doc_id") % 2 == 0),
        jaccard_threshold=0.7, num_buckets=4, batch_id=0,
    ).collect()

    # Simulate the exact crash window: first rename done (live dir -> .old),
    # second rename pending (.tmp staged), for BOTH store subdirectories.
    for sub in (f"{store}/bands", f"{store}/docs"):
        shutil.copytree(sub, sub + ".tmp-deadbeef")
        os.rename(sub, sub + ".old-deadbeef")
        assert not os.path.exists(sub)

    # The next batch's probe recovers and still finds every cross pair.
    pairs = incremental_minhash_pairs(
        spark, store, corpus.where(F.col("doc_id") % 2 == 1),
        jaccard_threshold=0.7, num_buckets=4, batch_id=1,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    from siddhi_io_cdc_spark.functions.dedup import minhash_lsh_pairs

    expect = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.7).collect()
        if r.id_a % 2 == 1 or r.id_b % 2 == 1
    }
    assert expect, "fixture must plant at least one cross-parity pair"
    assert got == expect
    # Leftover staging/backup dirs are gone after recovery.
    assert not glob.glob(f"{store}/bands.old-*") and not glob.glob(f"{store}/bands.tmp-*")

    # Same crash state handled by compaction itself.
    for sub in (f"{store}/bands",):
        shutil.copytree(sub, sub + ".tmp-cafe")
        os.rename(sub, sub + ".old-cafe")
    compact_lsh_index(spark, store)
    assert os.path.exists(f"{store}/bands")
    assert not glob.glob(f"{store}/bands.old-*") and not glob.glob(f"{store}/bands.tmp-*")


def test_partial_append_duplicate_rows_dedup_on_read(spark, sf_dir, tmp_path):
    """A crash after the index append but before the marker write makes the
    replayed batch append AGAIN; the duplicated index rows must not duplicate
    emitted pairs (dedup on read), and compaction removes them for good."""
    from siddhi_io_cdc_spark.streaming.dedup import (
        compact_lsh_index,
        incremental_minhash_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    nd = docs.where(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10_000_001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tailmarker")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(nd)
    store = str(tmp_path / "lsh")
    seed = corpus.where(F.col("doc_id") % 2 == 0)
    incremental_minhash_pairs(
        spark, store, seed, jaccard_threshold=0.7, num_buckets=4, batch_id=0
    ).collect()
    # Crash-before-marker: remove the marker and replay the append.
    os.remove(f"{store}/_batches/0")
    incremental_minhash_pairs(
        spark, store, seed, jaccard_threshold=0.7, num_buckets=4, batch_id=0
    ).collect()
    n_ids = seed.count()
    stored = spark.read.parquet(f"{store}/docs")
    assert stored.count() == 2 * n_ids, "test premise: rows really duplicated"

    probe = corpus.where(F.col("doc_id") % 2 == 1)
    pairs = incremental_minhash_pairs(
        spark, store, probe, jaccard_threshold=0.7, num_buckets=4, batch_id=1
    ).collect()
    keys = [(r.id_a, r.id_b) for r in pairs]
    assert len(keys) == len(set(keys)), "duplicated index rows duplicated pairs"
    from siddhi_io_cdc_spark.functions.dedup import minhash_lsh_pairs

    expect = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(corpus, jaccard_threshold=0.7).collect()
        if r.id_a % 2 == 1 or r.id_b % 2 == 1
    }
    assert set(keys) == expect

    # Compaction physically removes the duplicates.
    compact_lsh_index(spark, store)
    assert spark.read.parquet(f"{store}/docs").drop("__bucket").count() == n_ids + probe.count()


def test_foreach_batch_embedding_requires_dim(spark, sf_dir, tmp_path):
    """The streaming adapter refuses dim-less construction (per-trigger
    driver inference) but works end-to-end with dim given."""
    import pytest

    from siddhi_io_cdc_spark.streaming.dedup import foreach_batch_embedding_dedup

    with pytest.raises(ValueError, match="explicit positive dim"):
        foreach_batch_embedding_dedup(spark, str(tmp_path / "s"), str(tmp_path / "p"), dim=None)
    with pytest.raises(ValueError, match="explicit positive dim"):
        foreach_batch_embedding_dedup(spark, str(tmp_path / "s"), str(tmp_path / "p"), dim=0)

    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(60)
    dup = vecs.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 10_000_001).alias("vec_id"), "embedding"
    )
    corpus = vecs.select("vec_id", "embedding").unionByName(dup)
    dim = len(corpus.select("embedding").first()[0])

    store, pairs_out = str(tmp_path / "store"), str(tmp_path / "pairs")
    apply_fn = foreach_batch_embedding_dedup(
        spark, store, pairs_out, dim=dim, threshold=0.98, num_buckets=8
    )
    apply_fn(corpus.where(F.col("vec_id") % 2 == 0), 0)
    apply_fn(corpus.where(F.col("vec_id") % 2 == 1), 1)

    from siddhi_io_cdc_spark.functions.similarity import embedding_near_dup_pairs

    got = {
        (r.id_a, r.id_b, r.cosine) for r in spark.read.parquet(pairs_out).collect()
    }
    expect = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_dup_pairs(corpus, threshold=0.98, dim=dim).collect()
    }
    assert expect and got == expect
