"""Custom stateful operators: running counts and latest-value tracking
survive across micro-batches through the state store."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from siddhi_io_cdc_spark.sources.polling import register_cdc_poll
from siddhi_io_cdc_spark.streaming.stateful import latest_value, running_counts


def _append(path, ids, users, vals):
    pq.write_table(
        pa.table({"id": ids, "user": users, "v": vals}),
        os.path.join(path, f"part-{time.time_ns()}.parquet"),
    )


def _start(spark, tbl, transform, ckpt, name):
    register_cdc_poll(spark)
    stream = (
        spark.readStream.format("cdc-poll")
        .option("path", tbl)
        .option("pollingColumn", "id")
        .option("startFrom", "earliest")
        .load()
    )
    return (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )


def test_running_counts_accumulate_across_batches(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    _append(tbl, [1, 2, 3], ["u1", "u1", "u2"], [10, 11, 12])
    q = _start(
        spark, tbl, lambda s: running_counts(s, ["user"]), str(tmp_path / "ck"), "counts"
    )
    try:
        q.processAllAvailable()
        got = {r["user"]: r["n_events"] for r in spark.sql("select * from counts").collect()}
        assert got == {"u1": 2, "u2": 1}
        _append(tbl, [4, 5], ["u1", "u2"], [13, 14])
        q.processAllAvailable()
        rows = spark.sql("select * from counts").collect()
        latest = {}
        for r in rows:  # memory sink in update mode appends; last write wins
            latest[r["user"]] = max(latest.get(r["user"], 0), r["n_events"])
        assert latest == {"u1": 3, "u2": 2}
    finally:
        q.stop()


def test_latest_value_tracks_max_seq(spark, tmp_path):
    tbl = str(tmp_path / "tbl2")
    os.makedirs(tbl)
    _append(tbl, [1, 2], ["u1", "u1"], [100, 200])
    q = _start(
        spark,
        tbl,
        lambda s: latest_value(s, ["user"], "id", ["v"]),
        str(tmp_path / "ck2"),
        "latest",
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from latest").collect()
        assert {(r["user"], r["id"], r["v"]) for r in rows} == {("u1", 2, 200)}
        _append(tbl, [3], ["u1"], [300])
        q.processAllAvailable()
        rows = spark.sql("select * from latest").collect()
        assert ("u1", 3, 300) in {(r["user"], r["id"], r["v"]) for r in rows}
    finally:
        q.stop()


def test_exactly_once_dedupe_drops_replayed_events(spark, tmp_path):
    from siddhi_io_cdc_spark.streaming.lifecycle import exactly_once_dedupe

    tbl = str(tmp_path / "tbl3")
    os.makedirs(tbl)
    _append(tbl, [1, 2], ["u1", "u2"], [1, 2])
    register_cdc_poll(spark)
    stream = (
        spark.readStream.format("cdc-poll")
        .option("path", tbl)
        .option("pollingColumn", "id")
        .option("startFrom", "earliest")
        .load()
    )
    q = (
        exactly_once_dedupe(stream, ["user", "v"])  # event identity, not offset
        .writeStream.format("memory")
        .queryName("eo_sink")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # Replay delivers the SAME logical events (u1,1)/(u2,2) under fresh
        # polling ids (the at-least-once shape) plus one genuinely new event.
        _append(tbl, [3, 4, 5], ["u1", "u2", "u3"], [1, 2, 3])
        q.processAllAvailable()
        got = sorted((r["user"], r["v"]) for r in spark.sql("select user, v from eo_sink").collect())
        assert got == [("u1", 1), ("u2", 2), ("u3", 3)], got
    finally:
        q.stop()


def test_followed_by_stream_matches_across_batches(spark, tmp_path):
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.streaming.stateful import followed_by_stream

    src = str(tmp_path / "src")
    os.makedirs(src)

    def append(rows):  # (user, t, typ)
        pq.write_table(
            pa.table(
                {
                    "u": pa.array([r[0] for r in rows], pa.int64()),
                    "t": pa.array([r[1] for r in rows], pa.int64()),
                    "typ": pa.array([r[2] for r in rows], pa.string()),
                }
            ),
            os.path.join(src, f"p-{_time.time_ns()}.parquet"),
        )

    # batch 1: A@10 (u1) unmatched yet; A@5+B@12 (u2) match in-batch;
    # B@100 (u3) with no A.
    append([(1, 10, "a"), (2, 5, "a"), (2, 12, "b"), (3, 100, "b")])
    stream = (
        spark.readStream.schema("u long, t long, typ string").parquet(src)
        .withColumn("is_a", F.col("typ") == "a")
        .withColumn("is_b", F.col("typ") == "b")
    )
    out = followed_by_stream(stream, ["u"], "t", "is_a", "is_b", within=20)
    q = (
        out.writeStream.format("memory")
        .queryName("fb_matches")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.u, r.first_time, r.second_time)
               for r in spark.sql("select * from fb_matches").collect()}
        assert got == {(2, 5, 12)}
        # batch 2: u1's B arrives within window -> cross-batch match; a second
        # B@28 for u2 must NOT re-match the consumed A@5.
        append([(1, 25, "b"), (2, 24, "b")])
        q.processAllAvailable()
        got = {(r.u, r.first_time, r.second_time)
               for r in spark.sql("select * from fb_matches").collect()}
        assert got == {(2, 5, 12), (1, 10, 25)}
    finally:
        q.stop()
