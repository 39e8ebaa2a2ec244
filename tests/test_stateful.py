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
