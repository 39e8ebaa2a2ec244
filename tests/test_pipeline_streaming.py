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
