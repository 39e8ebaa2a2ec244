"""Stream-stream join surface (SURVEY.md §2.5): two watermarked CDC-style
streams joined with an event-time range condition — Spark-native, no custom
code. Pinned here so the engine's claim of native coverage stays tested."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _append(path, ids, ts, vals):
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "v": pa.array(vals, pa.string()),
            }
        ),
        os.path.join(path, f"p-{time.time_ns()}.parquet"),
    )


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    left_dir, right_dir = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(left_dir)
    os.makedirs(right_dir)
    _append(left_dir, [1, 2], [100, 200], ["l1", "l2"])
    _append(right_dir, [1, 2], [105, 290], ["r1", "r2"])

    left = (
        spark.readStream.schema("id long, t long, v string")
        .parquet(left_dir)
        .select("id", F.timestamp_seconds("t").alias("lts"), F.col("v").alias("lv"))
        .withWatermark("lts", "30 seconds")
    )
    right = (
        spark.readStream.schema("id long, t long, v string")
        .parquet(right_dir)
        .select(
            F.col("id").alias("rid"),
            F.timestamp_seconds("t").alias("rts"),
            F.col("v").alias("rv"),
        )
        .withWatermark("rts", "30 seconds")
    )
    joined = left.join(
        right,
        (F.col("id") == F.col("rid"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 60 seconds")),
        "inner",
    ).select("id", "lv", "rv")

    q = (
        joined.writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {(r.id, r.lv, r.rv) for r in spark.sql("select * from ssjoin").collect()}
        # id=1 matches (105 within [100, 160]); id=2 does not (290 > 260).
        assert got == {(1, "l1", "r1")}
        _append(right_dir, [2], [230], ["r2b"])  # late-but-in-range right row
        q.processAllAvailable()
        got = {(r.id, r.lv, r.rv) for r in spark.sql("select * from ssjoin").collect()}
        assert got == {(1, "l1", "r1"), (2, "l2", "r2b")}
    finally:
        q.stop()
