"""Streaming absence detection: stream-stream outer join + watermark."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.streaming.cep import absent_pattern_stream


def _write(path, rows, time_col):
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "u": pa.array([r[0] for r in rows], pa.int64()),
                time_col: pa.array([r[1] for r in rows], pa.int64()),
            }
        ),
        os.path.join(path, f"p-{time.time_ns()}.parquet"),
    )


def test_absence_alerts_after_watermark_passes(spark, tmp_path):
    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    # A@10 (u1): B@15 follows within 20 -> suppressed.
    # A@50 (u2): no B -> must alert once the watermark passes 70.
    _write(ldir, [(1, 10), (2, 50)], "lt")
    _write(rdir, [(1, 15)], "rt")

    left = (
        spark.readStream.schema("u long, lt long").parquet(ldir)
        .select("u", F.timestamp_seconds("lt").alias("l_ts"))
    )
    right = (
        spark.readStream.schema("u long, rt long").parquet(rdir)
        .select(F.col("u"), F.timestamp_seconds("rt").alias("r_ts"))
    )
    alerts = absent_pattern_stream(
        left, right, on=["u"], left_time="l_ts", right_time="r_ts", within_sec=20
    )
    q = (
        alerts.writeStream.format("memory")
        .queryName("absence_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # Watermark is still at max(seen)-delay; u2's deadline (70) hasn't
        # passed -> no alerts can have been finalized yet.
        assert spark.sql("select * from absence_alerts").count() == 0
        # Advance both watermarks beyond 70 (join watermark is the min of
        # the two sides) -> u2 alert must flush; u1 stays suppressed.
        _write(ldir, [(9, 500)], "lt")
        _write(rdir, [(9, 505)], "rt")
        q.processAllAvailable()
        q.processAllAvailable()  # one more cycle: state eviction finalizes
        got = [(r.u, r.l_ts.timestamp()) for r in spark.sql("select * from absence_alerts").collect()]
        assert got == [(2, 50.0)]
    finally:
        q.stop()
