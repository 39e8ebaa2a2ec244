"""Window aggregations (streaming/windows.py): batch semantics pinned, plus
a real Structured Streaming run with watermarked tumbling windows."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg


def test_tumbling_buckets(spark):
    df = spark.createDataFrame([(0, 1.0), (99, 2.0), (100, 3.0), (250, 4.0)], "t long, v double")
    got = {
        r.window_start: (r.n, r.sv)
        for r in tumbling_agg(
            df, F.timestamp_seconds("t"), 100, {"n": F.count(F.lit(1)), "sv": F.sum("v")}
        ).collect()
    }
    assert got == {0: (2, 3.0), 100: (1, 3.0), 200: (1, 4.0)}


def test_sliding_epoch_aligned_with_negative_starts(spark):
    df = spark.createDataFrame([(50,)], "t long")
    got = sorted(
        r.window_start
        for r in sliding_agg(df, F.timestamp_seconds("t"), 100, 40, {"n": F.count(F.lit(1))}).collect()
    )
    assert got == [-40, 0, 40]  # every epoch-aligned window containing t=50


def test_session_gap_inclusive_merge(spark):
    # 0,29 merge (gap 29<30); 30 after 29 still merges (inclusive); 95 breaks.
    df = spark.createDataFrame([(0,), (29,), (59,), (95,)], "t long")
    got = sorted(
        (r.session_start, r.n)
        for r in session_agg(df, F.timestamp_seconds("t"), 30, {"n": F.count(F.lit(1))}).collect()
    )
    assert got == [(0, 3), (95, 1)]


def test_session_keys_partition_sessions(spark):
    df = spark.createDataFrame([("a", 0), ("a", 10), ("b", 5)], "k string, t long")
    got = sorted(
        (r.k, r.session_start, r.n)
        for r in session_agg(
            df, F.timestamp_seconds("t"), 30, {"n": F.count(F.lit(1))}, keys=["k"]
        ).collect()
    )
    assert got == [("a", 0, 2), ("b", 5, 1)]


def test_tumbling_streaming_with_watermark(spark, tmp_path):
    """The same tumbling_agg call runs unchanged on a streaming input with a
    watermark (append mode emits a window once the watermark passes it)."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def _append(ts_values):
        pq.write_table(
            pa.table({"t": pa.array(ts_values, pa.int64())}),
            os.path.join(src, f"p-{time.time_ns()}.parquet"),
        )

    _append([0, 50, 99])
    stream = (
        spark.readStream.schema("t long")
        .parquet(src)
        .withColumn("ts", F.timestamp_seconds("t"))
        .withWatermark("ts", "10 seconds")
    )
    out = tumbling_agg(stream, F.col("ts"), 100, {"n": F.count(F.lit(1))})
    q = (
        out.writeStream.format("memory")
        .queryName("tumble_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        # Watermark (max 99 - 10 = 89) hasn't passed window [0,100) yet.
        assert spark.sql("select * from tumble_stream").count() == 0
        _append([250])  # advances watermark to 240 → closes [0,100)
        q.processAllAvailable()
        _append([400])  # closes [200,300)
        q.processAllAvailable()
        got = {r.window_start: r.n for r in spark.sql("select * from tumble_stream").collect()}
        assert got[0] == 3 and got[200] == 1
    finally:
        q.stop()


def test_length_window_trailing_n(spark):
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.streaming.windows import length_window_agg

    df = spark.createDataFrame([(1, t, 1.0) for t in range(5)], "u long, t long, v double")
    got = {
        r.t: r.n
        for r in length_window_agg(df, ["u"], "t", {"n": F.count(F.lit(1))}, length=3).collect()
    }
    assert got == {0: 1, 1: 2, 2: 3, 3: 3, 4: 3}  # ramps up then holds at N


def test_length_batch_tumbling_counts(spark):
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.streaming.windows import length_batch_agg

    df = spark.createDataFrame([(1, t) for t in range(7)], "u long, t long")
    got = {
        r.batch_no: r.n
        for r in length_batch_agg(df, ["u"], "t", {"n": F.count(F.lit(1))}, length=3).collect()
    }
    assert got == {0: 3, 1: 3, 2: 1}  # two full batches + the remainder


def test_unique_window_latest_per_key(spark):
    from siddhi_io_cdc_spark.streaming.windows import unique_window

    df = spark.createDataFrame(
        [(1, "a", 10, 1.0), (1, "a", 20, 2.0), (1, "b", 5, 3.0), (2, "a", 7, 4.0)],
        "u long, k string, seq long, v double",
    )
    got = sorted(
        (r.u, r.k, r.seq, r.v)
        for r in unique_window(df, ["u", "k"], "seq").collect()
    )
    # latest event per (u, k); the (1,a,10) event was expired by (1,a,20).
    assert got == [(1, "a", 20, 2.0), (1, "b", 5, 3.0), (2, "a", 7, 4.0)]


def test_sort_window_top_n_per_key_and_global(spark):
    from siddhi_io_cdc_spark.streaming.windows import sort_window

    df = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, 9.0), (1, 3, 7.0), (1, 4, 9.0), (2, 5, 1.0)],
        "u long, eid long, v double",
    )
    per_key = sorted(
        (r.u, r.eid)
        for r in sort_window(
            df, [F.col("v").desc(), F.col("eid")], length=2, keys=["u"]
        ).collect()
    )
    # u=1 keeps the two highest v (tie at 9.0 broken by eid: 2 then 4); u=2 all.
    assert per_key == [(1, 2), (1, 4), (2, 5)]

    global_top = sorted(
        r.eid
        for r in sort_window(df, [F.col("v").desc(), F.col("eid")], length=3).collect()
    )
    assert global_top == [2, 3, 4]


def test_time_length_window_dual_bound(spark):
    from siddhi_io_cdc_spark.streaming.windows import time_length_window

    # u=1: 7 events, horizon cuts at t>40 (max 100) -> {50,60,80,90,100},
    # then N=3 keeps the newest three. u=2: horizon is the tighter bound.
    rows = [(1, t) for t in (10, 30, 50, 60, 80, 90, 100)] + [(2, 5), (2, 90), (2, 95)]
    df = spark.createDataFrame(rows, "u long, t long")
    got = sorted(
        (r.u, r.t)
        for r in time_length_window(df, ["u"], "t", horizon=60, length=3).collect()
    )
    assert got == [(1, 80), (1, 90), (1, 100), (2, 90), (2, 95)]


def test_delay_window_releases_past_highwater(spark):
    from siddhi_io_cdc_spark.streaming.windows import delay_window

    df = spark.createDataFrame(
        [(1, 10), (1, 40), (1, 100), (2, 5), (2, 50)], "u long, t long"
    )
    keyed = sorted(
        (r.u, r.t, r.release_ts)
        for r in delay_window(df, "t", delay=50, keys=["u"]).collect()
    )
    # u=1 hwm=100 -> t<=50 released: 10, 40; u=2 hwm=50 -> t<=0: none.
    assert keyed == [(1, 10, 60), (1, 40, 90)]
    global_rel = sorted(
        r.t for r in delay_window(df, "t", delay=50).collect()
    )
    assert global_rel == [5, 10, 40, 50]  # global hwm=100 -> t<=50


def test_first_unique_window_keeps_first_per_key(spark):
    """window.firstUnique: first event per key survives, later ones drop
    (the dual of window.unique)."""
    from siddhi_io_cdc_spark.streaming.windows import first_unique_window, unique_window

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0), (5, "c", 50.0)],
        "event_id long, k string, v double",
    )
    first = {(r.k, r.event_id) for r in first_unique_window(df, ["k"], "event_id").collect()}
    assert first == {("a", 1), ("b", 3), ("c", 5)}
    latest = {(r.k, r.event_id) for r in unique_window(df, ["k"], "event_id").collect()}
    assert latest == {("a", 2), ("b", 4), ("c", 5)}
