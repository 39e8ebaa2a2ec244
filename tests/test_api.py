"""Top-level cdc facade (S1): validation-first dispatch to polling/listening,
plus Spark-native streaming windows over the CDC source (§2.5 streaming)."""

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.api import cdc_read_stream
from siddhi_io_cdc_spark.sources.connectors import WrongConfigurationError

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
)


def test_facade_validates_before_starting(spark):
    with pytest.raises(WrongConfigurationError, match="polling.column"):
        cdc_read_stream(spark, {"mode": "polling", "path": "/tmp/x"})
    with pytest.raises(WrongConfigurationError, match="row_schema"):
        cdc_read_stream(spark, {"mode": "listening", "path": "/tmp/x", "url": "jdbc:mysql://h:3306/d", "table.name": "t"})
    with pytest.raises(WrongConfigurationError, match="operation"):
        cdc_read_stream(
            spark,
            {"mode": "polling", "path": "/tmp/x", "polling.column": "id", "operation": "merge"},
        )


def test_facade_polling_end_to_end(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    pq.write_table(pa.table({"id": [1], "v": ["a"]}), f"{tbl}/p0.parquet")
    stream = cdc_read_stream(
        spark,
        {"mode": "polling", "path": tbl, "polling.column": "id", "start.from": "earliest"},
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("facade_sink")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert [r["id"] for r in spark.sql("select id from facade_sink").collect()] == [1]


def test_facade_listening_flattens_by_operation(spark, tmp_path):
    log = str(tmp_path / "log")
    os.makedirs(log)
    events = [
        {"op": "c", "before": None, "after": {"id": "e1", "name": "a"},
         "source": {"ts_ms": 1}, "ts_ms": 2},
        {"op": "d", "before": {"id": "e0", "name": "z"}, "after": None,
         "source": {"ts_ms": 3}, "ts_ms": 4},
    ]
    with open(f"{log}/chunk0.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    stream = cdc_read_stream(
        spark,
        {"mode": "listening", "path": log, "url": "jdbc:mysql://h:3306/d",
         "table.name": "t", "operation": "insert"},
        row_schema=ROW_SCHEMA,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("facade_listen")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select * from facade_listen").collect()
    assert len(rows) == 1 and rows[0]["id"] == "e1"  # delete filtered out


def test_streaming_window_agg_over_cdc_source(spark, tmp_path):
    """Tumbling-window count with watermark over the cdc-poll stream —
    the §2.5 streaming-window surface is Spark-native over our source."""
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    base = 1_700_000_000
    pq.write_table(
        pa.table({
            "id": [1, 2, 3, 4],
            "ev_ts": [base + 1, base + 2, base + 61, base + 62],
        }),
        f"{tbl}/p0.parquet",
    )
    stream = cdc_read_stream(
        spark,
        {"mode": "polling", "path": tbl, "polling.column": "id", "start.from": "earliest"},
    )
    windowed = (
        stream.withColumn("ev_time", F.col("ev_ts").cast("timestamp"))
        .withWatermark("ev_time", "10 seconds")
        .groupBy(F.window("ev_time", "60 seconds").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("win_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckw"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {str(r["ws"]): r["n"] for r in spark.sql("select * from win_sink").collect()}
    assert sorted(got.values()) == [2, 2]


def test_avro_envelope_raises_clear_error_without_spark_avro(spark):
    """The avro connector jar isn't bundled with pyspark; the gated path
    must fail with an actionable message (and work when the jar is added —
    exercised implicitly by the same code path)."""
    import pytest

    from siddhi_io_cdc_spark.sources.envelope import parse_kafka_avro_envelope

    kafka_shaped = spark.createDataFrame(
        [(b"k", b"\x00\x00\x00\x00\x01payload", "t", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    schema = '{"type":"record","name":"env","fields":[{"name":"op","type":"string"}]}'
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        have_import = True
    except ImportError:
        have_import = False
    if not have_import:
        with pytest.raises(RuntimeError, match="spark-avro"):
            parse_kafka_avro_envelope(kafka_shaped, schema)
    else:
        # python-side import exists; JVM data source may still be missing
        try:
            parse_kafka_avro_envelope(kafka_shaped, schema).collect()
        except RuntimeError as e:
            assert "spark-avro" in str(e)
        except Exception as e:
            assert "AVRO" in str(e).upper()


def test_bootstrap_then_stream_no_gap_no_overlap(spark, tmp_path):
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from siddhi_io_cdc_spark.api import cdc_bootstrap_then_stream

    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)

    def append(ids):
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64())}),
            os.path.join(tbl, f"p-{time.time_ns()}.parquet"),
        )

    append([1, 2, 3])
    snapshot, stream = cdc_bootstrap_then_stream(
        spark, {"mode": "polling", "path": tbl, "polling.column": "id"}
    )
    snap_ids = sorted(r.id for r in snapshot.collect())
    assert snap_ids == [1, 2, 3]
    q = (
        stream.writeStream.format("memory")
        .queryName("boot_tail")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("select * from boot_tail").count() == 0  # no overlap
        append([4, 5])
        q.processAllAvailable()
        got = sorted(r.id for r in spark.sql("select * from boot_tail").collect())
        assert got == [4, 5]  # no gap
    finally:
        q.stop()


def test_api_passes_ordering_and_projection_options(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from siddhi_io_cdc_spark.api import cdc_read_stream

    tbl = tmp_path / "t"
    tbl.mkdir()
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()), "a": ["x", "y"], "b": [1.0, 2.0]}),
        str(tbl / "p0.parquet"),
    )
    df = cdc_read_stream(
        spark,
        {
            "mode": "polling",
            "path": str(tbl),
            "polling.column": "id",
            "order.by.polling.column": "true",
            "columns": "id,b",
        },
    )
    assert df.columns == ["id", "b"]
