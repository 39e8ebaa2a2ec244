"""Kafka-shaped envelope parsing (production listening path) and the
checkpoint-restart policy (T10)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.operators import flatten
from siddhi_io_cdc_spark.sources.envelope import parse_kafka_envelope
from siddhi_io_cdc_spark.sources.polling import register_cdc_poll
from siddhi_io_cdc_spark.streaming.lifecycle import run_with_restarts

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
)


def _kafka_df(spark, payloads):
    """Batch DataFrame shaped exactly like readStream.format('kafka') output."""
    rows = [
        (None, p.encode() if p is not None else None, "cdc.shop.orders", 0, i)
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )


def test_parse_kafka_envelope_roundtrip(spark):
    payloads = [
        '{"op": "c", "before": null, "after": {"id": "e1", "name": "a"}, '
        '"source": {"ts_ms": 5}, "ts_ms": 6}',
        '{"op": "u", "before": {"id": "e1", "name": "a"}, '
        '"after": {"id": "e1", "name": "b"}, "source": {"ts_ms": 7}, "ts_ms": 8}',
    ]
    env = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA)
    assert env.count() == 2
    # Kafka provenance rides along.
    assert {r["_kafka_offset"] for r in env.collect()} == {0, 1}
    # And the standard flatten pipeline applies unchanged.
    flat = flatten(env.drop("_kafka_topic", "_kafka_partition", "_kafka_offset"),
                   operations=["update"]).collect()
    assert flat[0]["before_name"] == "a" and flat[0]["name"] == "b"


def test_parse_kafka_envelope_lenient_drops_garbage(spark):
    payloads = ['not json at all', '{"op": "c", "after": {"id": "x", "name": "y"}}']
    strict = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA)
    assert strict.count() == 2  # malformed kept as NULL-op for dead-lettering
    lenient = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA, lenient=True)
    assert lenient.count() == 1


def test_run_with_restarts_resumes_from_checkpoint(spark, tmp_path):
    """A query that dies mid-stream is restarted and loses nothing."""
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    pq.write_table(pa.table({"id": [0], "v": ["x"]}), f"{tbl}/p0.parquet")
    register_cdc_poll(spark)
    out = str(tmp_path / "out")
    poison_armed = str(tmp_path / "poison")
    open(poison_armed, "w").close()
    pq.write_table(pa.table({"id": [1, 2], "v": ["a", "b"]}), f"{tbl}/p1.parquet")

    errors = []

    def start_query():
        df = (
            spark.readStream.format("cdc-poll")
            .option("path", tbl)
            .option("pollingColumn", "id")
            .option("startFrom", "earliest")
            .load()
        )

        def write_batch(batch_df, batch_id):
            if os.path.exists(poison_armed):
                os.remove(poison_armed)  # fail exactly once
                raise RuntimeError("transient sink failure")
            batch_df.write.mode("append").parquet(out)

        return (
            df.writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )

    restarts = run_with_restarts(
        start_query,
        max_restarts=2,
        backoff_seconds=0.1,
        on_error=lambda e, n: errors.append(n),
    )
    assert restarts == 1 and errors == [0]
    got = sorted(r["id"] for r in spark.read.parquet(out).collect())
    assert got == [0, 1, 2]  # replayed batch delivered after restart


def test_run_with_restarts_gives_up(spark, tmp_path):
    tbl = str(tmp_path / "tbl2")
    os.makedirs(tbl)
    pq.write_table(pa.table({"id": [1], "v": ["a"]}), f"{tbl}/p0.parquet")
    register_cdc_poll(spark)

    def start_query():
        df = (
            spark.readStream.format("cdc-poll")
            .option("path", tbl)
            .option("pollingColumn", "id")
            .option("startFrom", "earliest")
            .load()
        )

        def always_fail(batch_df, batch_id):
            raise RuntimeError("permanent failure")

        return (
            df.writeStream.foreachBatch(always_fail)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        run_with_restarts(start_query, max_restarts=1, backoff_seconds=0.05)


def test_parse_kafka_envelope_drops_tombstones(spark):
    """Debezium delete-tombstones (key, NULL value) are dropped before the
    JSON parse — matching the reference's implicit NPE-drop
    (RdbmsChangeDataCapture.java:55-59)."""
    payloads = [
        '{"op": "d", "before": {"id": "e1", "name": "a"}, "after": null, '
        '"source": {"ts_ms": 5}, "ts_ms": 6}',
        None,  # the tombstone that follows a delete
        '{"op": "c", "before": null, "after": {"id": "e2", "name": "b"}, '
        '"source": {"ts_ms": 7}, "ts_ms": 8}',
    ]
    env = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA)
    assert env.count() == 2
    assert sorted(r.op for r in env.collect()) == ["c", "d"]
    kept = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA, drop_tombstones=False)
    assert kept.count() == 3  # opt-out keeps the NULL-op row for auditing


def test_split_dead_letter_routes_malformed(spark):
    from siddhi_io_cdc_spark.sources.envelope import split_dead_letter

    payloads = [
        "not json at all",
        '{"op": "c", "before": null, "after": {"id": "x", "name": "y"}, '
        '"source": {"ts_ms": 1}, "ts_ms": 1}',
    ]
    env = parse_kafka_envelope(_kafka_df(spark, payloads), ROW_SCHEMA)
    good, dead = split_dead_letter(env)
    assert [r.op for r in good.collect()] == ["c"]
    assert "_raw_value" not in good.columns
    d = dead.collect()
    assert len(d) == 1 and d[0]._raw_value == "not json at all"
    assert d[0]._kafka_offset == 0  # provenance for replay after a fix
