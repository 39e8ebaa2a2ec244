"""Mongo change-event parsing (E10-E12) — semantics mirror
MongoChangeDataCapture.java:60-144 (insert JSON parse, $set patch, $oid
remap, $numberLong/$numberDecimal, Long-via-Double compat)."""

import pytest
from pyspark.sql import types as T

from siddhi_io_cdc_spark.operators.mongo import MONGO_ENVELOPE_SCHEMA, mongo_flatten

ROW_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("volume", T.LongType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("meta", T.StringType()),
    ]
)


def _env(spark, rows):
    return spark.createDataFrame(rows, MONGO_ENVELOPE_SCHEMA)


INSERT_AFTER = (
    '{"_id": {"$oid": "64a1b2c3d4e5f60718293a4b"}, "name": "widget", '
    '"amount": {"$numberDecimal": "12.50"}, "volume": {"$numberLong": "9007199254740995"}, '
    '"active": true, "meta": {"color": "red", "size": 10}}'
)


def test_mongo_insert_parse(spark):
    df = _env(spark, [("c", None, INSERT_AFTER, None, {"ts_ms": 1}, 2)])
    out = mongo_flatten(df, ROW_SCHEMA, operations=["insert"]).collect()[0]
    assert out["id"] == "64a1b2c3d4e5f60718293a4b"  # $oid -> id (:133-135)
    assert out["name"] == "widget"
    assert out["amount"] == 12.50  # $numberDecimal -> double (:129-130)
    assert out["volume"] == 9007199254740995  # $numberLong -> exact long (:126-127)
    assert out["active"] is True
    # Nested document stringified (:137).
    assert '"color"' in out["meta"] and '"red"' in out["meta"]


def test_mongo_long_via_double_compat(spark):
    df = _env(spark, [("c", None, INSERT_AFTER, None, {"ts_ms": 1}, 2)])
    out = mongo_flatten(
        df, ROW_SCHEMA, operations=["insert"], compat_long_via_double=True
    )
    assert dict(out.dtypes)["volume"] == "double"
    # The reference's getDouble path loses integer precision above 2^53.
    assert out.collect()[0]["volume"] == float(9007199254740995)


def test_mongo_update_parse(spark):
    patch = '{"$set": {"amount": 99.9, "name": "renamed"}}'
    key = '{"id": {"$oid": "64a1b2c3d4e5f60718293a4b"}}'
    df = _env(spark, [("u", key, None, patch, {"ts_ms": 1}, 2)])
    out = mongo_flatten(df, ROW_SCHEMA, operations=["update"]).collect()[0]
    assert out["id"] == "64a1b2c3d4e5f60718293a4b"  # key id.$oid (:95-99)
    assert out["amount"] == 99.9 and out["name"] == "renamed"  # $set (:90-94)
    assert out["volume"] is None and out["active"] is None  # not in $set


def test_mongo_delete_parse(spark):
    key = '{"id": {"$oid": "ffff00000000000000000000"}}'
    df = _env(spark, [("d", key, None, None, {"ts_ms": 1}, 2)])
    out = mongo_flatten(df, ROW_SCHEMA, operations=["delete"]).collect()[0]
    assert out["id"] == "ffff00000000000000000000"  # :76-86
    assert out["name"] is None


def test_mongo_multi_op_metadata(spark):
    key = '{"id": {"$oid": "aaaa00000000000000000000"}}'
    df = _env(
        spark,
        [
            ("c", None, INSERT_AFTER, None, {"ts_ms": 10}, 20),
            ("d", key, None, None, {"ts_ms": 30}, 40),
        ],
    )
    rows = mongo_flatten(df, ROW_SCHEMA, operations=["insert", "delete"]).orderBy("ts_ms").collect()
    assert rows[0]["operation"] == "insert" and rows[0]["source_ts_ms"] == 10
    assert rows[1]["operation"] == "delete" and rows[1]["id"] == "aaaa00000000000000000000"


def test_mongo_invalid_operation_raises(spark):
    df = _env(spark, [])
    with pytest.raises(ValueError, match="unsupported"):
        mongo_flatten(df, ROW_SCHEMA, operations=["upsert"])
