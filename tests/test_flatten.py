"""Flattening semantics — Spark restatement of the reference's listening-mode
round-trip assertions (TestCaseOfCDCListeningMode.java insert :129-139,
delete :215-236, update :309-329; multi-op example CDCSource.java:363-375)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.operators import flatten, lowercase_columns, schema_map
from siddhi_io_cdc_spark.sources.envelope import envelope_schema


ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)


def _env_df(spark, rows):
    return spark.createDataFrame(rows, envelope_schema(ROW_SCHEMA))


def _ev(op, before, after, src_ts=100, ts=200):
    return (op, before, after, {"ts_ms": src_ts}, ts)


def test_insert_single_op(spark):
    df = _env_df(spark, [_ev("c", None, ("e001", "empName"))])
    out = flatten(df, operations=["insert"])
    assert out.columns == ["id", "name"]
    assert out.collect() == [Row(id="e001", name="empName")]


def test_update_single_op_matches_reference_expectation(spark):
    # Reference expects [before_id, id, before_name, name] =
    # ["e001","e001","empName","newName"] (TestCaseOfCDCListeningMode.java:309-329).
    df = _env_df(spark, [_ev("u", ("e001", "empName"), ("e001", "newName"))])
    out = flatten(df, operations=["update"])
    r = out.collect()[0]
    assert (r["before_id"], r["id"], r["before_name"], r["name"]) == (
        "e001",
        "e001",
        "empName",
        "newName",
    )


def test_delete_single_op_emits_before_image(spark):
    df = _env_df(spark, [_ev("d", ("e001", "empName"), None)])
    out = flatten(df, operations=["delete"])
    assert out.columns == ["before_id", "before_name"]
    assert out.collect() == [Row(before_id="e001", before_name="empName")]


def test_op_filter_drops_unrequested(spark):
    df = _env_df(
        spark,
        [
            _ev("c", None, ("1", "a")),
            _ev("u", ("1", "a"), ("1", "b")),
            _ev("d", ("1", "b"), None),
        ],
    )
    assert flatten(df, operations=["insert"]).count() == 1
    assert flatten(df, operations=["delete"]).count() == 1
    assert flatten(df, operations=["insert", "delete"]).count() == 2


def test_multi_op_defaults_and_operation_column(spark):
    df = _env_df(
        spark,
        [
            _ev("c", None, ("1", "a"), 10, 11),
            _ev("u", ("1", "a"), ("1", "b"), 20, 21),
            _ev("d", ("1", "b"), None, 30, 31),
        ],
    )
    out = flatten(df, operations=["insert", "update", "delete"]).orderBy("ts_ms")
    rows = out.collect()
    # insert: current image real, before_ type-defaulted ("" for strings)
    assert rows[0].asDict() == {
        "id": "1", "name": "a", "before_id": "", "before_name": "",
        "operation": "insert", "source_ts_ms": 10, "ts_ms": 11,
    }
    # update: both images real
    assert rows[1].asDict() == {
        "id": "1", "name": "b", "before_id": "1", "before_name": "a",
        "operation": "update", "source_ts_ms": 20, "ts_ms": 21,
    }
    # delete: before_ real, current type-defaulted
    assert rows[2].asDict() == {
        "id": "", "name": "", "before_id": "1", "before_name": "b",
        "operation": "delete", "source_ts_ms": 30, "ts_ms": 31,
    }


def test_type_defaults_per_type(spark):
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("b", T.BooleanType()),
            T.StructField("f", T.DoubleType()),
            T.StructField("i", T.LongType()),
        ]
    )
    df = spark.createDataFrame(
        [("c", None, ("x", True, 1.5, 7), {"ts_ms": 1}, 2)], envelope_schema(schema)
    )
    out = flatten(df, operations=["insert", "delete"])
    r = out.collect()[0]
    # ChangeDataCapture.java:172-184 defaults: "" / false / 0.0 / 0
    assert (r["before_s"], r["before_b"], r["before_f"], r["before_i"]) == ("", False, 0.0, 0)


def test_invalid_operation_rejected(spark):
    df = _env_df(spark, [_ev("c", None, ("1", "a"))])
    with pytest.raises(ValueError):
        flatten(df, operations=["upsert"])  # CDCSource.java:791-796


def test_lowercase_columns(spark):
    df = spark.createDataFrame([(1, "a")], ["ID", "Name"])
    assert lowercase_columns(df).columns == ["id", "name"]


def test_schema_map_renames(spark):
    df = spark.createDataFrame([(1, "a", True)], ["k", "v", "extra"])
    out = schema_map(df, mapping={"id": "k", "name": "v"})
    assert out.columns == ["id", "name"]
    assert out.collect() == [Row(id=1, name="a")]


def test_multi_op_preserves_null_field_in_present_image(spark):
    # A NULL field inside a PRESENT image must stay NULL (defaults apply only
    # when the whole image is absent — RdbmsChangeDataCapture.java:69-126).
    df = _env_df(spark, [_ev("u", ("e001", None), ("e001", "newName"))])
    out = flatten(df, operations=["insert", "update"]).collect()[0]
    assert out["before_name"] is None
    assert out["name"] == "newName"
    # Whole-image absence still fills type defaults: insert has no before.
    df2 = _env_df(spark, [_ev("c", None, ("e002", "n2"))])
    out2 = flatten(df2, operations=["insert", "update"]).collect()[0]
    assert out2["before_id"] == "" and out2["before_name"] == ""


def test_metadata_name_collision_raises(spark):
    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("ts_ms", T.LongType())]
    )
    from siddhi_io_cdc_spark.sources.envelope import envelope_schema as es

    df = spark.createDataFrame([], es(schema))
    with pytest.raises(ValueError, match="collide"):
        flatten(df, operations=["insert", "delete"])


def test_compat_decimal_collapse(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("qty", T.DecimalType(10, 0)),
        ]
    )
    from decimal import Decimal

    from siddhi_io_cdc_spark.sources.envelope import envelope_schema as es

    df = spark.createDataFrame(
        [("c", None, ("e1", Decimal("12.34"), Decimal("7")), {"ts_ms": 1}, 2)], es(schema)
    )
    native = flatten(df, operations=["insert"])
    assert isinstance(native.schema["amount"].dataType, T.DecimalType)
    compat = flatten(df, operations=["insert"], compat_decimal=True)
    assert compat.schema["amount"].dataType.simpleString() == "double"
    assert compat.schema["qty"].dataType.simpleString() == "bigint"
    r = compat.collect()[0]
    assert r["amount"] == 12.34 and r["qty"] == 7


def test_snapshot_op_consumed_when_requested(spark):
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.operators.flatten import flatten
    from siddhi_io_cdc_spark.sources.envelope import synthetic_changelog

    base = spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v")
    # first half snapshot reads ('r'), second half live inserts ('c')
    env = synthetic_changelog(base, F.when(F.col("k") < 5, "r").otherwise("c"))
    # reference behavior: 'r' rows dropped unless requested
    assert flatten(env, operations=["insert"]).count() == 5
    got = flatten(env, operations=["snapshot"]).count()
    assert got == 5
    both = flatten(env, operations=["insert", "snapshot"])
    assert both.count() == 10
    ops = {r.operation for r in both.select("operation").distinct().collect()}
    assert ops == {"insert", "snapshot"}
    # snapshot rows are insert-shaped: before image NULL -> defaults
    snap = both.where(F.col("operation") == "snapshot").limit(1).collect()[0]
    assert snap.before_k == 0 and snap.k < 5


def test_flatten_array_column_defaults_to_null(spark):
    """Container-typed row columns (array/map/struct/binary) have no scalar
    "zero": an absent image must default to NULL, not die in an
    AnalysisException casting 0. This is the embedding-stream path
    (cdc_read_stream -> flatten -> IVF maintenance)."""
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.operators.flatten import flatten
    from siddhi_io_cdc_spark.sources.envelope import synthetic_changelog

    base = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    env = synthetic_changelog(
        base, op_col=F.when(F.col("vec_id") == 1, "c").otherwise("d")
    )
    rows = {r.operation: r for r in flatten(
        env, operations=["insert", "delete"]
    ).collect()}
    ins, dl = rows["insert"], rows["delete"]
    assert ins.embedding == [1.0, 2.0] and ins.before_embedding is None
    assert dl.before_embedding == [3.0, 4.0] and dl.embedding is None
