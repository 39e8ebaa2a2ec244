"""MongoDB change-event parsing (E10-E12).

Re-expresses the reference's Mongo listening path
(``listening/MongoChangeDataCapture.java:60-144``) as pure JVM JSON
expressions (``get_json_object`` — no Python in the row path):

- **insert** (:68-75): the ``after`` field is a JSON document string →
  typed columns per the user's row schema; the ``_id`` subdocument
  ``{"$oid": ...}`` is remapped to column ``id`` (:133-135).
- **update** (:87-100): the ``patch`` JSON's ``$set`` subdocument carries the
  changed fields; ``id`` comes from the record key's ``id.$oid``.
- **delete** (:76-86): only ``id`` from the record key.
- Extended-JSON numerics (:126-131): ``{"$numberLong": "n"}`` → long,
  ``{"$numberDecimal": "x"}`` → double.
- Nested documents (:137): stringified JSON (``get_json_object`` returns the
  raw object text for a struct-valued path — same behavior).
- ``compat_long_via_double`` replays the reference's lossy ``Long`` handling
  (:118-119 reads longs with ``getDouble``): integer fields come out as
  doubles. Default off → correct long typing.

Input DataFrame shape (what a Debezium-Mongo topic lands as):
``op string, key string (JSON), after string (JSON), patch string (JSON),
source struct<ts_ms: long>, ts_ms long``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.sources.envelope import OP_NAMES

MONGO_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("after", T.StringType(), True),
        T.StructField("patch", T.StringType(), True),
        T.StructField("source", T.StructType([T.StructField("ts_ms", T.LongType(), True)]), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)


def _field_expr(src: Column, name: str, dtype: T.DataType, compat_long_via_double: bool) -> Column:
    """Typed extraction of one field from a Mongo JSON document column."""
    plain = F.get_json_object(src, f"$.{name}")
    number_long = F.get_json_object(src, f"$.{name}.$numberLong")
    number_decimal = F.get_json_object(src, f"$.{name}.$numberDecimal")
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        if compat_long_via_double:
            # Long-via-getDouble compat (MongoChangeDataCapture.java:118-119):
            # integer columns surface as doubles, losing >2^53 precision.
            return F.coalesce(number_long, plain).cast("double")
        return F.coalesce(number_long, plain).cast("long" if isinstance(dtype, T.LongType) else dtype.simpleString())
    if isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        return F.coalesce(number_decimal, plain).cast(dtype)
    if isinstance(dtype, T.BooleanType):
        return plain.cast("boolean")
    # Strings: scalars come back unquoted; nested documents come back as the
    # raw JSON object text (the reference stringifies them, :137).
    return plain


def mongo_flatten(
    df: DataFrame,
    row_schema: T.StructType,
    operations: Sequence[str] = ("insert",),
    compat_long_via_double: bool = False,
    include_metadata: bool | None = None,
    id_column: str = "id",
) -> DataFrame:
    """Flatten a Mongo change stream into typed rows.

    ``row_schema`` declares the payload fields (NOT including ``id`` — the
    ``_id.$oid`` always lands in ``id_column``, mirroring the reference's
    ``MONGO_COLLECTION_ID`` remap). Update/delete events carry only the
    fields Mongo sent (``$set`` subset / nothing); absent fields are NULL —
    the keyvalue-mapper drop behavior (SURVEY.md §1.2), not type defaults.
    """
    ops = [o.strip().lower() for o in operations]
    bad = [o for o in ops if o not in ("insert", "update", "delete")]
    if bad:
        raise ValueError(f"unsupported operation(s) {bad}")
    if include_metadata is None:
        include_metadata = len(ops) > 1

    out = df.filter(F.col("op").isin([OP_NAMES[o] for o in ops]))

    set_doc = F.get_json_object(F.col("patch"), "$.$set")
    id_expr = (
        F.when(F.col("op") == "c", F.get_json_object(F.col("after"), "$._id.$oid"))
        .otherwise(F.get_json_object(F.col("key"), "$.id.$oid"))
        .alias(id_column)
    )

    cols: list[Column] = [id_expr]
    for f in row_schema.fields:
        value = (
            F.when(
                F.col("op") == "c",
                _field_expr(F.col("after"), f.name, f.dataType, compat_long_via_double),
            )
            .when(
                F.col("op") == "u",
                _field_expr(set_doc, f.name, f.dataType, compat_long_via_double),
            )
            .otherwise(F.lit(None).cast(_out_type(f.dataType, compat_long_via_double)))
        )
        cols.append(value.alias(f.name))

    if include_metadata:
        operation_col = F.col("op")
        for code, name in (("c", "insert"), ("u", "update"), ("d", "delete")):
            operation_col = F.when(F.col("op") == code, F.lit(name)).otherwise(operation_col)
        cols += [
            operation_col.alias("operation"),
            F.col("source.ts_ms").alias("source_ts_ms"),
            F.col("ts_ms").alias("ts_ms"),
        ]
    return out.select(*cols)


def _out_type(dtype: T.DataType, compat_long_via_double: bool) -> str:
    if compat_long_via_double and isinstance(
        dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    ):
        return "double"
    return dtype.simpleString()
