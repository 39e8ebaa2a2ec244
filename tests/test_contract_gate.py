"""The local contract gate's TYPE canonicalization (tools/check_contract.py).

The gate's type check exists because the driver's value hash is typed
(round-6: DuckDB HUGEINT vs Spark int64 hashed differently despite equal
values). These tests pin the two canonicalizers to the same tag space and
pin the specific hazard classes the round-7 audit found, so a refactor of
either mapping cannot silently reopen the gap.
"""

import sys

import pyarrow as pa
import pytest
from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from tools.check_contract import _canon_arrow_type, _canon_spark_type


@pytest.mark.parametrize(
    "spark_type,arrow_type",
    [
        (T.LongType(), pa.int64()),
        (T.IntegerType(), pa.int32()),
        (T.DoubleType(), pa.float64()),
        (T.FloatType(), pa.float32()),
        (T.StringType(), pa.string()),
        (T.StringType(), pa.large_string()),
        (T.BooleanType(), pa.bool_()),
        (T.BinaryType(), pa.binary()),
        (T.DateType(), pa.date32()),
        (T.TimestampType(), pa.timestamp("us")),
        (T.DecimalType(12, 2), pa.decimal128(12, 2)),
        (T.ArrayType(T.DoubleType()), pa.list_(pa.float64())),
        (
            T.MapType(T.StringType(), T.LongType()),
            pa.map_(pa.string(), pa.int64()),
        ),
    ],
)
def test_matching_types_share_a_tag(spark_type, arrow_type):
    assert _canon_spark_type(spark_type) == _canon_arrow_type(arrow_type)


@pytest.mark.parametrize(
    "spark_type,arrow_type",
    [
        # the round-6 driver red row: sum(BIGINT) -> HUGEINT (decimal128(38,0))
        (T.LongType(), pa.decimal128(38, 0)),
        # the round-7 audit's classes
        (T.IntegerType(), pa.int64()),       # row_number/year/len ranks
        (T.DoubleType(), pa.decimal128(4, 1)),  # round() decimal scores
        (T.DoubleType(), pa.float32()),      # float-list arithmetic
        (T.LongType(), pa.int32()),          # bare 0 literals
        (
            T.ArrayType(T.DoubleType()),
            pa.list_(pa.float32()),          # element-type drift in arrays
        ),
    ],
)
def test_hazard_classes_are_distinguished(spark_type, arrow_type):
    assert _canon_spark_type(spark_type) != _canon_arrow_type(arrow_type)


def test_duckdb_hugeint_surfaces_as_decimal38():
    """The concrete round-6 failure, end-to-end through DuckDB: a window
    sum of BIGINT modulo a constant is HUGEINT, whose Arrow type is
    decimal128(38,0) — distinguishable from int64 by the gate."""
    import duckdb

    tbl = duckdb.connect().execute(
        "SELECT sum(x) OVER () % 512 AS v FROM (VALUES (CAST(1 AS BIGINT))) t(x)"
    ).fetch_arrow_table()
    assert _canon_arrow_type(tbl.schema.field("v").type) == "decimal(38,0)"
    assert _canon_spark_type(T.LongType()) != "decimal(38,0)"
