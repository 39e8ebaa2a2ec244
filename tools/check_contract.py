"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares it to
the matching ``oracle_sql()`` through DuckDB: row count, sorted column names,
an order-insensitive exact value comparison (floats compared bit-exactly,
mirroring a value-hash), AND a per-column TYPE comparison (DuckDB's Arrow
schema vs the Spark schema, both canonicalized). The type check exists
because the driver's value hash is typed: round 6's only red row was
``llm_pack_sequences``, whose values matched but whose oracle emitted
DuckDB HUGEINT (``sum(BIGINT)`` widens to int128) where Spark emits int64 —
invisible to a Python-int-normalizing comparison, fatal to a typed hash.
Exit code 1 on any mismatch.

Usage: python tools/check_contract.py [names...]
"""

from __future__ import annotations

import math
import os
import sys
import time

# Runnable as `python tools/check_contract.py` without PYTHONPATH: the repo
# root (one level up) hosts __spark_entry__ and siddhi_io_cdc_spark.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return str(v)
    return str(v)


def _norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _canon_spark_type(dt) -> str:
    """Spark DataType -> canonical tag matching Spark's Arrow conversion."""
    from pyspark.sql import types as T

    if isinstance(dt, T.ByteType):
        return "int8"
    if isinstance(dt, T.ShortType):
        return "int16"
    if isinstance(dt, T.IntegerType):
        return "int32"
    if isinstance(dt, T.LongType):
        return "int64"
    if isinstance(dt, T.FloatType):
        return "float32"
    if isinstance(dt, T.DoubleType):
        return "float64"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{_canon_spark_type(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return (
            f"map<{_canon_spark_type(dt.keyType)},"
            f"{_canon_spark_type(dt.valueType)}>"
        )
    if isinstance(dt, T.StructType):
        inner = ",".join(
            f"{f.name}:{_canon_spark_type(f.dataType)}" for f in dt.fields
        )
        return f"struct<{inner}>"
    return dt.simpleString()


def _canon_arrow_type(t) -> str:
    """pyarrow DataType -> the same canonical tags as _canon_spark_type.

    DuckDB HUGEINT surfaces in Arrow as decimal128(38,0) — kept distinct
    from int64 on purpose; that distinction IS the round-6 driver bug.
    """
    import pyarrow as pa

    if pa.types.is_integer(t):
        return str(t)  # int8/int16/int32/int64/uint*
    if pa.types.is_float32(t):
        return "float32"
    if pa.types.is_float64(t):
        return "float64"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_map(t):
        return f"map<{_canon_arrow_type(t.key_type)},{_canon_arrow_type(t.item_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{_canon_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def _type_mismatches(sdf, arrow_schema) -> list[str]:
    spark_types = {f.name: _canon_spark_type(f.dataType) for f in sdf.schema.fields}
    out = []
    for field in arrow_schema:
        st = spark_types.get(field.name)
        if st is None:
            continue  # column-name mismatch is reported separately
        ot = _canon_arrow_type(field.type)
        if st != ot:
            out.append(f"type[{field.name}]: spark {st} != oracle {ot}")
    return out


def main(argv: list[str]) -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from siddhi_io_cdc_spark.session import get_spark

    spark = get_spark("contract-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = argv or list(queries)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            arrow_schema = con.execute(oracles[name]).fetch_arrow_table().schema
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        problems.extend(_type_mismatches(sdf, arrow_schema))
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sn = _norm_rows([tuple(r) for r in srows], scols)
            on = _norm_rows(orows, ocols)
            if sn != on:
                diff = next(
                    (i, a, b) for i, (a, b) in enumerate(zip(sn, on)) if a != b
                )
                problems.append(f"values differ at sorted-row {diff[0]}:\n  spark  {diff[1]}\n  oracle {diff[2]}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
