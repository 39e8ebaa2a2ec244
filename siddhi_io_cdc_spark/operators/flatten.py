"""Event-shaping operators: op filter, before_/after flattening, coercions.

Re-expresses SURVEY.md §2.2 (E1-E9, E13) as pure DataFrame transformations —
every expression is JVM-side (whole-stage codegen), no Python in the row path,
so the same code holds at 100 TB.

Semantic contract (reference ``listening/RdbmsChangeDataCapture.java``):

- single requested operation:
    insert  → ``after.*``                                        (:146-153)
    update  → ``after.*`` + ``before.<c>`` as ``before_<c>``     (:169-190)
    delete  → ``before.<c>`` as ``before_<c>``                   (:154-167)
- multiple requested operations (the ``trp:operation`` path, :65-131): every
  event carries BOTH current and ``before_`` columns; images a given op does
  not have are filled with type-driven defaults (string → "", boolean →
  false, float → 0.0, other → 0; ``ChangeDataCapture.java:172-184``).
- events whose op is not in the requested list are dropped (E1, :132-137).
- metadata columns ``operation``/``source_ts_ms``/``ts_ms`` stand in for the
  reference's transport properties (:71-74,141-144).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.sources.envelope import OP_NAMES

#: "snapshot" (Debezium op 'r', initial-sync reads) is a Spark-first
#: extension: the reference DROPS 'r' records with a log line
#: (RdbmsChangeDataCapture.java:128-131 default branch; constant defined at
#: CDCSourceConstants.java:65 but never matched). Consuming the snapshot is
#: how a 100 TB bootstrap load arrives, so we accept it as an insert-shaped
#: op when explicitly requested.
_VALID_OPS = ("insert", "update", "delete", "snapshot")
BEFORE_PREFIX = "before_"  # util/CDCSourceConstants.java:58


def type_default(dtype: T.DataType) -> Column:
    """Type-driven default for an absent row image.

    Mirrors ``listening/ChangeDataCapture.java:172-184``: string → "",
    boolean → false, float/double → 0.0, anything else → 0.
    """
    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return F.lit(0.0).cast(dtype)
    if isinstance(dtype, (T.DecimalType,)):
        return F.lit(0).cast(dtype)
    if isinstance(dtype, (T.TimestampType, T.DateType, T.TimestampNTZType)):
        # The reference never captures temporal columns as such (Debezium
        # serializes them to epoch ints); for native Spark types NULL-safe
        # zero has no meaning, so default to epoch 0 for parity with "0".
        return F.lit(0).cast("long").cast(dtype)
    if isinstance(dtype, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)):
        # No "zero" exists for container/binary columns (the reference's
        # type ladder predates them — Siddhi attributes are scalars only);
        # casting 0 is an AnalysisException, so absent images stay NULL.
        return F.lit(None).cast(dtype)
    return F.lit(0).cast(dtype)


def _row_schema(df: DataFrame) -> T.StructType:
    for name in ("after", "before"):
        f = df.schema[name].dataType
        if isinstance(f, T.StructType):
            return f
    raise ValueError("envelope DataFrame needs struct 'after' or 'before' column")


def _validate_ops(operations: Sequence[str]) -> list[str]:
    ops = [o.strip().lower() for o in operations]
    bad = [o for o in ops if o not in _VALID_OPS]
    if bad:
        # Mirrors validation at CDCSource.java:791-796.
        raise ValueError(f"unsupported operation(s) {bad}; expected subset of {_VALID_OPS}")
    if not ops:
        raise ValueError("operations must be non-empty")
    return ops


def flatten(
    df: DataFrame,
    operations: Sequence[str] = ("insert",),
    include_metadata: bool | None = None,
    compat_int_widening: bool = True,
    compat_decimal: bool = False,
) -> DataFrame:
    """Flatten a Debezium-envelope DataFrame into the reference's event shape.

    ``operations`` is the user's requested op list (reference param
    ``operation``, CDCSource.java:175-180). ``include_metadata`` controls the
    ``operation``/``source_ts_ms``/``ts_ms`` columns; default: on for
    multi-op (where the reference exposes ``trp:operation``), off for
    single-op.

    ``compat_decimal`` (E6) replays the reference's lossy
    ``VariableScaleDecimal`` collapse (RdbmsChangeDataCapture.java:199-211):
    decimal columns with scale ≤ 0 become ``long``, others ``double``. The
    reference decides per-VALUE (Java objects in a map); a typed column must
    decide per-COLUMN, so we use the declared scale — documented divergence.
    Default (False) keeps native ``DecimalType``, which is simply correct.

    Works identically on batch and streaming DataFrames (narrow ops only —
    no shuffle, fully pushdown-friendly).
    """
    ops = _validate_ops(operations)
    multi = len(ops) > 1
    if include_metadata is None:
        include_metadata = multi

    row_schema = _row_schema(df)
    if include_metadata:
        clash = [n for n in ("operation", "source_ts_ms", "ts_ms") if n in row_schema.fieldNames()]
        if clash:
            raise ValueError(
                f"row schema columns {clash} collide with CDC metadata columns; "
                "rename them or pass include_metadata=False"
            )
    op_codes = [OP_NAMES[o] for o in ops]
    out = df.filter(F.col("op").isin(op_codes))  # E1

    def widen(c: Column, dtype: T.DataType) -> Column:
        # E7: Short/Byte → int (RdbmsChangeDataCapture.java:212-218).
        if compat_int_widening and isinstance(dtype, (T.ShortType, T.ByteType)):
            return c.cast("int")
        # E6 compat: decimal → long (scale ≤ 0) / double (scale > 0).
        if compat_decimal and isinstance(dtype, T.DecimalType):
            return c.cast("long") if dtype.scale <= 0 else c.cast("double")
        return c

    cols: list[Column] = []
    if multi:
        # E2/E3/E4 multi-op: both images; defaults only when the WHOLE image
        # is absent for that op (reference applies getDefaultValue per-image,
        # never per-field: RdbmsChangeDataCapture.java:69-84,110-126 — a NULL
        # field inside a present image stays NULL).
        for f in row_schema.fields:
            after_c = F.when(F.col("after").isNull(), type_default(f.dataType)).otherwise(
                F.col(f"after.{f.name}")
            )
            cols.append(widen(after_c, f.dataType).alias(f.name))
        for f in row_schema.fields:
            before_c = F.when(F.col("before").isNull(), type_default(f.dataType)).otherwise(
                F.col(f"before.{f.name}")
            )
            cols.append(widen(before_c, f.dataType).alias(f"{BEFORE_PREFIX}{f.name}"))
    else:
        (op,) = ops
        if op in ("insert", "snapshot"):  # snapshot = insert-shaped (after.*)
            cols = [widen(F.col(f"after.{f.name}"), f.dataType).alias(f.name) for f in row_schema.fields]
        elif op == "update":
            cols = [widen(F.col(f"after.{f.name}"), f.dataType).alias(f.name) for f in row_schema.fields] + [
                widen(F.col(f"before.{f.name}"), f.dataType).alias(f"{BEFORE_PREFIX}{f.name}")
                for f in row_schema.fields
            ]
        else:  # delete
            cols = [
                widen(F.col(f"before.{f.name}"), f.dataType).alias(f"{BEFORE_PREFIX}{f.name}")
                for f in row_schema.fields
            ]

    if include_metadata:
        # E9: transport properties → ordinary columns.
        operation_col = F.col("op")
        for code, name in (("c", "insert"), ("u", "update"), ("d", "delete"), ("r", "snapshot")):
            operation_col = F.when(F.col("op") == code, F.lit(name)).otherwise(operation_col)
        cols = cols + [
            operation_col.alias("operation"),
            F.col("source.ts_ms").alias("source_ts_ms"),
            F.col("ts_ms").alias("ts_ms"),
        ]

    return out.select(*cols)


def ordered_within_partitions(df: DataFrame, key: str | Sequence[str], order_col: str = "ts_ms") -> DataFrame:
    """Per-key event ordering inside each partition.

    The reference delivers events in strict per-source order from a single
    thread (CDCSource.java:436; per-row offset bump
    DefaultPollingStrategy.java:155). Spark parallelizes within a micro-batch,
    so the engine-level guarantee becomes: co-locate each key's events
    (``repartition(key)``) and sort within the partition by the event
    sequence — downstream ``foreachBatch``/``mapInPandas`` consumers then see
    each key's events in order without any global (driver-side) sort. This is
    the documented semantic difference from the reference (SURVEY.md §4);
    global total order would serialize the cluster and is deliberately not
    offered.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(*keys, order_col)


def lowercase_columns(df: DataFrame) -> DataFrame:
    """E8: polling-mode events lowercase all column names
    (``polling/strategies/DefaultPollingStrategy.java:147-156``)."""
    return df.toDF(*[c.lower() for c in df.columns])


def schema_map(df: DataFrame, mapping: dict[str, str] | None = None, columns: Sequence[str] | None = None) -> DataFrame:
    """E13: keyvalue mapping with optional attribute renaming.

    ``mapping`` is ``{stream_attribute: event_key}`` — the Spark restatement
    of ``@map(type='keyvalue', @attributes(attr='key', ...))``
    (usage: TestCaseOfCDCPollingMode.java:323-324). ``columns`` without a
    mapping selects by identical names (default keyvalue behavior: match by
    name, drop the rest).
    """
    if mapping:
        return df.select(*[F.col(src).alias(dst) for dst, src in mapping.items()])
    if columns:
        return df.select(*columns)
    return df
