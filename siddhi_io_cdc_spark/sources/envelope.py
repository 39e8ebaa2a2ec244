"""Debezium-style change-event envelope: schema, generator, stream reader.

The reference's listening mode wraps the Debezium embedded engine and receives
Kafka-Connect ``Struct`` records shaped ``{op, before, after, source.ts_ms,
ts_ms}`` (reference: ``listening/RdbmsChangeDataCapture.java:49-197``,
constants ``util/CDCSourceConstants.java:61-67,101-103``).

In a Spark-first architecture the engine itself runs outside Spark (Debezium
Server / Kafka Connect → a Kafka topic or files); this module gives the
envelope a first-class ``StructType`` plus:

- ``read_changelog_stream`` — a Structured Streaming reader over
  JSON-lines changelog files (the hermetic stand-in for a Kafka topic; swap
  ``format("json")`` for ``format("kafka")`` + ``from_json`` in production —
  the downstream plan is identical).
- ``synthetic_changelog`` — deterministic envelope DataFrame built from any
  batch table, for tests and oracle-checkable flattening queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: Metadata carried out-of-band by the reference as "transport properties"
#: (``trp:operation`` etc., built at RdbmsChangeDataCapture.java:71-74) —
#: idiomatically ordinary columns in Spark.
ENVELOPE_METADATA_FIELDS = ("operation", "source_ts_ms", "ts_ms")

#: Debezium op codes → reference operation names
#: (util/CDCSourceConstants.java:61-65).
OP_CODES = {"c": "insert", "u": "update", "d": "delete", "r": "snapshot"}
OP_NAMES = {v: k for k, v in OP_CODES.items()}


def envelope_schema(row_schema: StructType) -> StructType:
    """The change-event envelope for a table with ``row_schema``.

    Mirrors the Connect value struct consumed at
    ``listening/RdbmsChangeDataCapture.java:49-197``.
    """
    return StructType(
        [
            StructField("op", StringType(), False),
            StructField("before", row_schema, True),
            StructField("after", row_schema, True),
            StructField(
                "source",
                StructType([StructField("ts_ms", LongType(), True)]),
                True,
            ),
            StructField("ts_ms", LongType(), True),
        ]
    )


def read_changelog_stream(
    spark: SparkSession, path: str, row_schema: StructType, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Stream Debezium-envelope JSON-lines files from ``path``.

    Spark's built-in file source handles discovery/offsets/exactly-once; the
    schema is explicit (no schema-history file needed — see SURVEY.md §1.2).
    """
    reader = spark.readStream.schema(envelope_schema(row_schema))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def synthetic_changelog(
    df: DataFrame,
    op_col,
    before_exprs: dict[str, object] | None = None,
    source_ts_ms=None,
    ts_ms=None,
) -> DataFrame:
    """Wrap a batch table into envelope rows, deterministically.

    - ``op_col``: Column evaluating to 'c'/'u'/'d' per row.
    - ``before_exprs``: for 'u'/'d' rows, the before-image columns; any row
      column not listed keeps its current value in the before image.
    - insert rows get ``before = NULL``; delete rows get ``after = NULL``
      (exactly the image layout Debezium produces).

    This is the hermetic stand-in for a live binlog: tests and the DuckDB
    oracle can both derive the same envelope from the same parquet rows.
    """
    cols = df.columns
    before_exprs = dict(before_exprs or {})
    op = op_col if not isinstance(op_col, str) else F.col(op_col)
    after_struct = F.struct(*[F.col(c) for c in cols])
    before_struct = F.struct(
        *[(before_exprs[c] if c in before_exprs else F.col(c)).alias(c) for c in cols]
    )
    if source_ts_ms is None:
        source_ts_ms = F.lit(0).cast("long")
    if ts_ms is None:
        ts_ms = F.lit(0).cast("long")
    return df.select(
        op.alias("op"),
        F.when(op != F.lit("c"), before_struct).alias("before"),
        F.when(op != F.lit("d"), after_struct).alias("after"),
        F.struct(source_ts_ms.cast("long").alias("ts_ms")).alias("source"),
        ts_ms.cast("long").alias("ts_ms"),
    )
