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


def parse_kafka_envelope(
    df: DataFrame,
    row_schema: StructType,
    lenient: bool = False,
    drop_tombstones: bool = True,
) -> DataFrame:
    """Turn a Kafka-shaped DataFrame into typed envelope rows.

    ``df`` has the columns ``readStream.format("kafka")`` produces (binary
    ``key``/``value`` + topic/partition/offset metadata); the value payload
    is a Debezium-JSON envelope. This is the production listening path
    (SURVEY.md §7: Debezium Server/Connect → Kafka → Spark): the engine
    itself stays outside Spark, and this parse is the only CDC-specific code
    — one ``from_json`` per record, JVM-side.

    ``lenient=False`` keeps malformed payloads as NULL-op rows (with the raw
    payload in ``_raw_value``) for :func:`split_dead_letter` to route to a
    dead-letter sink (``FAILFAST`` would kill the stream — the reference's
    engine logs-and-continues instead, ChangeDataCapture.java:90);
    ``lenient=True`` silently drops them. Kafka offsets/partitions ride
    along as ``_kafka_*`` metadata columns.

    ``drop_tombstones`` removes Debezium delete-tombstones (records with a
    key but a NULL value, emitted for Kafka log compaction) BEFORE parsing —
    a pushdown-able IS NOT NULL on the binary column, no JSON work spent on
    them. The reference drops them too, just implicitly: a null Connect
    value NPEs in ``createMap`` and the empty map is discarded
    (``RdbmsChangeDataCapture.java:55-59``, ``ChangeDataCapture.java:135``).
    """
    if drop_tombstones:
        df = df.filter(F.col("value").isNotNull())
    env = envelope_schema(row_schema)
    parsed = df.select(
        F.from_json(F.col("value").cast("string"), env).alias("__env"),
        F.col("value").cast("string").alias("_raw_value"),
        F.col("topic").alias("_kafka_topic"),
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
    )
    out = parsed.select(
        "__env.*", "_raw_value", "_kafka_topic", "_kafka_partition", "_kafka_offset"
    )
    if not lenient:
        return out
    return out.filter(F.col("op").isNotNull()).drop("_raw_value")


def split_dead_letter(envelope_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a strict ``parse_kafka_envelope`` result into (good, dead).

    The reference logs-and-continues on unparseable records
    (``ChangeDataCapture.java:90``); the Spark-first equivalent routes them
    to a dead-letter sink instead of losing them. ``good`` drops the raw
    payload (parsed rows don't need it); ``dead`` keeps the raw value plus
    Kafka provenance so the record can be replayed after a fix. Two filters
    over one cached/marked scan — Catalyst handles the shared subplan; no
    shuffle in either branch.
    """
    bad = F.col("op").isNull()
    good = envelope_df.filter(~bad).drop("_raw_value")
    dead = envelope_df.filter(bad).select(
        "_raw_value", "_kafka_topic", "_kafka_partition", "_kafka_offset"
    )
    return good, dead


def parse_kafka_avro_envelope(
    df: DataFrame, avro_schema_json: str, strip_confluent_header: bool = True
) -> DataFrame:
    """Kafka listening path for Avro-serialized Debezium envelopes.

    Debezium deployments with a schema registry ship Avro, not JSON; the
    payload is the same envelope (before/after/source/op/ts_ms), so this is
    ``parse_kafka_envelope`` with ``from_avro`` in place of ``from_json``.
    ``avro_schema_json`` is the writer schema (from the registry's
    ``/schemas`` endpoint — registry HTTP lookup is deliberately out of
    scope; pass the schema explicitly). ``strip_confluent_header`` drops the
    5-byte Confluent wire-format prefix (magic byte + schema id) first.

    Requires the ``spark-avro`` package on the session's classpath (it is
    not bundled with pyspark); without it this raises a clear error at plan
    time rather than an opaque JVM failure.
    """
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover - import shape differs per version
        raise RuntimeError(
            "parse_kafka_avro_envelope needs the spark-avro package "
            "(org.apache.spark:spark-avro_2.13). Start the session with "
            "spark.jars.packages set accordingly."
        ) from e
    payload = F.col("value")
    if strip_confluent_header:
        payload = F.expr("substring(value, 6, length(value) - 5)")
    try:
        parsed = df.select(
            from_avro(payload, avro_schema_json).alias("__env"),
            F.col("topic").alias("_kafka_topic"),
            F.col("partition").alias("_kafka_partition"),
            F.col("offset").alias("_kafka_offset"),
        )
        return parsed.select("__env.*", "_kafka_topic", "_kafka_partition", "_kafka_offset")
    except Exception as e:
        if "AVRO_NOT_LOADED" in str(e):
            raise RuntimeError(
                "the Avro data source is not loaded in this SparkSession; "
                "add org.apache.spark:spark-avro_2.13 via spark.jars.packages"
            ) from e
        raise


def synthetic_changelog(
    df: DataFrame,
    op_col,
    before_exprs: dict[str, object] | None = None,
    source_ts_ms=None,
    ts_ms=None,
) -> DataFrame:
    """Wrap a batch table into envelope rows, deterministically.

    - ``op_col``: Column evaluating to 'c'/'u'/'d' (or 'r' for
      initial-snapshot reads) per row.
    - ``before_exprs``: for 'u'/'d' rows, the before-image columns; any row
      column not listed keeps its current value in the before image.
    - insert/snapshot rows get ``before = NULL``; delete rows get
      ``after = NULL`` (exactly the image layout Debezium produces).

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
        F.when(op.isin("u", "d"), before_struct).alias("before"),
        F.when(op != F.lit("d"), after_struct).alias("after"),
        F.struct(source_ts_ms.cast("long").alias("ts_ms")).alias("source"),
        ts_ms.cast("long").alias("ts_ms"),
    )
