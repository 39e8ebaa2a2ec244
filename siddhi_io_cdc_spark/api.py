"""Top-level ``cdc`` source facade (S1).

The reference's single extension point is ``@source(type='cdc', mode=...)``
(``CDCSource.java:73-433``): one declaration that validates its options and
dispatches to listening or polling capture. This facade is the Spark
equivalent: one call that validates (T13), applies config overrides (T12),
and returns the right streaming DataFrame:

- ``mode="polling"`` + ``path``  → the ``cdc-poll`` custom DataSource
  (parquet landing zone; resumable offsets, gap-wait, range-split catch-up).
- ``mode="listening"`` + ``path`` → envelope JSON-lines stream (hermetic
  stand-in for a topic) → optional flatten.
- ``mode="listening"`` + ``kafka.bootstrap.servers`` → Kafka reader +
  ``parse_kafka_envelope`` (the production path; requires the Spark Kafka
  connector jar on the cluster).

Returns the RAW stream; compose with ``operators.flatten`` (or pass
``operation=...`` to get flattening applied, mirroring the reference's
``operation`` param).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from siddhi_io_cdc_spark.operators.flatten import flatten
from siddhi_io_cdc_spark.sources.connectors import (
    WrongConfigurationError,
    resolve_config_overrides,
    validate_source_options,
)
from siddhi_io_cdc_spark.sources.envelope import (
    parse_kafka_envelope,
    read_changelog_stream,
)
from siddhi_io_cdc_spark.sources.polling import register_cdc_poll


def cdc_read_stream(
    spark: SparkSession,
    options: dict,
    row_schema: StructType | None = None,
    config_reader: dict | None = None,
) -> DataFrame:
    """Declare a CDC stream the way the reference declares ``@source(cdc)``.

    ``options`` uses the reference's parameter names (``mode``,
    ``table.name``, ``operation``, ``polling.column``, ``polling.interval``,
    ``cron.expression``, ``wait.on.missed.record``,
    ``missed.record.waiting.timeout``, ``connector.properties``, ...) plus
    the Spark-specific ``path`` / ``kafka.bootstrap.servers`` transport
    choices. Validation errors raise before any stream starts.
    """
    opts = validate_source_options(resolve_config_overrides(options, config_reader))
    mode = opts["mode"]
    operations = opts["operation"]

    if mode == "polling":
        if not opts.get("path"):
            raise WrongConfigurationError(
                "polling mode needs option 'path' (parquet landing zone) — for a "
                "live database use sources.jdbc with an external scheduler"
            )
        register_cdc_poll(spark)
        reader = (
            spark.readStream.format("cdc-poll")
            .option("path", opts["path"])
            .option("pollingColumn", opts["polling.column"])
        )
        for src, dst in (
            ("start.from", "startFrom"),
            ("wait.on.missed.record", "waitOnMissedRecord"),
            ("missed.record.waiting.timeout", "missedRecordWaitingTimeout"),
            ("num.partitions", "numPartitions"),
            ("max.keys.per.trigger", "maxKeysPerTrigger"),
            ("order.by.polling.column", "orderByPollingColumn"),
            ("columns", "columns"),
        ):
            if opts.get(src) is not None:
                reader = reader.option(dst, str(opts[src]))
        return reader.load()

    # listening mode
    if row_schema is None:
        raise WrongConfigurationError("listening mode requires row_schema (the stream definition)")
    if opts.get("kafka.bootstrap.servers"):
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", opts["kafka.bootstrap.servers"])
            .option("subscribe", opts.get("topic") or opts["table.name"])
            .load()
        )
        env = parse_kafka_envelope(raw, row_schema).drop(
            "_kafka_topic", "_kafka_partition", "_kafka_offset"
        )
    else:
        if not opts.get("path"):
            raise WrongConfigurationError(
                "listening mode needs 'kafka.bootstrap.servers' or 'path' (JSON-lines changelog)"
            )
        env = read_changelog_stream(spark, opts["path"], row_schema)
    return flatten(env, operations=operations)


def cdc_bootstrap_then_stream(
    spark: SparkSession,
    options: dict,
    config_reader: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Initial-load + change-tail composition for polling mode.

    Returns ``(snapshot, stream)``:

    - ``snapshot`` — a BATCH frame of every row with polling column ≤ the
      high-water mark pinned at call time (the 100 TB initial load: plain
      distributed parquet scan, no streaming machinery in the way);
    - ``stream`` — a ``cdc-poll`` stream seeded at that same mark, so it
      delivers strictly-after rows: no gap and no overlap with the
      snapshot even while rows keep landing during the bootstrap.

    This is the Spark-first equivalent of Debezium's snapshot-then-binlog
    handover (the listening-mode engine does this inside the connector;
    op='r' rows — see ``operators.flatten`` snapshot support).
    """
    opts = validate_source_options(resolve_config_overrides(options, config_reader))
    if opts["mode"] != "polling":
        raise WrongConfigurationError(
            "cdc_bootstrap_then_stream is a polling-mode composition; listening "
            "mode gets its snapshot from the connector (op='r' events)"
        )
    if not opts.get("path"):
        raise WrongConfigurationError("polling mode needs option 'path'")
    path, col = opts["path"], opts["polling.column"]

    from pyspark.sql import functions as F

    hwm_row = spark.read.parquet(path).agg(F.max(col).alias("mx")).collect()[0]
    hwm = hwm_row.mx
    base = spark.read.parquet(path)
    if hwm is None:
        snapshot = base  # empty table: empty snapshot, stream from the start
        stream_opts = {**options, "start.from": "earliest"}
    else:
        snapshot = base.where(F.col(col) <= F.lit(hwm))
        stream_opts = {**options, "start.from": str(int(hwm))}
    return snapshot, cdc_read_stream(spark, stream_opts, config_reader=config_reader)
