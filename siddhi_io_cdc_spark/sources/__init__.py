from siddhi_io_cdc_spark.sources.connectors import (
    build_capture_config,
    parse_connection_url,
    resolve_config_overrides,
    validate_source_options,
)
from siddhi_io_cdc_spark.sources.envelope import (
    ENVELOPE_METADATA_FIELDS,
    envelope_schema,
    parse_kafka_avro_envelope,
    parse_kafka_envelope,
    read_changelog_stream,
    synthetic_changelog,
)
from siddhi_io_cdc_spark.sources.polling import CDCPollDataSource, register_cdc_poll

__all__ = [
    "ENVELOPE_METADATA_FIELDS",
    "envelope_schema",
    "parse_kafka_avro_envelope",
    "parse_kafka_envelope",
    "build_capture_config",
    "parse_connection_url",
    "resolve_config_overrides",
    "validate_source_options",
    "read_changelog_stream",
    "synthetic_changelog",
    "CDCPollDataSource",
    "register_cdc_poll",
]
