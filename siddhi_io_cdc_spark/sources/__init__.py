from siddhi_io_cdc_spark.sources.envelope import (
    ENVELOPE_METADATA_FIELDS,
    envelope_schema,
    read_changelog_stream,
    synthetic_changelog,
)
from siddhi_io_cdc_spark.sources.polling import CDCPollDataSource, register_cdc_poll

__all__ = [
    "ENVELOPE_METADATA_FIELDS",
    "envelope_schema",
    "read_changelog_stream",
    "synthetic_changelog",
    "CDCPollDataSource",
    "register_cdc_poll",
]
