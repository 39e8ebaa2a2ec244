from siddhi_io_cdc_spark.streaming.cep import absent_pattern_stream
from siddhi_io_cdc_spark.streaming.lifecycle import run_with_restarts
from siddhi_io_cdc_spark.streaming.metrics import CDCMetricsListener
from siddhi_io_cdc_spark.streaming.rollup_sink import (
    foreach_batch_rollup,
    merge_rollup_batch,
    read_rollup,
)
from siddhi_io_cdc_spark.streaming.triggers import cron_run, interval_trigger
from siddhi_io_cdc_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "CDCMetricsListener",
    "absent_pattern_stream",
    "cron_run",
    "foreach_batch_rollup",
    "interval_trigger",
    "merge_rollup_batch",
    "read_rollup",
    "run_with_restarts",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
