from siddhi_io_cdc_spark.streaming.lifecycle import run_with_restarts
from siddhi_io_cdc_spark.streaming.metrics import CDCMetricsListener
from siddhi_io_cdc_spark.streaming.triggers import cron_run, interval_trigger
from siddhi_io_cdc_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "CDCMetricsListener",
    "cron_run",
    "interval_trigger",
    "run_with_restarts",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
