from siddhi_io_cdc_spark.streaming.cep import absent_pattern_stream
from siddhi_io_cdc_spark.streaming.dsir import (
    apply_changelog_dsir,
    dsir_weights_from_state,
    foreach_batch_dsir,
    read_dsir_state,
    write_dsir_state,
)
from siddhi_io_cdc_spark.streaming.dedup import (
    compact_lsh_index,
    foreach_batch_minhash_dedup,
    incremental_embedding_pairs,
    incremental_minhash_pairs,
)
from siddhi_io_cdc_spark.streaming.lifecycle import run_with_restarts
from siddhi_io_cdc_spark.streaming.metrics import CDCMetricsListener
from siddhi_io_cdc_spark.streaming.rollup_sink import (
    foreach_batch_rollup,
    merge_rollup_batch,
    read_rollup,
)
from siddhi_io_cdc_spark.streaming.stateful import (
    followed_by_stream,
    latest_value,
    running_counts,
)
from siddhi_io_cdc_spark.streaming.triggers import cron_run, interval_trigger
from siddhi_io_cdc_spark.streaming.windows import (
    length_batch_agg,
    length_window_agg,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

__all__ = [
    "CDCMetricsListener",
    "absent_pattern_stream",
    "apply_changelog_dsir",
    "cron_run",
    "dsir_weights_from_state",
    "foreach_batch_dsir",
    "read_dsir_state",
    "write_dsir_state",
    "followed_by_stream",
    "compact_lsh_index",
    "foreach_batch_minhash_dedup",
    "foreach_batch_rollup",
    "incremental_embedding_pairs",
    "incremental_minhash_pairs",
    "interval_trigger",
    "length_batch_agg",
    "length_window_agg",
    "merge_rollup_batch",
    "read_rollup",
    "latest_value",
    "run_with_restarts",
    "running_counts",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]
