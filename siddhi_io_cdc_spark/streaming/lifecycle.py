"""Query lifecycle: error callbacks and checkpoint-based restart (T10/T11).

The reference distinguishes retryable connection failures (triggering Siddhi
reconnection) from fatal app errors (``CDCSource.java:651-685``,
``CDCPoller.CompletionCallback`` :214-221). Under Spark the restartable unit
is the whole streaming query: a failed query restarted from its checkpoint
resumes exactly where it stopped (§3.3 → checkpoint mapping), so the retry
policy lives OUTSIDE the query, here.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.errors.exceptions.captured import StreamingQueryException
from pyspark.sql import DataFrame


def exactly_once_dedupe(
    stream: DataFrame,
    identity_cols: list[str],
    event_time_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """At-least-once → effectively-once: drop replayed events by identity.

    The reference commits offsets after every event
    (``ChangeDataCapture.java:88``) to shrink the replay window; Spark
    replays at micro-batch granularity instead, so a non-idempotent sink
    sees duplicates after a crash. Streaming ``dropDuplicates`` on the event
    identity (e.g. ``[polling_column]`` or ``[key, ts_ms]``) closes that
    window; with ``event_time_col`` a watermark bounds the dedup state so it
    doesn't grow forever (state is hash-partitioned by identity across the
    cluster — the 100 TB shape).
    """
    s = stream
    if event_time_col is not None:
        s = s.withWatermark(event_time_col, watermark_delay)
        return s.dropDuplicates([*identity_cols, event_time_col])
    return s.dropDuplicates(list(identity_cols))


def run_with_restarts(
    start_query: Callable[[], "object"],
    max_restarts: int = 3,
    backoff_seconds: float = 1.0,
    on_error: Callable[[Exception, int], None] | None = None,
    is_retryable: Callable[[Exception], bool] | None = None,
    await_seconds: float | None = None,
) -> int:
    """Run a streaming query, restarting it from its checkpoint on failure.

    ``start_query`` builds AND starts the query (it must use a fixed
    ``checkpointLocation`` — that is what makes a restart lossless, mirror of
    TestCaseOfCDCPollingMode.java:393-515). ``on_error`` is the reference's
    completion-callback hook (:214-221); ``is_retryable`` plays the
    ConnectionUnavailable-vs-fatal split (default: everything retryable).
    Returns the number of restarts performed. Exponential backoff between
    attempts; the final failure re-raises.
    """
    restarts = 0
    while True:
        query = start_query()
        try:
            if await_seconds is None:
                query.awaitTermination()
            else:
                query.awaitTermination(await_seconds)
                query.stop()
            return restarts
        except StreamingQueryException as exc:  # query died
            if on_error is not None:
                on_error(exc, restarts)
            if is_retryable is not None and not is_retryable(exc):
                raise
            if restarts >= max_restarts:
                raise
            time.sleep(backoff_seconds * (2**restarts))
            restarts += 1
