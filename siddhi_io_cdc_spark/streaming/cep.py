"""Streaming CEP absence detection (`A -> not B for t` on live streams).

The batch restatement lives in ``operators/cep.py``; this is the
Structured-Streaming form siddhi users actually run: a stream-stream LEFT
OUTER join with an event-time range in the join condition plus watermarks
on both sides. Spark holds each A row in join state until the watermark
passes ``A.time + within`` — at that point either a matching B arrived
(row joined, we drop it) or none did (null-extended row emitted once,
which IS the absence alert). State is bounded by the watermark: O(events
within the horizon), independent of stream length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def absent_pattern_stream(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    within_sec: int,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Alert rows of ``left`` with no ``right`` row strictly inside
    ``(left_time, left_time + within_sec]`` per key, on streaming inputs.

    ``left_time`` / ``right_time`` must be distinct timestamp column names
    (stream-stream joins need unambiguous sides). Emits in append mode;
    an alert appears once the watermark passes its deadline.
    """
    keys = list(on)
    if left_time == right_time:
        raise ValueError("left_time and right_time must have distinct names")
    l = left.withWatermark(left_time, watermark_delay)
    r = right.withWatermark(right_time, watermark_delay)
    # Alias right-side keys to avoid ambiguity; equi-keys keep the join
    # hash-partitioned (state sharded by key, no broadcast of streams).
    r = r.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        right_time,
        F.lit(True).alias("__r_present"),
    )
    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = (
        cond
        & (F.col(right_time) > F.col(left_time))
        & (F.col(right_time) <= F.col(left_time) + F.expr(f"INTERVAL {within_sec} SECONDS"))
    )
    joined = l.join(r, cond, "leftOuter")
    return joined.where(F.col("__r_present").isNull()).select(*left.columns)
