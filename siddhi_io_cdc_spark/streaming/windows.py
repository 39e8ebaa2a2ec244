"""Window operators: tumbling / sliding / session aggregations plus the
siddhi count- and retention-based windows (length, lengthBatch, timeLength,
unique, sort).

SURVEY.md §2.5 records that the reference has NO streaming windows of its own
(events are delivered one at a time; windowing lives in siddhi-core). In the
Spark re-expression these are first-class: ``F.window`` / ``F.session_window``
group-bys that run identically on batch DataFrames and on Structured
Streaming inputs (add ``withWatermark`` upstream for late-data bounds — see
``tests/test_windows.py`` for the streaming variant).

All three emit ``window_start`` as epoch SECONDS (long) rather than a
timestamp struct so results are engine-portable and hash-stable.

Scale shape: each is a single hash-aggregate — one shuffle on
(key, window), partial aggregation map-side, no Python in the row path.
Sliding windows multiply rows by ``width/step`` inside the *aggregate
input* (Spark expands them in the generated code, not as a materialized
explode). Session windows shuffle on the key and merge sessions inside the
aggregation operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "length_window_agg",
    "length_batch_agg",
    "unique_window",
    "sort_window",
    "time_length_window",
    "delay_window",
]


def _ts(ts_col: str | Column) -> Column:
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return c


def _win_cols(keys: Sequence[str]) -> list[Column]:
    return [F.col(k) for k in keys]


def tumbling_agg(
    df: DataFrame,
    ts_col: str | Column,
    width_seconds: int,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Non-overlapping fixed windows: ``[k*width, (k+1)*width)``."""
    win = F.window(_ts(ts_col), f"{width_seconds} seconds")
    out = df.groupBy(*_win_cols(keys), win.alias("__w")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys, F.col("__w.start").cast("long").alias("window_start"), *aggs.keys()
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str | Column,
    width_seconds: int,
    step_seconds: int,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Overlapping (hopping) windows: starts at every multiple of ``step``;
    each event lands in ``width/step`` windows (windows aligned to the epoch,
    negative starts included — same contract as ``F.window``)."""
    win = F.window(_ts(ts_col), f"{width_seconds} seconds", f"{step_seconds} seconds")
    out = df.groupBy(*_win_cols(keys), win.alias("__w")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys, F.col("__w.start").cast("long").alias("window_start"), *aggs.keys()
    )


def session_agg(
    df: DataFrame,
    ts_col: str | Column,
    gap_seconds: int,
    aggs: dict[str, Column],
    keys: Sequence[str] = (),
) -> DataFrame:
    """Data-driven windows: an event within ``gap`` (INCLUSIVE — verified
    empirically: events at t and t+gap merge) of the session's last event
    extends it; a strictly larger gap starts a new session.

    Emits ``session_start`` (epoch seconds) per key."""
    win = F.session_window(_ts(ts_col), f"{gap_seconds} seconds")
    out = df.groupBy(*_win_cols(keys), win.alias("__w")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys, F.col("__w.start").cast("long").alias("session_start"), *aggs.keys()
    )


def length_window_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    aggs: dict[str, Column],
    length: int,
) -> DataFrame:
    """Siddhi ``window.length(N)``: per event, aggregates over the trailing
    ``N`` events of its key (count-based sliding window).

    ``aggs`` maps output name → aggregate over the window frame (e.g.
    ``F.sum("v")``); each is applied with ``rowsBetween(-(N-1), 0)``. One
    shuffle on the key, then a single sorted pass — the count-window analog
    of a windowed aggregation, oracle-checkable in any SQL engine.
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(length - 1), Window.currentRow)
    )
    out = df
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out


def length_batch_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    aggs: dict[str, Column],
    length: int,
) -> DataFrame:
    """Siddhi ``window.lengthBatch(N)``: tumbling count windows — one output
    row per key per completed-or-final batch of ``N`` consecutive events.

    Events are numbered per key in ``order_col`` order and grouped by
    ``batch_no = (row_number - 1) // N``; one window pass + one hash
    aggregation (both on the same key shuffle).
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    rn = F.row_number().over(Window.partitionBy(*keys).orderBy(order_col))
    staged = df.withColumn("batch_no", ((rn - F.lit(1)) / length).cast("long"))
    return staged.groupBy(*keys, "batch_no").agg(
        *[c.alias(n) for n, c in aggs.items()]
    )


def unique_window(
    df: DataFrame,
    unique_keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Siddhi ``window.unique(key)``: the window holds exactly the LATEST
    event per unique key — a new event for a key expires the old one.

    Batch restatement: the final window content = last event per key in
    ``order_col`` order. One shuffle on the unique key, one ordered pass
    (``row_number() = 1`` descending). ``order_col`` must totally order each
    key's events (an event sequence / offset column) or the result is
    nondeterministic.

    Streaming equivalent: ``df.groupBy(keys).agg(F.max_by(...))`` in update
    mode, or ``applyInPandasWithState`` keeping the latest row — same
    semantics, state bounded by the key cardinality.
    """
    w = Window.partitionBy(*unique_keys).orderBy(F.col(order_col).desc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def first_unique_window(
    df: DataFrame,
    unique_keys: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Siddhi ``window.firstUnique(key)``: the window holds the FIRST event
    per unique key — later events for a seen key are dropped (the dual of
    :func:`unique_window`, FirstUniqueWindowProcessor in siddhi-core 5.1.32).

    Same plan shape: one shuffle on the unique key, one ordered pass with
    ``row_number() = 1`` ascending. Streaming equivalent:
    ``groupBy(keys).agg(F.min_by(...))`` in update mode, or dropDuplicates
    on the key with a watermark.
    """
    w = Window.partitionBy(*unique_keys).orderBy(F.col(order_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def delay_window(
    df: DataFrame,
    ts_col: str,
    delay: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Siddhi ``window.delay(t)``: events become visible ``delay`` time
    units after they occur. Batch restatement of the final window content:
    events already RELEASED at the stream's high-water mark, i.e.
    ``ts <= max(ts) - delay`` (per key when ``keys`` is given, else
    globally), with ``release_ts = ts + delay``.

    Scale shape: keyed → one shuffle (max + filter share it). Global → the
    high-water mark is a single aggregated row joined back by broadcast,
    never a single-partition window over the data.

    Streaming equivalent: a processing-time trigger with
    ``withWatermark(ts, delay)`` + the same filter, or simply a delayed
    trigger — the batch form exists for oracle-checkable parity.
    """
    if delay <= 0:
        raise ValueError(f"delay must be > 0, got {delay}")
    if keys:
        w = Window.partitionBy(*keys)
        return (
            df.withColumn("__mx", F.max(ts_col).over(w))
            .where(F.col(ts_col) <= F.col("__mx") - delay)
            .drop("__mx")
            .withColumn("release_ts", F.col(ts_col) + delay)
        )
    mx = df.agg(F.max(ts_col).alias("__mx"))
    return (
        df.crossJoin(F.broadcast(mx))
        .where(F.col(ts_col) <= F.col("__mx") - delay)
        .drop("__mx")
        .withColumn("release_ts", F.col(ts_col) + delay)
    )


def time_length_window(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    horizon: int,
    length: int,
) -> DataFrame:
    """Siddhi ``window.timeLength(T, N)``: the window holds events no older
    than ``T`` time units (relative to the key's latest event) AND at most
    the ``N`` most recent — whichever bound is tighter.

    Batch restatement of the final window content. One shuffle on the key:
    the per-key max timestamp and the recency rank share the same ordered
    window pass. ``ts_col`` must totally order each key's events for a
    deterministic N-cut (tie-break upstream if timestamps repeat).
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    if horizon <= 0:
        raise ValueError(f"horizon must be > 0, got {horizon}")
    w_key = Window.partitionBy(*keys)
    w_recent = w_key.orderBy(F.col(ts_col).desc())
    return (
        df.withColumn("__mx", F.max(ts_col).over(w_key))
        .withColumn("__rn", F.row_number().over(w_recent))
        .where((F.col(ts_col) > F.col("__mx") - horizon) & (F.col("__rn") <= length))
        .drop("__mx", "__rn")
    )


def sort_window(
    df: DataFrame,
    sort_cols: Sequence[Column],
    length: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Siddhi ``window.sort(N, attr, order)``: the window retains the ``N``
    top events by the sort attribute(s).

    Batch restatement: top-N rows in ``sort_cols`` order, per key when
    ``keys`` is given. ``sort_cols`` must be a TOTAL order (tie-break with a
    unique column) for deterministic output.

    Scale shape: with keys, ``row_number`` over the key shuffle (per-key
    work linear, no global sort). Without keys a global ``orderBy + limit``
    — Spark plans TakeOrdered: each partition keeps its local top-N and only
    N rows per partition reach the driver-side final merge; never a full
    global sort.
    """
    if length < 1:
        raise ValueError(f"length must be >= 1, got {length}")
    cols = list(sort_cols)
    if keys:
        w = Window.partitionBy(*keys).orderBy(*cols)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= length)
            .drop("__rn")
        )
    return df.orderBy(*cols).limit(length)
