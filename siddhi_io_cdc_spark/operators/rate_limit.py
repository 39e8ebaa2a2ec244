"""Output rate limiting (siddhi ``output [first|last|every] n events`` /
``output snapshot every t sec``).

Siddhi throttles a query's output stream; any siddhi app downstream of the
cdc source can attach these (siddhi-core OutputRateLimiter). The Spark-first
restatement operates per micro-batch (use inside ``foreachBatch``) or on any
batch frame: each variant is a single window-function pass — one shuffle on
the key, no UDFs — so the plan is identical at any scale.

Determinism: every variant takes an explicit unique ``order_col`` so "first"
/"last"/"every nth" are total orders, not tie-broken by partition layout —
which is also what makes them hash-comparable against a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def every_nth_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str, n: int
) -> DataFrame:
    """Emit every ``n``-th event per key (siddhi ``output every n events``).

    Row numbers run in ``order_col`` order within each key; rows where
    ``row_number % n == 0`` are emitted (the n-th, 2n-th, ... events), which
    is when siddhi's count-based limiter fires.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") % n == 0)
        .drop("__rn")
    )


def snapshot_per_window(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    window_sec: int,
    order_col: str,
    first: bool = False,
) -> DataFrame:
    """Latest (default) or first event per key per time bucket.

    Siddhi ``output snapshot every t sec`` emits the current state each
    period; on a batch/micro-batch frame that is the last event per
    (key, bucket). ``first=True`` gives ``output first every`` semantics.
    ``time_col`` is integer seconds; ``order_col`` must be unique per row
    (event id) so the pick is deterministic.
    """
    if window_sec < 1:
        raise ValueError(f"window_sec must be >= 1, got {window_sec}")
    bucket = (F.floor(F.col(time_col) / window_sec) * window_sec).cast("long")
    order = F.col(order_col).asc() if first else F.col(order_col).desc()
    w = Window.partitionBy(*list(keys), "window_start").orderBy(order)
    return (
        df.withColumn("window_start", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def frequent_items(
    df: DataFrame, keys: Sequence[str], item_col: str, k: int
) -> DataFrame:
    """Siddhi ``window.frequent(k)``: the ``k`` most frequent item values
    per key (count desc, item asc on ties — total order, so deterministic).

    Exact two-phase plan: hash-aggregate counts (map-side partials), then a
    rank window over the (small) per-key count table. At 100 TB the count
    table is |keys|x|distinct items|, not |rows| — the heavy lifting stays
    in the partial aggregation. (Siddhi's own implementation is the exact
    Misra-Gries variant; here exactness is free from the aggregation.)
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = df.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("n_occurrences"))
    w = Window.partitionBy(*keys).orderBy(F.col("n_occurrences").desc(), F.col(item_col).asc())
    return (
        counts.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def lossy_frequent_items(
    df: DataFrame, keys: Sequence[str], item_col: str, support: float
) -> DataFrame:
    """Siddhi ``window.lossyFrequent(support)``: item values occurring in at
    least ``support`` fraction of each key's events
    (LossyFrequentWindowProcessor — the reference's window family ships it in
    siddhi-core 5.1.32 alongside ``frequent``).

    Siddhi implements lossy counting (Manku-Motwani) because it must bound
    state on an unbounded stream; a batch/micro-batch restatement gets
    EXACTNESS for free from the same hash-aggregate that powers
    :func:`frequent_items` — counts are exact, so the emitted set is the true
    support-threshold set with zero false positives/negatives (a strict
    upgrade over the streaming approximation, same interface). Returns
    ``(keys…, item, n_occurrences, support_frac)`` with ``support_frac``
    rounded to 6 places for engine-portable comparison.

    Scale shape: ONE scan and one shuffle of map-side-collapsed (key, item)
    partials; per-key totals derive from the count table itself (a window
    sum over |keys|·|distinct items| rows, never |rows|), so the input is
    not read twice.
    """
    if not (0.0 < support <= 1.0):
        raise ValueError(f"support must be in (0, 1], got {support}")
    counts = df.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("n_occurrences"))
    total = F.sum("n_occurrences").over(Window.partitionBy(*keys))
    return (
        counts.withColumn("__total", total)
        .where(F.col("n_occurrences") >= F.col("__total") * support)
        .withColumn(
            "support_frac",
            F.round(F.col("n_occurrences") / F.col("__total"), 6),
        )
        .drop("__total")
    )
