"""Incremental multi-granularity time rollup (siddhi ``define aggregation``).

Siddhi-core's incremental aggregation (``define aggregation A from S select
sum(x) ... aggregate by ts every seconds...years``) maintains one aggregate
table per time granularity and answers range queries from the coarsest
granularity that covers them. The reference inherits this surface from
siddhi-core (SURVEY.md §2.5); tests of the cdc source feed such aggregations
downstream.

Two Spark-first restatements, picked by use:

- ``rollup_single_pass`` (batch): each row explodes into its (granularity,
  bucket) pairs and ONE ``groupBy`` aggregates them all. Map-side partial
  aggregation collapses every task's rows to its distinct (key, granularity,
  bucket) groups **before** the only shuffle, so the exchange carries
  near-zero bytes and the raw data is scanned exactly once. This is the
  right plan for a one-shot query at 100 TB.
- ``incremental_rollup`` (materialization): the raw data is aggregated once
  at the finest granularity, and every coarser level re-aggregates the
  *previous level's partials* — sum of sums, min of mins, ... — mirroring
  siddhi's IncrementalExecutor chain (second→minute→hour executors). The
  finest level is persisted so union branches don't rescan the input; this
  is the shape you materialize per micro-batch and re-aggregate coarser
  tiers from, not the one-shot batch plan.

Determinism: sums run over ``decimal(18,2)`` casts (exact, associative ⇒
partition-order independent and equal to a direct one-shot aggregation at
every granularity, which is what the DuckDB oracle computes); min/max/count
are exact on the raw values.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check_granularities(granularities: Sequence[int]) -> list[int]:
    gs = sorted(int(g) for g in granularities)
    if not gs or gs[0] <= 0:
        raise ValueError(f"granularities must be positive, got {granularities!r}")
    for fine, coarse in zip(gs, gs[1:]):
        if coarse % fine != 0:
            raise ValueError(
                f"each granularity must divide the next (got {fine} -> {coarse}); "
                "otherwise coarse buckets are not unions of fine ones"
            )
    return gs


_OUT_COLS = ("sum_value", "n_events", "min_value", "max_value")


def rollup_single_pass(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    value_col: str,
    granularities: Sequence[int] = (60, 3600, 86400),
) -> DataFrame:
    """One-shot multi-granularity rollup: one scan, one shuffle.

    Each row is exploded into its (granularity_sec, bucket_start) pairs and
    a single ``groupBy`` aggregates all tiers. Partial (map-side)
    aggregation reduces each task to its distinct groups before the
    exchange, so the shuffle volume is O(groups), not O(rows × tiers).
    """
    gs = _check_granularities(granularities)
    keys = list(keys)
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).cast("int").alias("granularity_sec"),
                (F.floor(F.col(time_col) / g) * g).cast("long").alias("bucket_start"),
            )
            for g in gs
        ]
    )
    return (
        df.select(*keys, F.explode(pairs).alias("__gb"), value_col)
        .groupBy(*keys, F.col("__gb.granularity_sec").alias("granularity_sec"),
                 F.col("__gb.bucket_start").alias("bucket_start"))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def incremental_rollup(
    df: DataFrame,
    time_col: str,
    keys: Sequence[str],
    value_col: str,
    granularities: Sequence[int] = (60, 3600, 86400),
) -> DataFrame:
    """Aggregate ``value_col`` per ``keys`` at every time granularity.

    ``time_col`` is integer seconds (epoch-style). ``granularities`` are
    bucket widths in seconds, finest first; each must divide the next so
    coarser buckets are exact unions of finer ones (the property siddhi's
    incremental chain relies on).

    Returns one row per (keys, granularity_sec, bucket_start) with
    ``sum_value`` / ``n_events`` / ``min_value`` / ``max_value``. The
    finest level is persisted (it is the expensive one — the only full-data
    shuffle); coarser tiers and the final union re-aggregate it without
    rescanning the input.
    """
    gs = _check_granularities(granularities)
    keys = list(keys)

    def bucket(col: str, width: int) -> F.Column:
        return (F.floor(F.col(col) / width) * width).cast("long").alias("bucket_start")

    cur = (
        df.groupBy(*keys, bucket(time_col, gs[0]))
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__sum"),
            F.count(F.lit(1)).alias("__cnt"),
            F.min(value_col).alias("__min"),
            F.max(value_col).alias("__max"),
        )
        # Every union branch and every coarser tier descends from this frame;
        # without the persist each branch would rescan and re-aggregate the
        # raw input (AQE does not reuse these stages statically).
        .persist()
    )
    levels = [cur.withColumn("granularity_sec", F.lit(gs[0]).cast("int"))]
    for g in gs[1:]:
        # Re-aggregate the FINER level's partials — never the raw data again.
        cur = (
            cur.groupBy(*keys, bucket("bucket_start", g))
            .agg(
                F.sum("__sum").alias("__sum"),
                F.sum("__cnt").alias("__cnt"),
                F.min("__min").alias("__min"),
                F.max("__max").alias("__max"),
            )
        )
        levels.append(cur.withColumn("granularity_sec", F.lit(g).cast("int")))

    out = reduce(DataFrame.unionByName, levels)
    return out.select(
        *keys,
        "granularity_sec",
        "bucket_start",
        F.col("__sum").cast("double").alias("sum_value"),
        F.col("__cnt").alias("n_events"),
        F.col("__min").alias("min_value"),
        F.col("__max").alias("max_value"),
    )
