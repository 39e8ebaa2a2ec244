"""Temporal joins Spark lacks as built-ins: as-of join and binned range join.

The reference engine (siddhi-io-cdc) delivers change events strictly ordered
per source, and downstream siddhi-core apps join those streams against the
"latest value so far" of another stream — the classic as-of join. Spark has
no asof/range join operator (SURVEY.md §2.5 lists joins as inherited from
siddhi-core / natively covered), so these are the custom-operator additions:
compositions of existing DataFrame ops, no Python in the row path.

Scale notes (the whole point of these implementations):

- ``asof_join`` is the UNION + ordered-window formulation: one shuffle on the
  join keys, one within-partition sort, zero row explosion. The naive
  alternative (`left.join(right, keys + [r.t <= l.t])` + argmax) explodes to
  O(|left| x |right per key|) intermediate rows; this stays O(|left| +
  |right|). Equivalent to pandas ``merge_asof`` / QuestDB ``ASOF JOIN``
  semantics (inclusive match on equal timestamps).
- ``bucketed_range_join`` is the standard interval-binning trick: intervals
  are exploded to the fixed-width buckets they cover, points carry exactly
  one bucket, and the join becomes an equi-join on (bucket) plus a residual
  range filter. Shuffle is O(|points| + |intervals| * avg_buckets_per
  _interval); no cartesian product ever forms. For a small interval side
  prefer ``F.broadcast`` on the exploded intervals — Catalyst/AQE does this
  automatically when it fits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join", "bucketed_range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
) -> DataFrame:
    """For each ``left`` row, attach the closest ``right`` row per key.

    ``backward`` (default): the latest right row with
    ``right_time <= left_time``. ``forward``: the earliest right row with
    ``right_time >= left_time``. Ties on the timestamp match (inclusive),
    like pandas ``merge_asof``. Unmatched left rows keep NULL right columns
    (left-outer semantics). ``tolerance`` (same unit as the time columns)
    drops matches farther than the given distance.

    Implementation: tag and union both sides, then one ordered window per
    key propagates the most recent right payload (packed in a single struct
    so a NULL *field* inside a present right row is preserved, mirroring the
    image-handling rule in operators/flatten.py). One shuffle, no explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in keys and c != right_time]
    bad = [c for c in right_values if c in left.columns]
    if bad:
        raise ValueError(f"right value columns {bad} collide with left columns; alias them first")
    if right_time in left.columns:
        raise ValueError(f"right_time column {right_time!r} collides with a left column; alias it first")

    payload = F.struct(F.col(right_time), *[F.col(c) for c in right_values]).alias("__r")
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    u = r.unionByName(l.select(*r.columns))

    if direction == "backward":
        # Right rows sort before left rows at equal time → inclusive <=.
        w = Window.partitionBy(*keys).orderBy(F.col("__t").asc(), F.col("__side").asc())
    else:
        # Descending traversal; right first at equal time → inclusive >=.
        w = Window.partitionBy(*keys).orderBy(F.col("__t").desc(), F.col("__side").asc())
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).where(F.col("__side") == 1)

    if tolerance is not None:
        dist = (
            F.col("__t") - F.col(f"__m.{right_time}")
            if direction == "backward"
            else F.col(f"__m.{right_time}") - F.col("__t")
        )
        matched = matched.withColumn(
            "__m", F.when(dist <= F.lit(tolerance), F.col("__m"))
        )

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(F.col(f"__m.{right_time}").alias(right_time))
    out_cols.extend(F.col(f"__m.{c}").alias(c) for c in right_values)
    return matched.select(*out_cols)


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows with ``lo <= point <= hi`` — binned.

    Both sides must expose NUMERIC columns (convert dates with
    ``F.datediff`` first). Each interval is exploded to the ``bucket_width``
    -sized buckets it covers; each point lives in exactly one bucket, so
    every qualifying (point, interval) pair meets in exactly one bucket and
    no dedup is needed. ``how='left_intervals'`` keeps empty intervals
    (NULL point columns), for COUNT-per-interval style aggregates.

    Pick ``bucket_width`` ≈ the typical interval length: explosion factor is
    ``len/width + 1`` per interval, and residual-filter selectivity within a
    bucket stays high.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = [c for c in intervals.columns if c in points.columns]
    if clash:
        raise ValueError(f"column collision between sides: {clash}; alias before joining")

    b = F.floor(F.col(point_col) / bucket_width)
    p = points.withColumn("__b", b)
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    joined = p.join(iv, on="__b", how="inner").where(
        F.col(point_col).between(F.col(lo_col), F.col(hi_col))
    )
    out = joined.drop("__b")
    if how == "inner":
        return out
    if how == "left_intervals":
        hit = out.select(*intervals.columns)
        empty = intervals.join(hit.select(*[F.col(c) for c in intervals.columns]).distinct(),
                               on=list(intervals.columns), how="left_anti")
        for c in points.columns:
            empty = empty.withColumn(c, F.lit(None).cast(points.schema[c].dataType))
        return out.unionByName(empty.select(*out.columns))
    raise ValueError(f"how must be 'inner' or 'left_intervals', got {how!r}")
