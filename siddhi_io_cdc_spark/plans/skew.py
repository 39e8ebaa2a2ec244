"""Skew-safe aggregation: two-phase salted groupBy.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles skewed
JOINS at runtime, but a skewed GROUP BY key still funnels one reducer when a
single key dominates (the classic hot-user/hot-document shape in CDC and
training-data pipelines). ``salted_agg`` shards each key across ``salt``
reducers, partially aggregates, then combines — turning one hot partition
into ``salt`` even ones at the cost of a second (tiny) exchange.

Only decomposable aggregates are supported (sum/count/min/max) — exactly the
ones whose partial+final split Spark itself uses for map-side aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """``aggs``: {out_name: (fn, col)} with fn ∈ sum|count|min|max.

    Example::

        salted_agg(events, ["user_id"], {"n": ("count", "*"),
                                         "total": ("sum", "value")}, salt=32)
    """
    bad = [f for f, _ in aggs.values() if f not in _PARTIAL]
    if bad:
        raise ValueError(f"non-decomposable aggregate(s) {bad}; supported: {sorted(_PARTIAL)}")
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _PARTIAL[fn](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[fn](F.col(f"__p_{name}")).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: shard the (large, skewed) ``left`` side across
    ``salt`` sub-keys and REPLICATE each ``right`` row to all of them.

    The hot key's rows land on ``salt`` different reducers instead of one.
    Cost: the right side is shuffled ``salt`` x — use only when right is the
    small side and AQE's runtime skew splitting (on for sort-merge joins)
    isn't available, e.g. when the join must hash-partition for a downstream
    stage. Result is identical to ``left.join(right, on, how)``.

    Supported ``how``: inner / left (replication breaks right-outer
    semantics — each right row appears ``salt`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lsalt = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(k) for k in on], F.monotonically_increasing_id()), F.lit(salt)),
    )
    rsalt = right.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))).withColumnRenamed(
        "__rep", "__salt"
    )
    return lsalt.join(rsalt, on=[*on, "__salt"], how=how).drop("__salt")
