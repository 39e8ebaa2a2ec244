"""CEP pattern operators beyond followed-by (siddhi-core pattern surface).

Siddhi's pattern language (inherited by every siddhi-io-* source, including
the reference — its README routes cdc events into siddhi apps that can use
``from e1=A -> e2=B``, ``not B for t``, ``e[3]`` etc.), re-expressed here:

- **followed-by within** — ``operators.temporal.asof_join`` with a
  tolerance (one shuffle, no explosion);
- **absence** (``A -> not B for t``) — ``absent_pattern``;
- **counting / sequence** (``e[k]``) — ``consecutive_runs``; quantifier
  ranges (``e<m:n>``) — ``match_runs``;
- **logical-AND** (``A and B within t``) — ``both_pattern``;
- **logical-OR** (``e1=A or e2=B``) — ``or_pattern``;
- **strict sequence** (``e1, e2`` immediate) — ``immediate_sequence``;
- consuming ``every A -> B within t`` (streaming state machine) lives in
  ``streaming/stateful.py`` (``followed_by_stream``).

All batch operators are pure Catalyst plans (anti-joins / window
functions) — no UDFs, no driver loops — so they hold at 100 TB: one
hash-partitioned shuffle on the pattern key, per-key work linear in that
key's events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def absent_pattern(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    within: int | float,
) -> DataFrame:
    """``A -> not B for t``: left rows with no right row strictly after them
    within ``within`` time units, per key.

    Implemented as a LEFT ANTI join with the time range folded into the join
    condition: Catalyst plans an equi-join on ``on`` (hash-partitioned both
    sides) with the range as a join filter, and anti-join short-circuits at
    the first match. Strictly-after semantics: a right event at exactly
    ``left_time`` does NOT suppress the left row (siddhi's followed-by is
    strictly later).

    For a heavily skewed pattern key, prefer the as-of restatement
    (``asof_join(..., direction="forward", tolerance=within)`` + null test),
    which processes each key in a single ordered pass.
    """
    keys = list(on)
    # Only the keys and the time survive on the anti side — column pruning at
    # the scan, and no name collisions with left regardless of right's schema.
    r = right.select(*keys, F.col(right_time).alias("__rt"))
    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == r[k])
    cond = cond & (r["__rt"] > left[left_time]) & (r["__rt"] <= left[left_time] + within)
    return left.join(r, cond, "left_anti")


def consecutive_runs(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    flag: Column,
    k: int,
) -> DataFrame:
    """``e[k]``: rows that complete a run of ``k`` immediately-consecutive
    events matching ``flag``, per key, in ``order_col`` order.

    A windowed sum of the flag over the trailing ``k`` rows equals ``k``
    exactly when the current row and its k-1 predecessors all match — the
    standard SQL restatement of siddhi's counting sequence, identical in any
    window-function engine (which is what makes it oracle-checkable).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-(k - 1), Window.currentRow)
    )
    return (
        df.withColumn("__run", F.sum(flag.cast("int")).over(w))
        .where(F.col("__run") == k)
        .drop("__run")
    )


def both_pattern(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    within: int | float,
) -> DataFrame:
    """``A and B within t`` (logical-AND pattern, either order): pairs of
    left/right events per key at most ``within`` apart.

    A plain equi-join on the key with the symmetric time bound as a join
    filter — hash-partitioned both sides, per-key work proportional to the
    matching pairs (which is the OUTPUT, so no wasted explosion).
    """
    keys = list(on)
    r = right.select(*keys, F.col(right_time).alias("__rt"))
    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (left[k] == r[k])
    cond = cond & (F.abs(r["__rt"] - left[left_time]) <= within)
    out = left.join(r, cond, "inner")
    # left[c] disambiguates the shared key columns in the join output.
    return out.select(*[left[c] for c in left.columns], F.col("__rt").alias(right_time))


def immediate_sequence(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    first: Column,
    second: Column,
) -> DataFrame:
    """Siddhi sequence ``e1, e2`` (STRICT succession): rows where the
    current event matches ``second`` and the immediately-preceding event in
    the key's stream matched ``first`` — no events in between, unlike
    followed-by. One lag window, oracle-checkable in any SQL engine.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    return (
        df.withColumn("__prev_ok", F.lag(first.cast("int")).over(w))
        .where((F.col("__prev_ok") == 1) & second)
        .drop("__prev_ok")
    )


def or_pattern(df: DataFrame, first: Column, second: Column) -> DataFrame:
    """Siddhi logical-OR pattern ``e1=A or e2=B``: an event matching either
    branch fires the pattern once; ``matched_branch`` records which branch
    won (``first`` takes precedence when both match, mirroring siddhi's
    left-to-right branch evaluation).

    A single filtered scan with a CASE projection — no union (one scan of
    the input, not two), no shuffle, fully codegen'd.
    """
    return df.where(first | second).withColumn(
        "matched_branch", F.when(first, F.lit("first")).otherwise(F.lit("second"))
    )


def match_runs(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    flag: Column,
    min_count: int,
    max_count: int | None = None,
) -> DataFrame:
    """Siddhi count quantifier ``e<m:n>``: maximal runs of consecutive
    events matching ``flag`` whose length is in ``[min_count, max_count]``
    (``max_count=None`` = unbounded, i.e. ``e<m:>``).

    Gaps-and-islands: number all events per key, number the matching events
    per key, and the difference is constant within a maximal run. Emits one
    row per qualifying run: ``(keys..., run_start, run_end, run_len)``.

    Scale shape: two ``row_number`` passes and the final aggregation all
    share the same key partitioning — ONE shuffle total; per-key work is a
    linear ordered pass. No self-joins, no explosion.
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if max_count is not None and max_count < min_count:
        raise ValueError(f"max_count {max_count} < min_count {min_count}")
    w_all = Window.partitionBy(*keys).orderBy(order_col)
    matched = (
        df.withColumn("__rn", F.row_number().over(w_all))
        .where(flag)
        .withColumn("__isl", F.col("__rn") - F.row_number().over(w_all))
    )
    runs = matched.groupBy(*keys, "__isl").agg(
        F.min(order_col).alias("run_start"),
        F.max(order_col).alias("run_end"),
        F.count(F.lit(1)).alias("run_len"),
    )
    cond = F.col("run_len") >= min_count
    if max_count is not None:
        cond = cond & (F.col("run_len") <= max_count)
    return runs.where(cond).drop("__isl")
