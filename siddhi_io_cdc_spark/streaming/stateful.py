"""Custom stateful streaming operators (``applyInPandasWithState``).

These cover semantics Spark's built-in windowed aggregations can't express:
running per-key state that must survive across micro-batches and emit an
updated value every batch. Use sparingly — state lives in the executor state
store (checkpointed, partitioned by key), and the per-group function is
Python — but batches arrive as Arrow-backed pandas frames, so the per-row
cost is vectorized pandas, not Python loops.

Scale shape: state is hash-partitioned by key across the cluster (same as a
streaming aggregation); each micro-batch touches only the groups present in
that batch; state size is O(distinct keys) with per-key payload of a few
scalars. The GroupStateTimeout hook is exposed so idle keys can be evicted.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def running_counts(
    stream: DataFrame,
    key_cols: Sequence[str],
    timeout: str = GroupStateTimeout.NoTimeout,
) -> DataFrame:
    """Cumulative event count per key, updated every micro-batch.

    The streaming analog of the reference's per-source event counters
    (``source/metrics/PollingMetrics.java`` keeps similar running tallies in
    process memory — here the state store makes them exactly-once across
    restarts). Output: one row per key per batch with the new total.
    """
    keys = list(key_cols)
    key_fields = [stream.schema[k] for k in keys]
    out_schema = StructType(key_fields + [StructField("n_events", LongType(), False)])
    state_schema = StructType([StructField("n", LongType(), False)])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        seen = sum(len(pdf) for pdf in pdfs)
        (prev,) = state.get if state.exists else (0,)
        total = prev + seen
        state.update((total,))
        yield pd.DataFrame([{**dict(zip(keys, key)), "n_events": total}])

    return stream.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def latest_value(
    stream: DataFrame,
    key_cols: Sequence[str],
    seq_col: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Per-key latest-value tracker (streaming changelog materialization).

    Keeps the row with the highest ``seq_col`` seen so far per key and emits
    it whenever it changes — the streaming core of CDC apply: downstream
    ``foreachBatch`` upserts then see at most one (latest) row per key per
    batch regardless of how many intermediate changes the batch carried.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    out_schema = StructType(
        [stream.schema[k] for k in keys]
        + [stream.schema[seq_col]]
        + [stream.schema[v] for v in vals]
    )
    state_schema = StructType([stream.schema[seq_col]] + [stream.schema[v] for v in vals])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        best = None  # (seq, *values)
        if state.exists:
            best = tuple(state.get)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(seq_col)
            row = pdf.iloc[-1]
            cand = (row[seq_col],) + tuple(row[v] for v in vals)
            if best is None or cand[0] > best[0]:
                best = cand
        if best is None:
            return
        state.update(best)
        yield pd.DataFrame([{**dict(zip(keys, key)), seq_col: best[0],
                             **dict(zip(vals, best[1:]))}])

    return stream.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def followed_by_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    first_col: str,
    second_col: str,
    within: int,
) -> DataFrame:
    """Siddhi pattern ``every e1=A -> e2=B within t`` as a streaming state
    machine (the CEP piece Spark's built-in operators cannot express: the
    match must CONSUME the A event so each A pairs with at most one B).

    ``first_col`` / ``second_col`` are boolean columns marking A and B
    events; ``time_col`` is an integer event-time (same unit as ``within``).
    Emits one row per match: key, ``first_time``, ``second_time``. Pending
    A events ride in the state store (checkpointed, hash-partitioned by
    key) and survive micro-batch boundaries; stale pending state is pruned
    against the key's max seen time. Within a key, events are processed in
    ``time_col`` order inside each batch; cross-batch disorder beyond
    ``within`` is out of contract (run behind the gap-wait source or a
    per-key ordering stage for strict ordering).

    Matching rule (siddhi's ``every``-followed-by): a B event pairs with
    the EARLIEST pending A with ``A.time < B.time <= A.time + within``.
    """
    keys = list(key_cols)
    out_schema = StructType(
        [stream.schema[k] for k in keys]
        + [StructField("first_time", LongType(), False),
           StructField("second_time", LongType(), False)]
    )
    # Pending A times as a comma-joined string: state schemas are flat rows,
    # and the pending set is bounded by `within` after pruning.
    from pyspark.sql.types import StringType

    state_schema = StructType([StructField("pending", StringType(), True)])

    def update(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        pending: list[int] = []
        if state.exists and state.get[0]:
            pending = [int(x) for x in state.get[0].split(",")]
        rows = []
        max_t = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(time_col)
            for t, is_a, is_b in zip(pdf[time_col], pdf[first_col], pdf[second_col]):
                t = int(t)
                max_t = t if max_t is None else max(max_t, t)
                if is_b:
                    for i, a in enumerate(pending):
                        if a < t <= a + within:
                            rows.append((a, t))
                            del pending[i]  # consume: one B per A
                            break
                if is_a:
                    pending.append(t)
        if max_t is not None:
            pending = [a for a in pending if a + within >= max_t]
        state.update((",".join(str(a) for a in sorted(pending)),))
        if rows:
            yield pd.DataFrame(
                [{**dict(zip(keys, key)), "first_time": a, "second_time": b} for a, b in rows]
            )

    return stream.groupBy(*keys).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
