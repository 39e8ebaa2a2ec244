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
