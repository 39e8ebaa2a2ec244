"""Mutating query surface: stream→table insert / update-on / delete-on.

The reference's tests drive three siddhi-core constructs against an RDBMS
store (SURVEY.md §2.4):

- Q1 ``from S select * insert into T``        (TestCaseOfCDCListeningMode.java:95-97)
- Q3 ``update T ... on T.id == id``           (:275-277)
- Q4 ``delete T on T.id == id and ...``       (:179-181)

Spark-first restatement: the *logic* is a keyed merge expressed as DataFrame
joins (anti-join + union — Catalyst broadcasts the small change-set side
automatically, so the target table is never shuffled); the *storage* is
pluggable. Here we ship a parquet-directory implementation (atomic
swap-on-write) because this container has no Delta/Iceberg; on a real
lakehouse the same plan feeds ``DeltaTable.merge`` / ``MERGE INTO`` and the
physical commit becomes transactional. Streaming entry points wrap the batch
logic in ``foreachBatch`` — replay-idempotent because the merge is keyed.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def insert_into(target: DataFrame, source: DataFrame) -> DataFrame:
    """Q1: append stream rows to the table (column-aligned union)."""
    return target.unionByName(source.select(*target.columns))


def update_on(
    target: DataFrame,
    source: DataFrame,
    on: Sequence[str],
    set_exprs: dict[str, str] | None = None,
) -> DataFrame:
    """Q3: ``update T set T.x = x, ... on T.k == k``.

    Rows of ``target`` whose key matches a ``source`` row get the source's
    values for ``set_exprs`` keys (default: every shared non-key column).
    Unmatched target rows pass through; unmatched source rows are ignored
    (siddhi `update` does not insert).
    """
    keys = list(on)
    if set_exprs is None:
        set_exprs = {c: c for c in source.columns if c in target.columns and c not in keys}
    # Deduplicate the change set per key (last writer wins is resolved by the
    # caller ordering; here any single row per key) to keep the join 1:1.
    # A match FLAG (not coalesce) distinguishes "no matching source row" from
    # "update sets the column to NULL" — siddhi's update writes the given
    # value including NULL (TestCaseOfCDCListeningMode.java:275-277).
    src = source.dropDuplicates(keys).select(
        *keys,
        F.lit(True).alias("__matched"),
        *[F.col(s).alias(f"__new_{t}") for t, s in set_exprs.items()],
    )
    joined = target.join(F.broadcast(src), on=keys, how="left")
    matched = F.col("__matched").eqNullSafe(F.lit(True))
    out_cols: list[Column] = []
    for c in target.columns:
        if c in set_exprs:
            out_cols.append(F.when(matched, F.col(f"__new_{c}")).otherwise(F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def delete_on(target: DataFrame, source: DataFrame, on: Sequence[str]) -> DataFrame:
    """Q4: ``delete T on T.k == k [and T.j == j]`` — keyed anti-join."""
    keys = list(on)
    return target.join(F.broadcast(source.select(*keys).dropDuplicates(keys)), on=keys, how="left_anti")


def apply_changelog(
    target: DataFrame,
    events: DataFrame,
    key: Sequence[str],
    seq_col: str = "ts_ms",
    op_col: str = "operation",
) -> DataFrame:
    """Materialize flattened CDC events onto a table (CDC apply).

    ``events`` is the output of :func:`...operators.flatten` in multi-op form
    (columns = row image + ``operation`` + ``seq_col``). For each key, only the
    LAST event (max ``seq_col``) decides the final state: delete → row gone,
    insert/update → row replaced/added. Unaffected target rows pass through.

    This is the batch-idempotent core that ``foreachBatch`` re-runs safely on
    replay. Scale shape: events ≪ target, so the two joins broadcast the
    change-set; the target scan stays shuffle-free.
    """
    keys = list(key)
    row_cols = target.columns
    w_latest = (
        events.groupBy(*keys)
        .agg(F.max(F.struct(F.col(seq_col), F.col(op_col), *[c for c in row_cols if c not in keys])).alias("__last"))
        .select(*keys, F.col(f"__last.{op_col}").alias("__op"), *[F.col(f"__last.{c}").alias(c) for c in row_cols if c not in keys])
    )
    survivors = target.join(F.broadcast(w_latest.select(*keys)), on=keys, how="left_anti")
    upserts = w_latest.filter(F.col("__op") != F.lit("delete")).select(*row_cols)
    return survivors.unionByName(upserts)


# ---------------------------------------------------------------------------
# Parquet-backed table store (the container has no Delta; swap-on-write keeps
# batch application atomic enough for tests — a lakehouse MERGE replaces this
# wholesale in production).
# ---------------------------------------------------------------------------


def merge_into_parquet(
    spark,
    target_path: str,
    batch_df: DataFrame,
    key: Sequence[str],
    seq_col: str = "ts_ms",
    op_col: str = "operation",
    table_columns: Sequence[str] | None = None,
) -> None:
    """Apply one micro-batch of flattened CDC events to a parquet table.

    Crash-safety: the merged output is written to a SIBLING directory of
    ``target_path`` (same filesystem → both swap steps are atomic renames,
    not copy+delete), and a crash between the two renames is recoverable —
    the next call restores the retained ``.old-`` directory. A missing
    target bootstraps from the batch itself (first ``foreach_batch_merge``
    call against a table that does not exist yet).
    """
    target_path = os.path.abspath(target_path)
    _recover_interrupted_swap(target_path)
    exists = os.path.exists(target_path)
    if not exists:
        if table_columns is None:
            meta = {op_col, seq_col, "operation", "source_ts_ms", "ts_ms"}
            table_columns = [
                c for c in batch_df.columns if c not in meta and not c.startswith("before_")
            ]
        target = spark.createDataFrame([], batch_df.select(*table_columns).schema)
    else:
        target = spark.read.parquet(target_path)
    merged = apply_changelog(target, batch_df, key=key, seq_col=seq_col, op_col=op_col)
    tmp = target_path + ".tmp-" + uuid.uuid4().hex
    merged.write.mode("overwrite").parquet(tmp)
    if exists:
        swap_old = target_path + ".old-" + uuid.uuid4().hex
        os.rename(target_path, swap_old)
        os.rename(tmp, target_path)
        shutil.rmtree(swap_old, ignore_errors=True)
    else:
        os.rename(tmp, target_path)


def _recover_interrupted_swap(target_path: str) -> None:
    """If a crash left ``.old-*`` behind with no live target, restore it."""
    if os.path.exists(target_path):
        return
    parent, base = os.path.split(target_path)
    if not os.path.isdir(parent):
        return
    leftovers = sorted(d for d in os.listdir(parent) if d.startswith(base + ".old-"))
    if leftovers:
        os.rename(os.path.join(parent, leftovers[0]), target_path)
        for d in leftovers[1:]:
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def foreach_batch_merge(spark, target_path: str, key: Sequence[str], seq_col: str = "ts_ms", op_col: str = "operation"):
    """``writeStream.foreachBatch`` adapter for :func:`merge_into_parquet`."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        merge_into_parquet(spark, target_path, batch_df, key=key, seq_col=seq_col, op_col=op_col)

    return _apply
