"""Incremental IVF-index maintenance under CDC.

``functions/similarity.py:write_ivf_index`` materializes the 100 TB ANN
layout (vectors cell-PARTITIONED so probes are partition-pruned scans); this
module keeps that layout CURRENT under a CDC changelog without rebuilding
it — the operator a production RAG/ANN pipeline over CDC actually needs.
Composes the two existing patterns:

- the cell-partitioned layout + codebook of ``write_ivf_index`` (the probe
  contract: ``probe_ivf_index`` results must be identical to a fresh
  rebuild over the current table state — pinned by
  ``tests/test_ivf_maintenance.py``);
- the partition-pruned merge of ``operators/mutate.py:
  merge_into_bucketed_parquet`` (read only touched partitions, stage, swap
  via dynamic partition overwrite, clear emptied partitions), with one
  IVF-specific twist: the partition key is SEMANTIC — ``cell =
  ivf_assign(embedding)`` — so an update can MOVE a row between
  partitions. The touched set is therefore cells of the AFTER images plus
  cells of the BEFORE images (update/delete), which is why the changelog
  must carry ``before_<vec_col>`` for update/delete ops: without the old
  vector the row's current cell is unknowable and correctness would
  require an O(index) scan. The flatten operator's update projection
  (``operators/flatten.py``) provides exactly that column.

Cost per micro-batch: O(touched cells) read + rewrite, never O(index).
Replay-idempotent by construction (per-cell content is a pure function of
{old rows not in batch} ∪ {batch's latest upserts}; re-applying a batch —
even after a crash that committed only SOME touched cells — converges to
the same state), plus a per-``batch_id`` marker to skip clean re-runs.
All filesystem metadata ops go through the Hadoop FileSystem API, so the
index can live on s3a:// / hdfs:// as well as local paths.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.similarity import (
    _hadoop_read_text,
    _hadoop_write_text,
    ivf_assign,
)
from siddhi_io_cdc_spark.operators.mutate import apply_changelog

CELL_COL = "cell"


def _fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _hadoop_exists(spark, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return fs.exists(hpath)


def _hadoop_delete(spark, path: str) -> None:
    fs, hpath, _ = _fs(spark, path)
    fs.delete(hpath, True)


def _hadoop_list_dirs(spark, path: str) -> list[str]:
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [
        s.getPath().getName()
        for s in fs.listStatus(hpath)
        if s.isDirectory()
    ]


def _marker_path(index_path: str, batch_id) -> str:
    return index_path.rstrip("/") + f"/_batches/{batch_id}"


def load_codebook(spark, index_path: str):
    """The centroid matrix a :func:`...similarity.write_ivf_index` layout
    was built with (list of lists of float)."""
    return json.loads(
        _hadoop_read_text(spark, index_path.rstrip("/") + "/_ivf_centroids.json")
    )


def apply_changelog_ivf(
    spark,
    index_path: str,
    batch_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seq_col: str = "ts_ms",
    op_col: str = "operation",
    batch_id=None,
) -> None:
    """Apply one micro-batch of flattened CDC events to an IVF index.

    ``batch_df`` is multi-op flatten output: row image (including
    ``vec_col``) + ``op_col`` ('insert'/'update'/'delete'/'read') +
    ``seq_col``, with ``before_<vec_col>`` present on update/delete rows
    (required — see module docstring; 'read' snapshot rows upsert like
    inserts). Per key, only the latest event by ``seq_col`` decides the
    final state (``apply_changelog`` semantics). The index's codebook is
    NOT retrained — cells keep their meaning, which is what makes the
    touched-cell bound sound; retrain + ``write_ivf_index`` rebuild when
    drift warrants it.
    """
    if batch_id is not None and _hadoop_exists(spark, _marker_path(index_path, batch_id)):
        return
    centroids = load_codebook(spark, index_path)
    before_vec = f"before_{vec_col}"
    has_old_image = before_vec in batch_df.columns
    moving_ops = ("update", "delete")
    if not has_old_image:
        n_moving = (
            batch_df.where(F.col(op_col).isin(*moving_ops)).limit(1).count()
        )
        if n_moving:
            raise ValueError(
                f"batch contains {moving_ops} ops but no '{before_vec}' column: "
                "the old vector's cell is unknowable without the before image, "
                "and bounding the rewrite to touched cells requires it. Flatten "
                "the stream with the update projection (before_ prefix)."
            )

    # Touched cells: after-image cells (anything upserted) + before-image
    # cells (rows leaving a cell via update-move or delete). <= 2*nlist
    # small ints — a driver-safe collect, same pattern as the merge store.
    after_cells = (
        batch_df.where(F.col(op_col) != "delete")
        .select(ivf_assign(F.col(vec_col), centroids).alias("c"))
    )
    cells = after_cells
    if has_old_image:
        old_cells = (
            batch_df.where(F.col(op_col).isin(*moving_ops))
            .where(F.col(before_vec).isNotNull())
            .select(ivf_assign(F.col(before_vec), centroids).alias("c"))
        )
        cells = cells.unionByName(old_cells)
    touched = [r[0] for r in cells.distinct().collect() if r[0] is not None]
    if not touched:
        if batch_id is not None:
            _hadoop_write_text(spark, _marker_path(index_path, batch_id), "done")
        return

    target = (
        spark.read.parquet(index_path)
        .where(F.col(CELL_COL).isin(touched))  # partition-pruned read
        .drop(CELL_COL)
    )
    merged = apply_changelog(
        target, batch_df, key=[id_col], seq_col=seq_col, op_col=op_col
    )
    merged_cells = merged.withColumn(CELL_COL, ivf_assign(F.col(vec_col), centroids))

    # Stage first: the merged plan lazily reads the very files the dynamic
    # overwrite replaces (self-overwrite), same as the bucketed merge store.
    staging = index_path.rstrip("/") + ".stage-" + uuid.uuid4().hex
    merged_cells.write.partitionBy(CELL_COL).parquet(staging)
    try:
        present = {
            int(d.split("=", 1)[1])
            for d in _hadoop_list_dirs(spark, staging)
            if d.startswith(CELL_COL + "=")
        }
        if present:
            (
                spark.read.parquet(staging)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(CELL_COL)
                .parquet(index_path)
            )
        # Dynamic overwrite cannot write an EMPTY partition: a cell whose
        # rows were all deleted keeps its stale files — drop the directory.
        for c in set(touched) - present:
            _hadoop_delete(spark, index_path.rstrip("/") + f"/{CELL_COL}={c}")
    finally:
        _hadoop_delete(spark, staging)
    if batch_id is not None:
        _hadoop_write_text(spark, _marker_path(index_path, batch_id), "done")


def foreach_batch_ivf_index(
    spark,
    index_path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seq_col: str = "ts_ms",
    op_col: str = "operation",
):
    """``foreachBatch`` adapter: stream flattened CDC events into a
    maintained IVF index. Usage::

        flat.writeStream.foreachBatch(
            foreach_batch_ivf_index(spark, "/path/to/index")
        ).option("checkpointLocation", ...).start()

    Exactly-once per ``batch_id`` via the marker file; crash-and-replay of
    a half-committed batch converges (see module docstring)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_changelog_ivf(
            spark,
            index_path,
            batch_df,
            vec_col=vec_col,
            id_col=id_col,
            seq_col=seq_col,
            op_col=op_col,
            batch_id=batch_id,
        )

    return _apply
