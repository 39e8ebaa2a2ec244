"""Listening-mode resume (T1): the file-source checkpoint restores the
envelope stream with no loss — Spark restatement of the reference's
persist/restore invariant (TestCaseOfCDCPollingMode.java:393-515, applied to
the listening transport), plus per-key ordering (SURVEY.md §4)."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from siddhi_io_cdc_spark.operators import flatten
from siddhi_io_cdc_spark.operators.flatten import ordered_within_partitions
from siddhi_io_cdc_spark.sources.envelope import read_changelog_stream

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.StringType()), T.StructField("name", T.StringType())]
)


def _write_chunk(log_dir, n, events):
    with open(os.path.join(log_dir, f"chunk{n}.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _ev(op, id_, name, ts):
    return {
        "op": op,
        "before": None if op == "c" else {"id": id_, "name": "old"},
        "after": None if op == "d" else {"id": id_, "name": name},
        "source": {"ts_ms": ts},
        "ts_ms": ts,
    }


def test_listening_resume_without_loss(spark, tmp_path):
    log = str(tmp_path / "log")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(log)
    _write_chunk(log, 0, [_ev("c", "e1", "a", 1)])

    def run_once():
        env = read_changelog_stream(spark, log, ROW_SCHEMA)
        flat = flatten(env, operations=["insert", "update"])
        q = (
            flat.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {"e1"}

    # Stream down; two more chunks arrive "while offline"; restart resumes
    # from the checkpoint and delivers exactly the delta.
    _write_chunk(log, 1, [_ev("u", "e1", "b", 2), _ev("c", "e2", "x", 3)])
    _write_chunk(log, 2, [_ev("d", "e1", None, 4)])  # delete: filtered by op list
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # e1 insert + e1 update + e2 insert; no dupes, no loss
    assert {(r["id"], r["name"]) for r in rows} == {("e1", "a"), ("e1", "b"), ("e2", "x")}


def test_ordered_within_partitions_per_key(spark):
    df = spark.createDataFrame(
        [("k1", 3, "c"), ("k2", 1, "x"), ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 2, "y")],
        "id string, ts_ms long, v string",
    )
    ordered = ordered_within_partitions(df, key="id", order_col="ts_ms")

    def per_partition_orders(it):
        seen = {}
        for r in it:
            seen.setdefault(r["id"], []).append(r["v"])
        yield seen

    parts = ordered.rdd.mapPartitions(per_partition_orders).collect()
    merged = {}
    for p in parts:
        for k, vs in p.items():
            assert k not in merged, "key split across partitions"
            merged[k] = vs
    assert merged["k1"] == ["a", "b", "c"]
    assert merged["k2"] == ["x", "y"]
