"""Metrics scoping (T14) and cron one-shot drains (T7).

Cron mirror: TestCaseOfCDCPollingMode.java:102-179 — each firing delivers
exactly the delta since the last firing. Metrics mirror: two concurrent
queries must not corrupt each other's counters (per-query scoping)."""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from siddhi_io_cdc_spark.sources.polling import register_cdc_poll
from siddhi_io_cdc_spark.streaming.metrics import CDCMetricsListener
from siddhi_io_cdc_spark.streaming.triggers import cron_run, interval_trigger


def _append(path, ids):
    pq.write_table(
        pa.table({"id": ids, "v": [f"v{i}" for i in ids]}),
        os.path.join(path, f"part-{time.time_ns()}.parquet"),
    )


def test_cron_one_shot_drains_exact_delta(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    os.makedirs(tbl)
    _append(tbl, [1])  # pre-existing: startFrom=latest skips it
    register_cdc_poll(spark)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def writer():
        return (
            spark.readStream.format("cdc-poll")
            .option("path", tbl)
            .option("pollingColumn", "id")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
        )

    # Firing 1: nothing new since stream start.
    cron_run(writer())
    # Firing 2: rows 2,3 arrived -> exactly that delta.
    _append(tbl, [2, 3])
    cron_run(writer())
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == {2, 3}
    # Firing 3: row 4 only.
    _append(tbl, [4])
    cron_run(writer())
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == {2, 3, 4}


def test_metrics_listener_scoped_per_query(spark, tmp_path):
    t1, t2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    os.makedirs(t1)
    os.makedirs(t2)
    _append(t1, [1])
    _append(t2, [1])
    register_cdc_poll(spark)

    m1 = CDCMetricsListener(query_name="cdc_q1")
    m_all = CDCMetricsListener()
    spark.streams.addListener(m1)
    spark.streams.addListener(m_all)
    try:
        def start(path, name, n):
            return (
                spark.readStream.format("cdc-poll")
                .option("path", path)
                .option("pollingColumn", "id")
                .option("startFrom", "earliest")
                .load()
                .writeStream.format("memory")
                .queryName(name)
                .option("checkpointLocation", str(tmp_path / f"ck{n}"))
                .trigger(**interval_trigger(0.2))
                .start()
            )

        q1 = start(t1, "cdc_q1", 1)
        q2 = start(t2, "cdc_q2", 2)
        _append(t2, [2, 3, 4, 5, 6])  # 5 extra rows flow ONLY through q2
        q1.processAllAvailable()
        q2.processAllAvailable()
        deadline = time.time() + 30
        while time.time() < deadline and m_all.total_reads < 7:
            time.sleep(0.5)
        q1.stop()
        q2.stop()
        # q1 saw exactly its one row; the unscoped listener saw both queries.
        assert m1.total_reads == 1, m1.snapshot()
        assert m_all.total_reads >= 7, m_all.snapshot()
        assert m1.error_count == 0
    finally:
        spark.streams.removeListener(m1)
        spark.streams.removeListener(m_all)
