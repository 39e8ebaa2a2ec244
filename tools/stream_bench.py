"""Capture-path throughput: events/sec through the cdc-poll source.

Measures a full catch-up (startFrom=earliest) of the sf events table through
the real streaming source into a noop-equivalent foreachBatch counter —
the closest analog to the reference's capture-to-delivery path, which it
runs single-threaded (CDCSource.java:436: one executor thread per source).

Usage: PYTHONPATH=/root/repo python tools/stream_bench.py [sf_dir]
Prints one JSON line {"metric": "cdc_poll_catchup_events_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> int:
    from siddhi_io_cdc_spark.session import get_spark
    from siddhi_io_cdc_spark.sources.polling import register_cdc_poll

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    spark = get_spark("cdc-stream-bench", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    register_cdc_poll(spark)

    counts = {"n": 0}

    def count_batch(df, _bid):
        counts["n"] += df.count()

    q = (
        spark.readStream.format("cdc-poll")
        .option("path", f"{SF_DIR}/events.parquet")
        .option("pollingColumn", "event_id")
        .option("startFrom", "earliest")
        .option("numPartitions", str(cpus))
        .option("columns", "event_id,user_id,event_type,value")
        .load()
        .writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", f"/tmp/stream_bench_ck_{time.time_ns()}")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    q.processAllAvailable()
    # Throughput from the query's OWN progress records: batch duration of
    # the data-carrying batches only (excludes session/stream startup, which
    # a long-lived production query amortizes to zero).
    progresses = [
        p if isinstance(p, dict) else json.loads(p.json) for p in q.recentProgress
    ]
    data_batches = [p for p in progresses if p["numInputRows"] > 0]
    q.stop()
    busy_ms = sum(p["durationMs"]["triggerExecution"] for p in data_batches)
    print(
        json.dumps(
            {
                "metric": "cdc_poll_catchup_events_per_sec",
                "value": round(counts["n"] / (busy_ms / 1000.0), 1) if busy_ms else None,
                "unit": "events/sec",
                "events": counts["n"],
                "busy_sec": round(busy_ms / 1000.0, 3),
                "n_batches": len(data_batches),
                "sf_dir": SF_DIR,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
