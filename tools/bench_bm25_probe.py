"""Split BM25 bench: index BUILD vs serving PROBE, timed separately.

The round-9 scale-series row for ``llm_bm25_probe`` timed both (the
contract query rebuilds the index so the driver oracle-checks the whole
serving path), which made the probe look like it scales with corpus size
(4.4x at 20x data). This tool benches the two honestly:

- **build**: ``write_bm25_index`` over the sf documents table (one-time,
  corpus-sized — the maintenance cost, amortized by the CDC applier in
  production).
- **probe**: ``bm25_topk_indexed`` against the PRE-BUILT index (the
  serving cost a query actually pays — partition-pruned postings read,
  <= |query_terms| driver rows, ~flat in corpus size).

Usage: python tools/bench_bm25_probe.py --sf /root/testdata/sf0.1
Prints one JSON line {"sf_dir": ..., "build_sec": ..., "probe": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from siddhi_io_cdc_spark.streaming.bm25_index import (
        bm25_topk_indexed,
        write_bm25_index,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(args.sf.rstrip("/") + "/documents.parquet")
    idx = f"/tmp/bm25_bench_idx_{os.getpid()}"

    t0 = time.monotonic()
    write_bm25_index(spark, docs, idx)
    build = time.monotonic() - t0

    def probe() -> float:
        t = time.monotonic()
        bm25_topk_indexed(
            spark, idx, ["spark", "shuffle", "vector"], k=10
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t

    cold = probe()
    steady = min(probe(), probe(), probe())
    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "build_sec": round(build, 3),
                "probe": {"cold": round(cold, 3), "steady": round(steady, 3)},
            }
        )
    )
    spark.stop()
    shutil.rmtree(idx, ignore_errors=True)


if __name__ == "__main__":
    main()
