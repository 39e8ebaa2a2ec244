"""MOR trade-off curves: serve-side read tax vs pending deltas, and
apply cost vs batch size.

Two numbers complete the round-12 O(batch) story:

1. **Read tax**: the live view unions base with every pending delta and
   anti-joins the tombstones. Probe latency as a function of pending
   delta count (0 / 4 / 8 / 16, then compacted back to 0) quantifies
   what the reader pays between compactions — the measurement behind the
   ``compact_every=16`` default.
2. **Apply vs batch size**: O(batch) means the apply cost should track
   the BATCH (inserts of 100 / 400 / 1600 docs at one corpus size), with
   a fixed per-batch floor (the handful of Spark jobs every apply runs).

Usage:
    python tools/bench_mor_read_tax.py [--sf /tmp/sf1]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.streaming.bm25_index import (
        apply_changelog_bm25,
        bm25_topk_indexed,
        compact_bm25_index,
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
    docs = spark.read.parquet(args.sf.rstrip("/") + "/documents.parquet").select(
        "doc_id", "text"
    )
    mx = docs.agg({"doc_id": "max"}).first()[0]
    terms = ["spark", "shuffle", "vector"]

    def probe_time() -> float:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            bm25_topk_indexed(spark, idx, terms, k=10).collect()
            runs.append(time.monotonic() - t0)
        return round(min(runs), 3)

    def ins_batch(lo: int, n: int):
        base = docs.orderBy("doc_id").limit(n).collect()
        return spark.createDataFrame(
            [
                (int(mx) + 1 + lo + j, r.text[::-1], None, "insert", 100 + j)
                for j, r in enumerate(base)
            ],
            "doc_id LONG, text STRING, before_text STRING, operation STRING,"
            " ts_ms LONG",
        )

    idx = tempfile.mkdtemp(prefix="mor_tax_")
    # compact_every far above the sweep so pending deltas accumulate
    write_bm25_index(spark, docs, idx, layout="mor", compact_every=1000)

    out = {"sf_dir": args.sf, "read_tax": [], "apply_vs_batch": []}
    out["read_tax"].append({"pending": 0, "probe_sec": probe_time()})
    b = 0
    for target in (4, 8, 16):
        while b < target:
            apply_changelog_bm25(spark, idx, ins_batch(100 * b, 100), batch_id=b)
            b += 1
        out["read_tax"].append({"pending": target, "probe_sec": probe_time()})
        print(f"pending={target}: {out['read_tax'][-1]}", file=sys.stderr)
    compact_bm25_index(spark, idx)
    out["read_tax"].append({"pending": "compacted", "probe_sec": probe_time()})

    for size in (100, 400, 1600):
        batch = ins_batch(10_000 + size, size)
        batch = spark.createDataFrame(batch.collect(), batch.schema)
        t0 = time.monotonic()
        apply_changelog_bm25(spark, idx, batch, batch_id=b)
        b += 1
        out["apply_vs_batch"].append(
            {"batch_docs": size, "apply_sec": round(time.monotonic() - t0, 3)}
        )
        print(f"batch={size}: {out['apply_vs_batch'][-1]}", file=sys.stderr)

    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
