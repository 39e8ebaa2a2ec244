"""End-to-end measurement of the round-13 recommended ingest-dominant MOR
config: ``compact_every=64`` (major folds are corpus-bound — run them
rarely) + ``minor_every=8`` (cheap delta-only folds bound the reader's
delta-union width in between).

Runs a stream of 100-doc insert batches through the bm25 applier with
auto minor folds ON and records (a) the apply wall per batch, (b) the
probe latency sampled every 4 batches, (c) the pending-delta count the
probe actually unioned. The claim under test: pending never exceeds
``minor_every``, so the probe's read tax stays bounded at the fold width
instead of growing toward ``compact_every``.

Usage: python tools/bench_mor_minor_wiring.py [--sf /tmp/sf1] [--batches 24]
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
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--minor-every", type=int, default=8)
    ap.add_argument("--compact-every", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from siddhi_io_cdc_spark.streaming.bm25_index import (
        apply_changelog_bm25,
        bm25_topk_indexed,
        write_bm25_index,
    )
    from siddhi_io_cdc_spark.streaming.mor import mor_pending_seqs

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
    mx = int(docs.agg({"doc_id": "max"}).first()[0])
    terms = ["spark", "shuffle", "vector"]

    def ins_batch(lo: int, n: int = 100):
        base = docs.orderBy("doc_id").limit(n).collect()
        return spark.createDataFrame(
            [
                (mx + 1 + lo + j, r.text[::-1], None, "insert", 100 + j)
                for j, r in enumerate(base)
            ],
            "doc_id LONG, text STRING, before_text STRING, operation STRING,"
            " ts_ms LONG",
        )

    idx = tempfile.mkdtemp(prefix="mor_wiring_")
    write_bm25_index(
        spark, docs, idx, layout="mor",
        compact_every=args.compact_every, minor_every=args.minor_every,
    )

    out = {
        "sf_dir": args.sf,
        "config": {
            "compact_every": args.compact_every,
            "minor_every": args.minor_every,
        },
        "apply_sec": [],
        "probes": [],
        "max_pending_seen": 0,
    }
    for b in range(args.batches):
        batch = ins_batch(1000 * b)
        batch = spark.createDataFrame(batch.collect(), batch.schema)
        t0 = time.monotonic()
        apply_changelog_bm25(spark, idx, batch, batch_id=b)
        out["apply_sec"].append(round(time.monotonic() - t0, 3))
        pend = len(mor_pending_seqs(spark, idx))
        out["max_pending_seen"] = max(out["max_pending_seen"], pend)
        if (b + 1) % 4 == 0:
            runs = []
            for _ in range(3):
                t0 = time.monotonic()
                bm25_topk_indexed(spark, idx, terms, k=10).collect()
                runs.append(time.monotonic() - t0)
            out["probes"].append(
                {"after_batch": b + 1, "pending": pend,
                 "probe_sec": round(min(runs), 3)}
            )
            print(out["probes"][-1], file=sys.stderr, flush=True)

    shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
