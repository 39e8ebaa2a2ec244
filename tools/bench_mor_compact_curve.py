"""Compaction cost curve for the MOR layout (round-13 VERDICT ask #6).

``mor_compact`` folds the live view into a fresh base — a full rewrite by
construction, amortized across ``compact_every`` batches. This measures
the compaction WALL as a function of the pending-delta count it folds
(8 / 16 / 64 batches of 100 docs at one corpus size), so the amortized
per-batch rewrite cost can be read against the serve-side read-tax curve
already in BENCH_mor_tax_r12.json: pick ``compact_every`` where
(amortized rewrite) + (average read tax paid between compactions) is
minimized for the workload's probe:apply ratio.

Usage: python tools/bench_mor_compact_curve.py [--sf /tmp/sf1]
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
    ap.add_argument("--points", default="8,16,64")
    ap.add_argument(
        "--minor", action="store_true",
        help="also time the size-tiered MINOR fold (delta->delta, no base "
        "rewrite) at each point, before the major fold",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from siddhi_io_cdc_spark.streaming.bm25_index import (
        apply_changelog_bm25,
        compact_bm25_index,
        minor_compact_bm25_index,
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
    n_docs = docs.count()
    mx = int(docs.agg({"doc_id": "max"}).first()[0])

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

    out = {"sf_dir": args.sf, "corpus_docs": n_docs, "points": []}
    bid = 0
    for every in (int(x) for x in args.points.split(",")):
        idx = tempfile.mkdtemp(prefix=f"mor_curve_{every}_")
        # autocompaction off: the sweep times the explicit fold
        write_bm25_index(spark, docs, idx, layout="mor", compact_every=0)
        t_apply = time.monotonic()
        for k in range(every):
            apply_changelog_bm25(spark, idx, ins_batch(1000 * k), batch_id=bid)
            bid += 1
        apply_sec = time.monotonic() - t_apply
        minor_sec = None
        if args.minor:
            t0 = time.monotonic()
            assert minor_compact_bm25_index(spark, idx)
            minor_sec = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        assert compact_bm25_index(spark, idx)
        compact_sec = time.monotonic() - t0
        point = {
            "compact_every": every,
            "pending_folded": every,
            "minor_fold_sec": minor_sec,
            "compact_sec": round(compact_sec, 3),
            "amortized_rewrite_sec_per_batch": round(compact_sec / every, 3),
            "apply_sec_total": round(apply_sec, 3),
            "apply_sec_per_batch": round(apply_sec / every, 3),
        }
        out["points"].append(point)
        print(point, file=sys.stderr, flush=True)
        shutil.rmtree(idx, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
