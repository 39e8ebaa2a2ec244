"""SemDeDup PQ-ADC prefilter crossover measurement.

VERDICT r7 #3 done-condition: a measured point with >= 10x the contract
fixture's candidate-pair volume showing where the ADC prefilter beats the
exact per-pair interpreted-HOF dot (~9 us/pair across 32 cores).

Method: embeddings at the given sf dir (default the make_scale sf2
replica), cells from trained k-means centroids with nlist chosen LOW so
within-cell pair volume reaches the target; then time
``semantic_dedup_pairs``:

- exact (no prefilter) — the r7 baseline path;
- provable prefilter (Cauchy-Schwarz bound, zero false negatives) — also
  records how many candidate pairs the bound prunes, which is the honest
  quantizability read on this corpus;
- margin prefilter (approximate) at the given margin — records recall vs
  the exact pair set alongside the time.

Prints one JSON line.

Usage:
    python tools/make_semdedup_scale.py [--sf /tmp/sf2] [--nlist 4]
        [--tau 0.8] [--margin 0.2] [--m 8] [--k 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf2")
    ap.add_argument("--nlist", type=int, default=50)
    ap.add_argument("--tau", type=float, default=0.8)
    ap.add_argument("--margin", type=float, default=0.2)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.functions.dedup import semantic_dedup_pairs
    from siddhi_io_cdc_spark.functions.similarity import ivf_train_centroids, pq_train

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))
    n = emb.count()

    cents = ivf_train_centroids(emb, nlist=args.nlist, vec_col="embedding", seed=1)
    books = pq_train(emb, m=args.m, k=args.k, vec_col="embedding", seed=1)

    # candidate-pair volume under this blocking (sum of C(cell,2))
    from siddhi_io_cdc_spark.functions.similarity import ivf_assign

    sizes = (
        emb.select(ivf_assign(F.col("embedding"), cents).alias("c"))
        .groupBy("c").count().collect()
    )
    pairs_candidate = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    def run(tag, **kw):
        t0 = time.monotonic()
        rows = semantic_dedup_pairs(
            emb, cents, tau=args.tau, id_col="vec_id", **kw
        ).count()
        return {"sec": round(time.monotonic() - t0, 2), "pairs": rows}

    out = {
        "sf": args.sf, "n_vectors": n, "nlist": args.nlist,
        "candidate_pairs": pairs_candidate, "tau": args.tau,
        "pq": {"m": args.m, "k": args.k},
        "exact": run("exact"),
        "numpy": run("numpy", engine="numpy"),
        "bound": run("bound", pq_codebooks=books),
        "margin": run("margin", pq_codebooks=books,
                      prefilter_margin=args.margin),
    }
    out["numpy"]["parity"] = out["numpy"]["pairs"] == out["exact"]["pairs"]
    out["margin"]["recall_vs_exact"] = (
        round(out["margin"]["pairs"] / out["exact"]["pairs"], 4)
        if out["exact"]["pairs"] else None
    )
    out["bound"]["parity"] = out["bound"]["pairs"] == out["exact"]["pairs"]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
