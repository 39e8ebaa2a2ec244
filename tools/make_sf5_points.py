"""sf5 long points for the two steepest scale curves (VERDICT r10 ask #7 /
r11 ask #4).

- ``llm_top_ngrams`` (9.7x at 20x in the three-point series): the
  vocabulary-growth story — one more point shows whether the curve keeps
  tracking distinct-gram growth or bends.
- ``llm_semantic_dedup_numpy``: the contract entry pins nlist=16 for
  oracle determinism, but the operator's own 100 TB knob is the SemDeDup
  paper's nlist ~= sqrt(N) (functions/dedup.py docstring) — expected cell
  size ~= sqrt(N), pair work ~= N^1.5 instead of N^2. This tool measures
  BOTH settings per sf so the knob's effect is a recorded fact, not a
  docstring claim.

Usage:
    python tools/make_sf5_points.py --sf /tmp/sf5 [--skip-fixed]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf5")
    ap.add_argument("--skip-fixed", action="store_true",
                    help="skip the fixed-nlist=16 semdedup run (quadratic)")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from siddhi_io_cdc_spark.functions.dedup import semantic_dedup
    from siddhi_io_cdc_spark.functions.similarity import ivf_centroids
    from siddhi_io_cdc_spark.util import cache_scope

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"sf_dir": args.sf, "queries": {}}

    def timed(fn) -> dict:
        runs = []
        for _ in range(3):
            t0 = time.monotonic()
            with cache_scope():
                fn().write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        return {"cold": runs[0], "steady": min(runs[1:]),
                "spread": round(max(runs[1:]) - min(runs[1:]), 3), "n": 3}

    qs = E.queries()
    out["queries"]["llm_top_ngrams"] = timed(
        lambda: qs["llm_top_ngrams"](spark, args.sf)
    )
    print("llm_top_ngrams:", out["queries"]["llm_top_ngrams"], file=sys.stderr)

    # the contract query's corpus: embeddings + 5 planted clones
    def corpus():
        emb = spark.read.parquet(args.sf.rstrip("/") + "/embeddings.parquet")
        clone = emb.where(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding", "label"
        )
        return emb.unionByName(clone)

    n = corpus().count()
    nlist_sqrt = max(16, int(math.sqrt(n)))
    out["n_vectors"] = int(n)
    out["nlist_sqrt"] = nlist_sqrt

    out["queries"]["llm_semantic_dedup_numpy_nlist_sqrtN"] = timed(
        lambda: semantic_dedup(
            corpus(), ivf_centroids(64, nlist=nlist_sqrt), tau=0.99,
            engine="numpy",
        ).select("vec_id")
    )
    print("semdedup sqrtN:", out["queries"]["llm_semantic_dedup_numpy_nlist_sqrtN"],
          file=sys.stderr)

    if not args.skip_fixed:
        out["queries"]["llm_semantic_dedup_numpy_nlist_16"] = timed(
            lambda: semantic_dedup(
                corpus(), ivf_centroids(64, nlist=16), tau=0.99,
                engine="numpy",
            ).select("vec_id")
        )
        print("semdedup nlist16:",
              out["queries"]["llm_semantic_dedup_numpy_nlist_16"],
              file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
