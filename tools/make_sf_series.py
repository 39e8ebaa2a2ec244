"""Scale-series runner: cold + steady seconds for a committed query subset
at one sf directory (fresh session per invocation — run once per sf).

Reproduces the BENCH_sf{1,2}_r{N}.json methodology: every query executes
through the noop DSv2 sink (full plan, nothing collected), the builder
re-runs inside the timed region (driver-side build work counts), steady =
min of two post-warm runs.

Usage:
    python tools/make_sf_series.py --sf /tmp/sf2 [--queries a,b,c]
        > BENCH_sf2_rN.json
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

#: The committed scale-series subset (BASELINE.md three-point table) plus
#: the round-8 newcomers.
DEFAULT_QUERIES = [
    "cdc_flatten_multi_op", "cdc_apply_changelog", "rel_pricing_summary",
    "llm_dedup_exact", "llm_minhash_pairs", "llm_simhash_pairs",
    "llm_near_dedup", "llm_image_near_dup", "llm_duplicate_spans",
    "llm_knn_join_bucketed", "llm_knn_join_probed", "llm_knn_join_lsh",
    "llm_knn_join_trained", "llm_5gram_logprob", "llm_rag_pipeline",
    "llm_cdc_pipeline",
    "llm_duplicate_spans_maximal", "llm_dedup_substrings",
    "llm_semantic_dedup_numpy",
    # round-9 newcomer
    "llm_kneser_ney_5gram",
    # r16 additions (VERDICT r15 ask #2): the rest of the KN family and
    # the unigram-LM rows — every operator the r15/r16 optimization
    # rounds touched now has a measured scale point on the same HEAD.
    "llm_kneser_ney", "llm_modified_kneser_ney",
    "llm_unigram_lm", "llm_unigram_encode",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from siddhi_io_cdc_spark.util import cache_scope

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def run(name: str) -> float:
        t0 = time.monotonic()
        with cache_scope():
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    def _loadavg():
        try:
            with open("/proc/loadavg") as f:
                return [float(x) for x in f.read().split()[:3]]
        except OSError:
            return None

    out = {"sf_dir": args.sf, "loadavg_before": _loadavg(), "queries": {}}
    for name in args.queries.split(","):
        cold = run(name)
        posts = [run(name), run(name)]
        steady = min(posts)
        out["queries"][name] = {
            "cold": round(cold, 3),
            "steady": round(steady, 3),
            # min-of-N protocol pinned (round-11 ask): spread over the
            # post-warm runs exposes host noise next to every value
            "spread": round(max(posts) - steady, 3),
            "n": 1 + len(posts),
        }
        print(
            f"{name}: cold={cold:.2f}s steady={steady:.2f}s "
            f"spread={max(posts) - steady:.2f}s",
            file=sys.stderr,
        )
    out["loadavg_after"] = _loadavg()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
