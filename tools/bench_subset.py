"""Isolated re-measure of a named subset of the headline queries — the
r12 protocol's answer to host-contention episodes: re-run the suspects
alone on an idle box (min-of-N with the spread pinned) instead of
bisecting phantom regressions.

Usage: python tools/bench_subset.py [-n RUNS] name [name...]
Prints one JSON line shaped like bench.py's stats block.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entrymod
    from siddhi_io_cdc_spark.session import get_spark
    from siddhi_io_cdc_spark.util import cache_scope

    args = sys.argv[1:]
    n_runs = 5
    if args and args[0] == "-n":
        n_runs = int(args[1])
        args = args[2:]
    if not args:
        print("usage: bench_subset.py [-n RUNS] name [name...]", file=sys.stderr)
        return 2

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    spark = get_spark("cdc-bench-subset", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    stats: dict[str, dict] = {}
    for name in args:
        spark._jvm.System.gc()
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            with cache_scope():
                queries[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            runs.append(time.time() - t0)
        stats[name] = {
            "min": round(min(runs), 3),
            "spread": round(max(runs) - min(runs), 3),
            "n": len(runs),
            "runs": [round(r, 2) for r in runs],
        }
        print(f"  {name}: {stats[name]}", file=sys.stderr, flush=True)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "isolated_subset",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "stats": stats,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
