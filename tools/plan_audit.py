"""Print the physical plan of headline contract queries — audit evidence.

For each query: the formatted plan plus a one-line summary of the scale
signals (scan pushdown/partition filters, exchange count, broadcast joins,
whole-stage-codegen coverage, Python eval nodes). A query whose plan
regresses (new exchange, lost pushdown, row-at-a-time Python) shows up as a
diff in this tool's output.

Usage: PYTHONPATH=/root/repo python tools/plan_audit.py [query ...]
       (default: the bench.py headline set; sf dir via $SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def summarize(plan: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_reused = len(re.findall(r"\bReusedExchange\b", plan))
    n_bcast = len(re.findall(r"BroadcastHashJoin", plan))
    n_shuffle_join = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", plan))
    n_codegen = len(
        set(re.findall(r"codegen id : (\d+)", plan))
        or set(re.findall(r"\*\((\d+)\)", plan))
    )
    n_python = len(re.findall(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed_any = any(p.strip() for p in pushed)
    parts = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    parts_any = any(p.strip() for p in parts)
    return (
        f"exchanges={n_exchange} (reused={n_reused}) broadcast_joins={n_bcast} "
        f"shuffle_joins={n_shuffle_join} codegen_spans={n_codegen} "
        f"python_nodes={n_python} pushed_filters={pushed_any} "
        f"partition_filters={parts_any}"
    )


def main() -> int:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from siddhi_io_cdc_spark.session import get_spark

    spark = get_spark("cdc-plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    names = sys.argv[1:] or BENCH_QUERIES
    import contextlib
    import io

    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")  # includes per-operator `codegen id`
        plan = buf.getvalue()
        print(f"\n===== {name} =====")
        print(summarize(plan))
        if "-v" in os.environ.get("PLAN_AUDIT_FLAGS", ""):
            print(plan)
    return 0


if __name__ == "__main__":
    sys.exit(main())
