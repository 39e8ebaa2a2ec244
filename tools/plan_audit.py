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


def summarize(simple: str, formatted: str) -> str:
    """Structure counts come from SIMPLE mode (each physical node printed
    exactly once, `*(N)` marks whole-stage-codegen spans); pushdown facts
    from FORMATTED mode (the only mode that prints PushedFilters)."""
    n_exchange = len(re.findall(r"\bExchange\b", simple))
    n_reused = len(re.findall(r"\bReusedExchange\b", simple))
    n_bcast = len(re.findall(r"BroadcastHashJoin", simple))
    n_shuffle_join = len(re.findall(r"SortMergeJoin|ShuffledHashJoin", simple))
    n_codegen = len(set(re.findall(r"\*\((\d+)\)", simple)))
    n_python = len(re.findall(
        r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas", simple
    ))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", formatted)
    pushed_any = any(p.strip() for p in pushed)
    parts = re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted)
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
    # AQE defers codegen/strategy choices to runtime, so the static plan
    # shows an opaque AdaptiveSparkPlan wrapper; audit the static plan with
    # AQE off (codegen spans + join strategies visible). Production runs
    # keep AQE on — this only affects what the audit prints.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries = entrymod.queries()
    names = sys.argv[1:] or BENCH_QUERIES
    import contextlib
    import io

    for name in names:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        simple = buf.getvalue()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        formatted = buf.getvalue()
        print(f"\n===== {name} =====")
        print(summarize(simple, formatted))
        if "-v" in os.environ.get("PLAN_AUDIT_FLAGS", ""):
            print(formatted)
    return 0


if __name__ == "__main__":
    sys.exit(main())
