"""Run contract queries TWICE in one session and diff the full result sets.

The driver's correctness hash is recorded from a single execution; a query
whose output depends on partition order (unstable top-k ties, row_number
without a total tiebreak, nondeterministic sampling) can be oracle-correct
on one run and red on the next. This gate catches that class locally:
both executions must produce the identical multiset of rows.

Usage: PYTHONPATH=/root/repo python tools/check_determinism.py [n | names...]
       (default: the first 50 queries() entries — the driver's window)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(argv: list[str]) -> int:
    import __spark_entry__ as entrymod
    from siddhi_io_cdc_spark.session import get_spark

    spark = get_spark("determinism-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if len(argv) == 1 and argv[0].isdigit():
        names = list(qs)[: int(argv[0])]
    elif argv:
        names = argv
    else:
        names = list(qs)[:50]
    bad = []
    for name in names:
        a = sorted(map(str, qs[name](spark, SF_DIR).collect()))
        b = sorted(map(str, qs[name](spark, SF_DIR).collect()))
        if a != b:
            bad.append(name)
            print(f"NONDETERMINISTIC {name}")
        else:
            print(f"ok   {name} ({len(a)} rows)")
    print(f"\n{len(names) - len(bad)}/{len(names)} deterministic; failures: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
