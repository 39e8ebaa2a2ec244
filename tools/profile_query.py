"""Per-stage profile of named headline queries via the Spark event log.

Runs each query (1 discarded cold + 1 timed warm run through the noop sink),
then parses the event log to attribute wall time to jobs and stages: task
counts, per-stage task-time sums, shuffle bytes, and the gaps BETWEEN jobs
(driver-side plan-build / collect time — invisible to stage metrics but very
visible in a bench whose clock covers plan construction).

Usage: python tools/profile_query.py name [name...]
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
EVDIR = "/tmp/spark-events-profile"


def main() -> int:
    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession
    from siddhi_io_cdc_spark.util import cache_scope

    os.makedirs(EVDIR, exist_ok=True)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    import tempfile

    spark = (
        SparkSession.builder.appName("cdc-profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .config("spark.eventLog.compress", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.path.join(tempfile.gettempdir(), "spark-graft-warehouse"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    app_id = spark.sparkContext.applicationId

    marks: dict[str, tuple[float, float]] = {}
    warmups = int(os.environ.get("SPARK_PROFILE_WARMUPS", "1"))
    for name in sys.argv[1:]:
        # cold run(s) (discarded: JIT + codegen + listing)
        for _ in range(warmups):
            with cache_scope():
                queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark._jvm.System.gc()
        t0 = time.time() * 1000
        with cache_scope():
            queries[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        t1 = time.time() * 1000
        marks[name] = (t0, t1)
        print(f"{name}: warm {(t1 - t0) / 1000:.3f}s", file=sys.stderr)

    spark.stop()
    # parse the event log
    cands = [p for p in os.listdir(EVDIR) if app_id in p]
    if not cands:
        print("no event log found", file=sys.stderr)
        return 1
    path = os.path.join(EVDIR, cands[0])
    if os.path.isdir(path):
        parts = sorted(
            p for p in os.listdir(path) if p.startswith("events_")
        )
        lines = []
        for p in parts:
            with open(os.path.join(path, p)) as f:
                lines.extend(f.readlines())
    else:
        with open(path) as f:
            lines = f.readlines()
    jobs = []          # (jobid, submit_ms, end_ms, stage_ids)
    stages = {}        # sid -> dict
    job_open = {}
    for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                job_open[ev["Job ID"]] = (
                    ev["Submission Time"],
                    [s["Stage ID"] for s in ev["Stage Infos"]],
                )
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_open:
                    sub, sids = job_open.pop(jid)
                    jobs.append((jid, sub, ev["Completion Time"], sids))
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                    "sub": si.get("Submission Time"),
                    "end": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                si = ev.get("Stage ID")
                accs = (ev.get("Task Info") or {}).get("Accumulables") or []
                d = stages.setdefault(si, {}) if si is not None else {}
                for a in accs:
                    nm = a.get("Name", "")
                    up = a.get("Update", 0)
                    if not isinstance(up, (int, float)):
                        continue
                    if nm == "internal.metrics.executorRunTime":
                        d["task_ms"] = d.get("task_ms", 0) + int(up)
                    elif nm.endswith("shuffle.read.localBytesRead") or nm.endswith(
                        "shuffle.read.remoteBytesRead"
                    ):
                        d["sh_read"] = d.get("sh_read", 0) + int(up)
                    elif nm.endswith("shuffle.write.bytesWritten"):
                        d["sh_write"] = d.get("sh_write", 0) + int(up)

    for name, (t0, t1) in marks.items():
        span = [j for j in jobs if j[1] >= t0 - 5 and j[2] <= t1 + 5]
        total = (t1 - t0) / 1000
        job_time = sum(j[2] - j[1] for j in span) / 1000
        print(f"\n=== {name}: wall {total:.3f}s, {len(span)} jobs, "
              f"sum(job spans) {job_time:.3f}s, driver gaps "
              f"{total - job_time:.3f}s ===")
        prev_end = t0
        for jid, sub, end, sids in sorted(span, key=lambda j: j[1]):
            gap = (sub - prev_end) / 1000
            prev_end = end
            print(f"  [gap {gap:6.3f}s] job {jid}: {(end - sub) / 1000:6.3f}s")
            for sid in sorted(sids):
                st = stages.get(sid)
                if not st or st.get("sub") is None:
                    continue
                if not (sub - 5 <= st["sub"] <= end + 5):
                    continue
                wall = (st.get("end", st["sub"]) - st["sub"]) / 1000
                print(
                    f"    stage {sid:4d} {wall:6.3f}s tasks={st.get('tasks', 0):3d} "
                    f"taskms={st.get('task_ms', 0):6d} "
                    f"shR={st.get('sh_read', 0):>9d} shW={st.get('sh_write', 0):>9d}  "
                    f"{st.get('name', '')}"
                )
        print(f"  [tail gap {(t1 - prev_end) / 1000:6.3f}s]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
