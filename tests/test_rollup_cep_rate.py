"""Incremental rollup, CEP absence/counting patterns, output rate limiting."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.operators.cep import absent_pattern, consecutive_runs
from siddhi_io_cdc_spark.operators.rate_limit import every_nth_per_key, snapshot_per_window
from siddhi_io_cdc_spark.plans.rollup import incremental_rollup


def test_rollup_levels_agree_with_direct_agg(spark):
    df = spark.range(0, 1000).selectExpr(
        "id AS t", "CAST(id % 3 AS STRING) AS k", "CAST(id % 7 AS DOUBLE) AS v"
    )
    out = incremental_rollup(df, "t", ["k"], "v", granularities=(10, 100)).collect()
    fine = [r for r in out if r.granularity_sec == 10]
    coarse = [r for r in out if r.granularity_sec == 100]
    assert len(fine) == 300 and len(coarse) == 30  # 3 keys x 100 / x 10 buckets
    # cascaded coarse level == direct aggregation at width 100
    direct = {
        (r.k, r.bucket_start): (r.s, r.n, r.mn, r.mx)
        for r in df.groupBy("k", (F.floor(F.col("t") / 100) * 100).cast("long").alias("bucket_start"))
        .agg(
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    for r in coarse:
        assert direct[(r.k, r.bucket_start)] == (r.sum_value, r.n_events, r.min_value, r.max_value)


def test_single_pass_rollup_matches_cascade(spark):
    from siddhi_io_cdc_spark.plans.rollup import rollup_single_pass

    df = spark.range(0, 1000).selectExpr(
        "id AS t", "CAST(id % 3 AS STRING) AS k", "CAST(id % 7 AS DOUBLE) AS v"
    )
    cascade = {
        (r.k, r.granularity_sec, r.bucket_start): (r.sum_value, r.n_events, r.min_value, r.max_value)
        for r in incremental_rollup(df, "t", ["k"], "v", granularities=(10, 100)).collect()
    }
    single = {
        (r.k, r.granularity_sec, r.bucket_start): (r.sum_value, r.n_events, r.min_value, r.max_value)
        for r in rollup_single_pass(df, "t", ["k"], "v", granularities=(10, 100)).collect()
    }
    assert cascade == single


def test_single_pass_rollup_plan_one_scan_one_exchange(spark):
    import contextlib
    import io

    from siddhi_io_cdc_spark.plans.rollup import rollup_single_pass

    df = spark.range(0, 100).selectExpr("id AS t", "'a' AS k", "1.0 AS v")
    plan = rollup_single_pass(df, "t", ["k"], "v", granularities=(10, 100))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan.explain()
    p = buf.getvalue()
    # single shuffle; partial agg runs before it (map-side collapse)
    assert p.count("Exchange") == 1
    assert "partial_sum" in p


def test_rollup_rejects_non_nesting_granularities(spark):
    df = spark.range(1).selectExpr("id AS t", "'a' AS k", "1.0 AS v")
    with pytest.raises(ValueError, match="divide the next"):
        incremental_rollup(df, "t", ["k"], "v", granularities=(10, 25))


def test_absent_pattern_strictly_after(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 50), (2, 10)], "u long, lt long"
    )
    right = spark.createDataFrame(
        # u=1: B at 15 suppresses A@10 (within 20); B at 100 too far for A@50.
        # u=2: B at exactly 10 (not strictly after) and at 31 (outside 20).
        [(1, 15), (1, 100), (2, 10), (2, 31)],
        "u long, rt long",
    )
    got = sorted(
        (r.u, r.lt)
        for r in absent_pattern(left, right, on=["u"], left_time="lt", right_time="rt", within=20).collect()
    )
    assert got == [(1, 50), (2, 10)]


def test_consecutive_runs_finds_k_in_a_row(spark):
    rows = [(1, i, t) for i, t in enumerate(["ok", "err", "err", "err", "ok", "err", "err"])]
    rows += [(2, i, "err") for i in range(3)]
    df = spark.createDataFrame(rows, "u long, seq long, typ string")
    got = sorted(
        (r.u, r.seq)
        for r in consecutive_runs(df, ["u"], "seq", F.col("typ") == "err", k=3).collect()
    )
    # u=1: run of 3 completes at seq=3 only (5,6 is just 2); u=2 completes at 2.
    assert got == [(1, 3), (2, 2)]


def test_every_nth_per_key(spark):
    df = spark.range(0, 10).selectExpr("id % 2 AS u", "id AS t")
    got = sorted((r.u, r.t) for r in every_nth_per_key(df, ["u"], "t", n=2).collect())
    # per key the events in order are [0,2,4,6,8] / [1,3,5,7,9]; every 2nd:
    assert got == [(0, 2), (0, 6), (1, 3), (1, 7)]


def test_snapshot_per_window_last_and_first(spark):
    df = spark.createDataFrame(
        [(1, 5, 100), (1, 9, 101), (1, 12, 102), (2, 3, 103)],
        "u long, t long, eid long",
    )
    last = sorted(
        (r.u, r.window_start, r.eid)
        for r in snapshot_per_window(df, ["u"], "t", 10, "eid").collect()
    )
    assert last == [(1, 0, 101), (1, 10, 102), (2, 0, 103)]
    first = sorted(
        (r.u, r.window_start, r.eid)
        for r in snapshot_per_window(df, ["u"], "t", 10, "eid", first=True).collect()
    )
    assert first == [(1, 0, 100), (1, 10, 102), (2, 0, 103)]


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    """§2.5 sketch surface: HLL approx within 5% of exact on orders keys."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("a"),
        F.countDistinct("o_custkey").alias("e"),
    ).collect()[0]
    assert abs(row.a - row.e) / row.e < 0.05


def test_both_pattern_either_order_within(spark):
    left = spark.createDataFrame([(1, 100), (2, 100)], "u long, lt long")
    right = spark.createDataFrame(
        [(1, 90), (1, 150), (1, 300), (2, 201)], "u long, rt long"
    )
    from siddhi_io_cdc_spark.operators.cep import both_pattern

    got = sorted(
        (r.u, r.lt, r.rt)
        for r in both_pattern(left, right, ["u"], "lt", "rt", within=100).collect()
    )
    # u1: 90 (before, within) and 150 match; 300 too far. u2: 201 too far.
    assert got == [(1, 100, 90), (1, 100, 150)]


def test_immediate_sequence_strict_succession(spark):
    rows = [
        (1, 0, "view"), (1, 1, "purchase"),      # match
        (1, 2, "view"), (1, 3, "click"), (1, 4, "purchase"),  # broken by click
        (2, 0, "purchase"),                      # no predecessor
    ]
    df = spark.createDataFrame(rows, "u long, t long, typ string")
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.operators.cep import immediate_sequence

    got = sorted(
        (r.u, r.t)
        for r in immediate_sequence(
            df, ["u"], "t", F.col("typ") == "view", F.col("typ") == "purchase"
        ).collect()
    )
    assert got == [(1, 1)]


def test_frequent_items_top_k_with_ties(spark):
    from siddhi_io_cdc_spark.operators.rate_limit import frequent_items

    rows = [(1, "a")] * 3 + [(1, "b")] * 2 + [(1, "c")] * 2 + [(2, "z")]
    df = spark.createDataFrame(rows, "u long, item string")
    got = sorted(
        (r.u, r.item, r.n_occurrences)
        for r in frequent_items(df, ["u"], "item", k=2).collect()
    )
    # tie between b and c at 2 -> item asc wins (b)
    assert got == [(1, "a", 3), (1, "b", 2), (2, "z", 1)]


def test_or_pattern_branch_precedence(spark):
    from siddhi_io_cdc_spark.operators.cep import or_pattern

    df = spark.createDataFrame(
        [(1, "buy"), (2, "err"), (3, "view"), (4, "buy")], "eid long, typ string"
    )
    got = sorted(
        (r.eid, r.matched_branch)
        for r in or_pattern(
            df, first=F.col("typ") == "buy", second=F.col("typ").isin("err", "buy")
        ).collect()
    )
    # eid=4 matches both branches -> 'first' wins; 'view' fires nothing.
    assert got == [(1, "first"), (2, "second"), (4, "first")]


def test_match_runs_count_quantifier_bounds(spark):
    from siddhi_io_cdc_spark.operators.cep import match_runs

    # u=1: runs of 1, 3, 2; u=2: run of 5 (excluded by max_count=4).
    flags = {1: "x--xxx-xx", 2: "xxxxx"}
    rows = [(u, i, c == "x") for u, s in flags.items() for i, c in enumerate(s)]
    df = spark.createDataFrame(rows, "u long, seq long, f boolean")
    got = sorted(
        (r.u, r.run_start, r.run_end, r.run_len)
        for r in match_runs(df, ["u"], "seq", F.col("f"), 2, 4).collect()
    )
    assert got == [(1, 3, 5, 3), (1, 7, 8, 2)]
    unbounded = sorted(
        (r.u, r.run_len)
        for r in match_runs(df, ["u"], "seq", F.col("f"), 2).collect()
    )
    assert unbounded == [(1, 2), (1, 3), (2, 5)]


def test_match_runs_randomized_against_python_scan(spark):
    """Property-ish: 40 random flag sequences in one frame agree with a
    sequential run-length scanner for several (min,max) bounds."""
    import random

    rnd = random.Random(11)
    seqs = {u: [rnd.random() < 0.45 for _ in range(rnd.randint(0, 25))] for u in range(40)}
    rows = [(u, i, f) for u, fs in seqs.items() for i, f in enumerate(fs)]
    df = spark.createDataFrame(rows, "u long, seq long, f boolean") if rows else None

    def python_runs(flags, mn, mx):
        runs, start = [], None
        for i, f in enumerate(flags + [False]):
            if f and start is None:
                start = i
            elif not f and start is not None:
                ln = i - start
                if ln >= mn and (mx is None or ln <= mx):
                    runs.append((start, i - 1, ln))
                start = None
        return runs

    from siddhi_io_cdc_spark.operators.cep import match_runs

    for mn, mx in ((1, None), (2, 4), (3, 3)):
        got = sorted(
            (r.u, r.run_start, r.run_end, r.run_len)
            for r in match_runs(df, ["u"], "seq", F.col("f"), mn, mx).collect()
        )
        want = sorted(
            (u, s, e, ln) for u, fs in seqs.items() for s, e, ln in python_runs(fs, mn, mx)
        )
        assert got == want, (mn, mx)


def test_lossy_frequent_support_threshold(spark):
    """window.lossyFrequent: exact support-threshold set in the batch
    restatement — no false positives or negatives at the boundary."""
    from siddhi_io_cdc_spark.operators.rate_limit import lossy_frequent_items

    rows = [("u1", t) for t in ["a"] * 5 + ["b"] * 3 + ["c"] * 2] + [
        ("u2", t) for t in ["x"] * 9 + ["y"] * 1
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    got = {
        (r.user_id, r.event_type): (r.n_occurrences, r.support_frac)
        for r in lossy_frequent_items(df, ["user_id"], "event_type", 0.3).collect()
    }
    # u1: a=0.5 and b=0.3 pass (boundary inclusive), c=0.2 fails;
    # u2: x=0.9 passes, y=0.1 fails.
    assert got == {("u1", "a"): (5, 0.5), ("u1", "b"): (3, 0.3), ("u2", "x"): (9, 0.9)}

    import pytest

    with pytest.raises(ValueError, match="support"):
        lossy_frequent_items(df, ["user_id"], "event_type", 0.0)
