"""asof_join / bucketed_range_join unit tests (operators/temporal.py)."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.operators.temporal import asof_join, bucketed_range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 5, 50.0), (2, 6, 60.0)],
        "uid int, trade_time int, tv double",
    )
    quotes = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0), (2, 7, 3.0)],
        "uid int, quote_time int, qv double",
    )
    return trades, quotes


def test_asof_backward_inclusive_and_outer(trades_quotes):
    trades, quotes = trades_quotes
    rows = {
        (r.uid, r.trade_time): (r.quote_time, r.qv)
        for r in asof_join(trades, quotes, ["uid"], "trade_time", "quote_time").collect()
    }
    assert rows[(1, 10)] == (10, 1.0)  # equal timestamps match (inclusive)
    assert rows[(1, 20)] == (15, 2.0)  # latest preceding, not just any
    assert rows[(2, 5)] == (None, None)  # no quote yet → left-outer NULLs
    assert rows[(2, 6)] == (None, None)


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    rows = {
        (r.uid, r.trade_time): r.quote_time
        for r in asof_join(
            trades, quotes, ["uid"], "trade_time", "quote_time", direction="forward"
        ).collect()
    }
    assert rows[(2, 5)] == 7 and rows[(2, 6)] == 7
    assert rows[(1, 10)] == 10
    assert rows[(1, 20)] is None


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    rows = {
        (r.uid, r.trade_time): r.quote_time
        for r in asof_join(
            trades, quotes, ["uid"], "trade_time", "quote_time", tolerance=3
        ).collect()
    }
    assert rows[(1, 10)] == 10  # distance 0 kept
    assert rows[(1, 20)] is None  # distance 5 > 3 dropped


def test_asof_null_payload_preserved(spark):
    """A matched right row whose VALUE is NULL must yield NULL, not an
    earlier row's value (struct packing, mirrors flatten's image rule)."""
    left = spark.createDataFrame([(1, 30)], "k int, lt int")
    right = spark.createDataFrame([(1, 10, 5.0), (1, 20, None)], "k int, rt int, v double")
    (row,) = asof_join(left, right, ["k"], "lt", "rt").collect()
    assert row.rt == 20 and row.v is None


def test_asof_collision_raises(trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("qv", "tv"), ["uid"], "trade_time", "quote_time")


def test_range_join_inner_and_left(spark):
    pts = spark.createDataFrame([(i,) for i in range(20)], "p int")
    ivs = spark.createDataFrame([(100, 3, 7), (200, 15, 30), (300, 90, 95)], "iid int, lo int, hi int")
    inner = sorted(
        (r.iid, r.p) for r in bucketed_range_join(pts, ivs, "p", "lo", "hi", 5).collect()
    )
    assert inner == [(100, p) for p in range(3, 8)] + [(200, p) for p in range(15, 20)]
    left = bucketed_range_join(pts, ivs, "p", "lo", "hi", 5, how="left_intervals")
    agg = {r.iid: r.n for r in left.groupBy("iid").agg(F.count("p").alias("n")).collect()}
    assert agg == {100: 5, 200: 5, 300: 0}  # empty interval retained


def test_range_join_no_duplicate_pairs(spark):
    """An interval spanning many buckets matches each point exactly once."""
    pts = spark.createDataFrame([(7,)], "p int")
    ivs = spark.createDataFrame([(1, 0, 100)], "iid int, lo int, hi int")
    assert bucketed_range_join(pts, ivs, "p", "lo", "hi", 5).count() == 1
