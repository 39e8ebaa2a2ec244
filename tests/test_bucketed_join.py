"""Co-located (bucketed) join: pre-bucketing both sides on the join key lets
Spark plan a SortMergeJoin with NO exchange on either side — the 100 TB
recipe for repeated joins on the same key (facts bucketed at ingest)."""

import contextlib
import io


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # warehouse dir is fixed at session build (session.py); tables land there
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        left = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS a")
        right = spark.range(0, 100).selectExpr("id AS k", "id * 3 AS b")
        left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_left_b")
        right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_right_b")
        joined = spark.table("t_left_b").join(spark.table("t_right_b"), "k")
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # both sides pre-partitioned by bucket
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_left_b")
        spark.sql("DROP TABLE IF EXISTS t_right_b")
