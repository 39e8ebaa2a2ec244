"""Physical-plan regression tests: pin the scale properties (pushdown,
broadcast joins, shuffle-free flattening, TakeOrdered top-k, map-side
partial aggregation) so they can't silently regress."""

import contextlib
import io

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()  # simple mode: each physical node appears exactly once
    return buf.getvalue()


@pytest.fixture(scope="module")
def entrymod():
    import __spark_entry__ as e

    return e


def test_incremental_scan_pushes_filter(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["cdc_incremental_scan"](spark, sf_dir))
    assert "PushedFilters" in p and "GreaterThan(event_id,9000)" in p


def test_snowflake_join_broadcasts_all_dims(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_local_supplier_volume"](spark, sf_dir))
    assert p.count("BroadcastHashJoin") == 5
    assert "SortMergeJoin" not in p
    # The region filter reaches the scan.
    assert "EqualTo(r_name,ASIA)" in p


def test_flatten_is_shuffle_free(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["cdc_flatten_multi_op"](spark, sf_dir))
    assert "Exchange" not in p  # narrow ops only — holds at any scale


def test_topk_uses_take_ordered(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_topk_cosine"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p  # per-partition heaps, no global sort


def test_pricing_summary_partial_aggregates(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_pricing_summary"](spark, sf_dir))
    assert "partial_sum" in p  # map-side combine before the single exchange
    assert p.count("Exchange") <= 2  # agg exchange (+AQE wrapper), nothing else


def test_update_on_broadcasts_change_set(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["cdc_update_on"](spark, sf_dir))
    assert "BroadcastHashJoin" in p and "LeftOuter" in p and "BuildRight" in p  # table never shuffles


def test_dedup_exact_single_exchange(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_dedup_exact"](spark, sf_dir))
    assert p.count("Exchange") == 1  # one shuffle end-to-end (min_by agg)


def test_asof_join_single_shuffle_no_explosion(spark, sf_dir, entrymod):
    """Union+window formulation: exactly one key exchange, no join node at
    all (the naive formulation would show a range-condition join)."""
    p = plan_of(entrymod.queries()["rel_asof_join"](spark, sf_dir))
    assert "Join" not in p  # no row-exploding join — window over union
    assert "WindowExec" in p or "Window" in p
    assert p.count("Exchange") <= 2  # key repartition (+AQE wrapper)


def test_range_join_is_equi_bucket_join(spark, sf_dir, entrymod):
    """Binned interval join must plan as an equi hash join on the bucket,
    never a broadcast nested loop / cartesian."""
    p = plan_of(entrymod.queries()["rel_range_join"](spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_small_qty_revenue_broadcasts_part_dim(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_small_qty_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_window_aggs_partial_aggregate(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["win_tumbling"](spark, sf_dir))
    assert "partial_count" in p or "partial_sum" in p  # map-side combine


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from siddhi_io_cdc_spark.plans.skew import salted_join

    left = spark.createDataFrame([(i % 3, i) for i in range(30)], "k long, v long")
    right = spark.createDataFrame([(0, "a"), (1, "b"), (5, "e")], "k long, tag string")
    got = sorted(tuple(r) for r in salted_join(left, right, ["k"], salt=4).collect())
    want = sorted(tuple(r) for r in left.join(right, "k").collect())
    assert got == want
    lgot = sorted(
        tuple(r) for r in salted_join(left, right, ["k"], salt=4, how="left").collect()
    )
    lwant = sorted(tuple(r) for r in left.join(right, "k", "left").collect())
    assert lgot == lwant


def test_absent_pattern_is_keyed_anti_join(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_pattern_absent"](spark, sf_dir))
    assert "LeftAnti" in p
    # equi-key join with the range as a filter — never a nested loop over
    # the cross product
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_pattern_sequence_single_shuffle(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_pattern_sequence"](spark, sf_dir))
    assert p.count("Exchange") == 1


def test_rollup_single_scan_single_shuffle(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_rollup_multi"](spark, sf_dir))
    assert p.count("FileScan") == 1  # raw data read exactly once
    assert p.count("Exchange") == 1  # one shuffle of collapsed partials
    assert "partial_sum" in p


def test_rate_limit_single_shuffle(spark, sf_dir, entrymod):
    for key in ("rel_output_every_nth", "rel_output_snapshot"):
        p = plan_of(entrymod.queries()[key](spark, sf_dir))
        assert p.count("Exchange") == 1, key


def test_knn_join_broadcasts_queries_and_prunes(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_knn_join"](spark, sf_dir))
    # query side broadcast (corpus never shuffled for scoring) ...
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    # ... and the only exchange is the per-query rank over the PRUNED rows,
    # which sits above the Python local-top-k stage.
    assert p.count("Exchange hashpartitioning(query_id") == 1


def test_knn_join_bucketed_pure_jvm_equi_join(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_knn_join_bucketed"](spark, sf_dir))
    # cell blocking must plan as an equi join on __cell — never a cross
    # product, and never a Python/Arrow hop (the broadcast knn_join's
    # Arrow stage is what made it quadratic-slow at Q ∝ N)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "MapInPandas" not in p and "EvalPython" not in p
    # stage-1 window rides the join's __cell partitioning (subset of the
    # window keys), so the only exchanges are the join inputs + the final
    # per-query rank over the pruned Q·k rows
    assert p.count("Exchange hashpartitioning") <= 3


def test_mixture_sample_is_broadcast_filter(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_mixture_sample"](spark, sf_dir))
    # per-domain rates broadcast back onto the corpus — the corpus itself
    # never shuffles; the only exchange is the tiny counts aggregate
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") <= 2


def test_chunk_tokens_is_map_only(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_chunk_tokens"](spark, sf_dir))
    # pure array expressions + explode: no hash shuffle anywhere; the only
    # exchange allowed is fan_out's round-robin widening of a compact scan
    # (a no-op on a many-file 100 TB input)
    assert "Exchange hashpartitioning" not in p
    assert p.count("Exchange") <= 1


def test_match_runs_single_shuffle(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_pattern_runs"](spark, sf_dir))
    # both row_numbers + the run aggregation share one user_id exchange
    assert p.count("Exchange hashpartitioning") == 1


def test_paragraph_dedup_single_exchange_no_join(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_paragraph_dedup"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p  # min-struct agg, no join-back


def test_unique_and_sort_window_one_shuffle(spark, sf_dir, entrymod):
    for name in ("win_unique", "win_sort"):
        p = plan_of(entrymod.queries()[name](spark, sf_dir))
        assert p.count("Exchange hashpartitioning") == 1, name


def test_top_revenue_suppliers_no_global_window(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_top_revenue_suppliers"](spark, sf_dir))
    # global max via agg + broadcast join, never a single-partition sort
    assert "Window" not in p
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_supplier_counts_anti_join_broadcast(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["rel_supplier_counts_by_size"](spark, sf_dir))
    assert "LeftAnti, BuildRight" in p or ("LeftAnti" in p and "Broadcast" in p)


def test_history_build_single_exchange(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["cdc_history_scd2"](spark, sf_dir))
    # rekey + lead + is_current all ride one user_id exchange; no joins
    assert p.count("Exchange hashpartitioning") == 1
    assert "Join" not in p


def test_temporal_lookup_no_explosion(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["cdc_temporal_lookup"](spark, sf_dir))
    # as-of machinery: union + window, never a range join / nested loop
    assert "NestedLoop" not in p and "CartesianProduct" not in p


def test_decontaminate_broadcasts_benchmark(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in p  # corpus never shuffled for the probe


def test_retention_windows_single_shuffle(spark, sf_dir, entrymod):
    for name in ("win_time_length", "win_delay"):
        p = plan_of(entrymod.queries()[name](spark, sf_dir))
        assert p.count("Exchange hashpartitioning") == 1, name
        # never a global single-partition window
        assert "Exchange SinglePartition" not in p or "AggregateExec" in p, name


def test_maximal_spans_two_keyed_windows_share_exchange(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_duplicate_spans_maximal"](spark, sf_dir))
    # stages: window-hash agg (1 exchange on __h), islands + interval merge
    # both partition on doc_id (exchange reused), broadcast join-back of the
    # duplicated-hash set; NO cartesian, NO python
    assert "CartesianProduct" not in p and "Python" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert p.count("Exchange hashpartitioning") <= 3


def test_dedup_substrings_rewrite_is_map_side_after_join(spark, sf_dir, entrymod):
    p = plan_of(entrymod.queries()["llm_dedup_substrings"](spark, sf_dir))
    assert "CartesianProduct" not in p and "Python" not in p


def test_semantic_numpy_engine_single_python_node(spark, sf_dir, entrymod):
    """engine='numpy' is ONE ArrowEvalPython-free FlatMapGroupsInPandas node
    over the (cell, block-pair) grouping — the only Python in the plan, by
    design. The default salt='auto' adds the per-cell salt-count aggregate
    (its own exchange + a broadcast back); the unsalted form keeps the
    original single-exchange shape."""
    from siddhi_io_cdc_spark.functions.dedup import _semantic_pairs_numpy
    from siddhi_io_cdc_spark.functions.dedup import semantic_dedup_pairs
    from siddhi_io_cdc_spark.functions.similarity import ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(64, nlist=4)
    pairs = semantic_dedup_pairs(emb, cents, tau=0.9, engine="numpy")
    p = plan_of(pairs)
    assert p.count("FlatMapGroupsInPandas") == 1
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "BroadcastExchange" in p  # per-cell salts broadcast back
    unsalted = _semantic_pairs_numpy(emb, cents, 0.9, "embedding", "vec_id", salt=1)
    pu = plan_of(unsalted)
    assert pu.count("FlatMapGroupsInPandas") == 1
    assert pu.count("Exchange hashpartitioning") == 1  # the cell grouping
