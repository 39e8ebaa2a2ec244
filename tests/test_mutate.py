"""Mutating query surface — Q1/Q3/Q4 semantics incl. the NULL-update fix
(siddhi's ``update T on key`` writes the given value including NULL;
reference usage TestCaseOfCDCListeningMode.java:275-277) and crash-safe
parquet merge (bootstrap + sibling-tmp swap)."""

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.operators.mutate import (
    apply_changelog,
    delete_on,
    insert_into,
    merge_into_parquet,
    update_on,
)


def _target(spark):
    return spark.createDataFrame(
        [("e001", "alice", 10), ("e002", "bob", 20), ("e003", "carol", 30)],
        "id string, name string, score int",
    )


def test_update_on_writes_null_values(spark):
    # A source row that explicitly sets name=NULL must null the target column,
    # not keep the old value (match-flag join, not coalesce).
    src = spark.createDataFrame([("e001", None, 99)], "id string, name string, score int")
    out = update_on(_target(spark), src, on=["id"]).orderBy("id").collect()
    assert out[0] == Row(id="e001", name=None, score=99)
    # Unmatched rows pass through untouched.
    assert out[1] == Row(id="e002", name="bob", score=20)


def test_update_on_distinguishes_unmatched_from_null(spark):
    # No source row for e003 → e003 keeps its values even though another
    # source row carries NULLs.
    src = spark.createDataFrame([("e002", None, None)], "id string, name string, score int")
    out = {r["id"]: r for r in update_on(_target(spark), src, on=["id"]).collect()}
    assert out["e002"].name is None and out["e002"].score is None
    assert out["e003"].name == "carol" and out["e003"].score == 30


def test_insert_and_delete(spark):
    tgt = _target(spark)
    src = spark.createDataFrame([("e004", "dave", 40)], "id string, name string, score int")
    assert insert_into(tgt, src).count() == 4
    left = delete_on(tgt, spark.createDataFrame([("e002",)], "id string"), on=["id"])
    assert sorted(r["id"] for r in left.collect()) == ["e001", "e003"]


def test_merge_into_parquet_bootstraps_missing_target(spark, tmp_path):
    target = os.path.join(str(tmp_path), "login")
    batch = spark.createDataFrame(
        [("e001", "alice", "insert", 1), ("e002", "bob", "insert", 2)],
        "id string, name string, operation string, ts_ms long",
    )
    merge_into_parquet(spark, target, batch, key=["id"])
    got = spark.read.parquet(target)
    assert sorted(r["id"] for r in got.collect()) == ["e001", "e002"]
    assert sorted(got.columns) == ["id", "name"]

    # Second batch merges against the bootstrapped table: update + delete.
    batch2 = spark.createDataFrame(
        [("e001", "ALICE", "update", 3), ("e002", "bob", "delete", 4)],
        "id string, name string, operation string, ts_ms long",
    )
    merge_into_parquet(spark, target, batch2, key=["id"])
    assert spark.read.parquet(target).collect() == [Row(id="e001", name="ALICE")]


def test_merge_recovers_interrupted_swap(spark, tmp_path):
    target = os.path.join(str(tmp_path), "tbl")
    batch = spark.createDataFrame(
        [("k1", "v1", "insert", 1)], "id string, v string, operation string, ts_ms long"
    )
    merge_into_parquet(spark, target, batch, key=["id"])
    # Simulate a crash between the two swap renames: target gone, .old- left.
    os.rename(target, target + ".old-deadbeef")
    batch2 = spark.createDataFrame(
        [("k2", "v2", "insert", 2)], "id string, v string, operation string, ts_ms long"
    )
    merge_into_parquet(spark, target, batch2, key=["id"])
    assert sorted(r["id"] for r in spark.read.parquet(target).collect()) == ["k1", "k2"]


def test_apply_changelog_last_event_wins(spark):
    tgt = _target(spark)
    ev = spark.createDataFrame(
        [
            ("e001", "x", 1, "update", 10),
            ("e001", "y", 2, "delete", 20),  # later → e001 deleted
            ("e004", "dave", 40, "insert", 5),
        ],
        "id string, name string, score int, operation string, ts_ms long",
    )
    out = {r["id"]: r for r in apply_changelog(tgt, ev, key=["id"]).collect()}
    assert "e001" not in out
    assert out["e004"].name == "dave"
    assert out["e002"].name == "bob"


def test_bucketed_merge_rewrites_only_touched_partitions(spark, tmp_path):
    import glob
    import time as _time

    from siddhi_io_cdc_spark.operators.mutate import merge_into_bucketed_parquet

    target = os.path.join(str(tmp_path), "store")
    seed = spark.createDataFrame(
        [(i, f"name{i}", "insert", 1) for i in range(100)],
        "id long, name string, operation string, ts_ms long",
    )
    merge_into_bucketed_parquet(spark, target, seed, key=["id"], num_buckets=8)
    table = spark.read.parquet(target)
    assert table.count() == 100
    assert len(glob.glob(f"{target}/__bucket=*")) > 1

    before = {f: os.path.getmtime(f) for f in glob.glob(f"{target}/__bucket=*/*.parquet")}
    _time.sleep(0.05)

    # One-key update touches exactly one bucket.
    batch = spark.createDataFrame(
        [(7, "UPDATED", "update", 2)], "id long, name string, operation string, ts_ms long"
    )
    merge_into_bucketed_parquet(spark, target, batch, key=["id"], num_buckets=8)
    got = {r["id"]: r["name"] for r in spark.read.parquet(target).collect()}
    assert got[7] == "UPDATED" and got[8] == "name8" and len(got) == 100

    after_files = glob.glob(f"{target}/__bucket=*/*.parquet")
    changed_dirs = {
        os.path.basename(os.path.dirname(f))
        for f in after_files
        if f not in before or os.path.getmtime(f) != before[f]
    }
    assert len(changed_dirs) == 1  # partition-pruned: one bucket rewritten


def test_bucketed_merge_delete_empties_bucket(spark, tmp_path):
    from siddhi_io_cdc_spark.operators.mutate import merge_into_bucketed_parquet

    target = os.path.join(str(tmp_path), "store2")
    seed = spark.createDataFrame(
        [(1, "a", "insert", 1), (2, "b", "insert", 1)],
        "id long, name string, operation string, ts_ms long",
    )
    merge_into_bucketed_parquet(spark, target, seed, key=["id"], num_buckets=4)
    wipe = spark.createDataFrame(
        [(1, "a", "delete", 2), (2, "b", "delete", 2)],
        "id long, name string, operation string, ts_ms long",
    )
    merge_into_bucketed_parquet(spark, target, wipe, key=["id"], num_buckets=4)
    assert spark.read.parquet(target).count() == 0


def test_apply_changelog_deletes_keyed_from_before_image(spark):
    """flatten's multi-op delete rows carry type DEFAULTS in the current
    columns and the real key in before_<k> — apply must re-key them."""
    from siddhi_io_cdc_spark.operators.flatten import flatten
    from siddhi_io_cdc_spark.sources.envelope import synthetic_changelog

    base = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    env = synthetic_changelog(
        base,
        F.when(F.col("k") == 3, "d").otherwise("c"),
        ts_ms=F.col("k"),
    )
    flat = flatten(env, operations=["insert", "delete"])
    target = spark.createDataFrame([], "k long, v double")
    out = {r.k: r.v for r in apply_changelog(target, flat, key=["k"]).collect()}
    assert out == {1: 10.0, 2: 20.0}  # k=3's delete must not strand a k=0 row


def test_merge_evolves_schema_on_new_column(spark, tmp_path):
    """Additive evolution: a column appearing mid-stream lands as typed
    NULLs on historical rows; a column dropped upstream reads NULL on new
    rows but keeps historical values."""
    from siddhi_io_cdc_spark.operators.mutate import evolve_target_schema

    target = os.path.join(str(tmp_path), "evolve")
    b1 = spark.createDataFrame(
        [("k1", "v1", "insert", 1)], "id string, v string, operation string, ts_ms long"
    )
    merge_into_parquet(spark, target, b1, key=["id"])
    # upstream ALTER TABLE ADD COLUMN w
    b2 = spark.createDataFrame(
        [("k2", "v2", 7, "insert", 2)],
        "id string, v string, w long, operation string, ts_ms long",
    )
    merge_into_parquet(spark, target, b2, key=["id"], evolve=True)
    got = {r.id: (r.v, r.w) for r in spark.read.parquet(target).collect()}
    assert got == {"k1": ("v1", None), "k2": ("v2", 7)}

    # upstream drops v: new rows get NULL v, k1/k2 keep theirs
    b3 = spark.createDataFrame(
        [("k3", 9, "insert", 3)], "id string, w long, operation string, ts_ms long"
    )
    merge_into_parquet(spark, target, b3, key=["id"], evolve=True)
    got = {r.id: (r.v, r.w) for r in spark.read.parquet(target).collect()}
    assert got == {"k1": ("v1", None), "k2": ("v2", 7), "k3": (None, 9)}

    # pure-projection check, no store: after alignment every target column
    # is present on the events side (events keep their extra meta columns).
    t, e = evolve_target_schema(spark.read.parquet(target), b2)
    assert set(t.columns) <= set(e.columns)


def test_bucketed_merge_evolves_schema(spark, tmp_path):
    from siddhi_io_cdc_spark.operators.mutate import merge_into_bucketed_parquet

    target = os.path.join(str(tmp_path), "bevolve")
    b1 = spark.createDataFrame(
        [("k1", "v1", "insert", 1), ("k2", "v2", "insert", 1)],
        "id string, v string, operation string, ts_ms long",
    )
    merge_into_bucketed_parquet(spark, target, b1, key=["id"], num_buckets=4)
    b2 = spark.createDataFrame(
        [("k1", "V1", 5, "update", 2), ("k3", "v3", 6, "insert", 2)],
        "id string, v string, w long, operation string, ts_ms long",
    )
    merge_into_bucketed_parquet(spark, target, b2, key=["id"], num_buckets=4, evolve=True)
    from siddhi_io_cdc_spark.operators.mutate import read_bucketed_store

    got = {r.id: (r.v, r.w) for r in read_bucketed_store(spark, target).collect()}
    assert got["k1"] == ("V1", 5) and got["k3"] == ("v3", 6)
    # k2's bucket was untouched by the evolving batch: union schema reads
    # its missing column as NULL.
    assert got["k2"] == ("v2", None)

    # A later merge touching ONLY k2's bucket must not erase k1's w values
    # (the single-footer-sample hazard: without mergeSchema on the internal
    # read, an un-evolved footer would drop the column for the whole store).
    b3 = spark.createDataFrame(
        [("k2", "V2", "update", 3)], "id string, v string, operation string, ts_ms long"
    )
    merge_into_bucketed_parquet(spark, target, b3, key=["id"], num_buckets=4, evolve=True)
    got = {r.id: (r.v, r.w) for r in read_bucketed_store(spark, target).collect()}
    assert got["k1"] == ("V1", 5) and got["k2"] == ("V2", None) and got["k3"] == ("v3", 6)


def test_delta_layout_gates_cleanly(spark, tmp_path):
    """layout='delta' routes to MERGE INTO when delta-spark exists; in this
    container the import gate must raise a CLEAR error, not fail obscurely."""
    import pytest

    from siddhi_io_cdc_spark.operators.mutate import foreach_batch_merge

    batch = spark.createDataFrame(
        [(1, 1.0, "insert", 1)], "k long, v double, operation string, ts_ms long"
    )
    apply_fn = foreach_batch_merge(spark, str(tmp_path / "d"), key=["k"], layout="delta")
    try:
        import delta  # noqa: F401

        have_delta = True
    except ImportError:
        have_delta = False
    if not have_delta:
        with pytest.raises(ImportError, match="delta-spark"):
            apply_fn(batch, 0)


def test_foreach_batch_merge_refuses_layout_interleave(spark, tmp_path):
    """A checkpointed stream resuming against a store written in another
    layout must fail fast: flat and bucketed stores are not interchangeable
    on disk (the default changed to 'bucketed'; silent interleave would
    corrupt reads)."""
    import pytest

    from siddhi_io_cdc_spark.operators.mutate import (
        foreach_batch_merge,
        merge_into_parquet,
    )

    flat = str(tmp_path / "flat_store")
    batch = spark.createDataFrame(
        [(1, "a", 10, "insert")], "k long, v string, ts_ms long, operation string"
    )
    merge_into_parquet(spark, flat, batch, key=["k"])
    # Default (bucketed) against an existing flat store: refuse.
    with pytest.raises(ValueError, match="already uses the 'flat' layout"):
        foreach_batch_merge(spark, flat, key=["k"])
    # Explicit matching layout keeps working.
    apply_fn = foreach_batch_merge(spark, flat, key=["k"], layout="flat")
    apply_fn(
        spark.createDataFrame(
            [(2, "b", 11, "insert")], "k long, v string, ts_ms long, operation string"
        ),
        0,
    )
    assert spark.read.parquet(flat).count() == 2

    # And the mirror case: bucketed store, flat adapter.
    bucketed = str(tmp_path / "bucketed_store")
    apply_b = foreach_batch_merge(spark, bucketed, key=["k"], num_buckets=4)
    apply_b(batch, 0)
    with pytest.raises(ValueError, match="already uses the 'bucketed' layout"):
        foreach_batch_merge(spark, bucketed, key=["k"], layout="flat")
