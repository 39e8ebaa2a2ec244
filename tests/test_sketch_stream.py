"""CDC-incremental sketch maintenance: CMS linearity, HLL monotonicity,
replay skip, before-image guards, versioned-state crash behavior."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.sketch import cms_sketch, hll_registers
from siddhi_io_cdc_spark.streaming.sketch import (
    _tokens,
    apply_changelog_cms,
    apply_changelog_hll,
    foreach_batch_cms,
    read_cms,
    read_hll_registers,
    write_cms_state,
    write_hll_state,
)

SCHEMA = (
    "doc_id bigint, text string, before_text string, "
    "operation string, ts_ms bigint"
)


@pytest.fixture()
def corpus0(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "beta beta delta"),
            (3, "gamma delta epsilon"),
        ],
        "doc_id bigint, text string",
    )


def _batches(spark):
    b1 = spark.createDataFrame(
        [
            (4, "zeta alpha", None, "insert", 10),
            (2, "beta theta", "beta beta delta", "update", 11),
            (3, None, "gamma delta epsilon", "delete", 12),
        ],
        SCHEMA,
    )
    # intra-batch chain: doc 5 inserted then updated in the same batch
    b2 = spark.createDataFrame(
        [
            (5, "iota iota", None, "insert", 20),
            (5, "iota kappa", "iota iota", "update", 21),
            (1, "alpha beta gamma mu", "alpha beta gamma", "update", 22),
        ],
        SCHEMA,
    )
    return b1, b2


def _final_corpus(spark):
    # hand-applied changelog result
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma mu"),
            (2, "beta theta"),
            (4, "zeta alpha"),
            (5, "iota kappa"),
        ],
        "doc_id bigint, text string",
    )


def test_cms_maintained_equals_fresh_sketch(spark, corpus0, tmp_path):
    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3, seed=0)
    b1, b2 = _batches(spark)
    apply_changelog_cms(spark, b1, path, batch_id=1)
    apply_changelog_cms(spark, b2, path, batch_id=2)
    got = sorted(map(tuple, read_cms(spark, path).collect()))
    fresh = cms_sketch(
        _tokens(_final_corpus(spark), "text"), "tok", width=64, depth=3, seed=0
    )
    assert got == sorted(map(tuple, fresh.collect()))


def test_cms_replay_skips_applied_batch(spark, corpus0, tmp_path):
    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3)
    b1, _ = _batches(spark)
    apply_changelog_cms(spark, b1, path, batch_id=1)
    before = sorted(map(tuple, read_cms(spark, path).collect()))
    apply_changelog_cms(spark, b1, path, batch_id=1)  # replay: pointer skip
    assert sorted(map(tuple, read_cms(spark, path).collect())) == before


def test_cms_guards_missing_and_null_before(spark, corpus0, tmp_path):
    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3)
    no_col = spark.createDataFrame(
        [(2, "x", "update", 1)],
        "doc_id bigint, text string, operation string, ts_ms bigint",
    )
    with pytest.raises(ValueError, match="no 'before_text' column"):
        apply_changelog_cms(spark, no_col, path, batch_id=3)
    null_before = spark.createDataFrame(
        [(2, "x", None, "update", 1)], SCHEMA
    )
    with pytest.raises(ValueError, match="NULL 'before_text'"):
        apply_changelog_cms(spark, null_before, path, batch_id=3)


def test_cms_foreach_batch_adapter(spark, corpus0, tmp_path):
    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3)
    b1, b2 = _batches(spark)
    fn = foreach_batch_cms(spark, path)
    fn(b1, 1)
    fn(b2, 2)
    fn(b2, 2)  # the adapter passes batch_id through -> replay skip
    got = sorted(map(tuple, read_cms(spark, path).collect()))
    fresh = cms_sketch(
        _tokens(_final_corpus(spark), "text"), "tok", width=64, depth=3
    )
    assert got == sorted(map(tuple, fresh.collect()))


def test_cms_insert_then_delete_nets_to_zero(spark, corpus0, tmp_path):
    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3)
    b = spark.createDataFrame(
        [
            (9, "omega omega", None, "insert", 1),
            (9, None, "omega omega", "delete", 2),
        ],
        SCHEMA,
    )
    before = sorted(map(tuple, read_cms(spark, path).collect()))
    apply_changelog_cms(spark, b, path, batch_id=1)
    assert sorted(map(tuple, read_cms(spark, path).collect())) == before


def test_hll_insert_only_matches_fresh_registers(spark, corpus0, tmp_path):
    path = str(tmp_path / "hll")
    write_hll_state(spark, corpus0, path, p=8)
    b = spark.createDataFrame(
        [(4, "zeta alpha", None, "insert", 10)], SCHEMA
    )
    apply_changelog_hll(spark, b, path, batch_id=1)
    got = sorted(map(tuple, read_hll_registers(spark, path).collect()))
    union = corpus0.unionByName(
        spark.createDataFrame([(4, "zeta alpha")], "doc_id bigint, text string")
    )
    fresh = hll_registers(_tokens(union, "text"), "tok", p=8)
    assert got == sorted(map(tuple, fresh.collect()))


def test_hll_mutations_raise_by_default_union_opt_in(spark, corpus0, tmp_path):
    path = str(tmp_path / "hll")
    write_hll_state(spark, corpus0, path, p=8)
    b1, _ = _batches(spark)
    with pytest.raises(ValueError, match="max-monotone"):
        apply_changelog_hll(spark, b1, path, batch_id=1)
    # union mode merges after images and never loses a register
    before = dict(
        (r["bucket"], r["max_rho"])
        for r in read_hll_registers(spark, path).collect()
    )
    apply_changelog_hll(spark, b1, path, on_mutate="union", batch_id=1)
    after = dict(
        (r["bucket"], r["max_rho"])
        for r in read_hll_registers(spark, path).collect()
    )
    assert all(after.get(b, 0) >= rho for b, rho in before.items())
    with pytest.raises(ValueError, match="on_mutate"):
        apply_changelog_hll(spark, b1, path, on_mutate="bogus")


def test_bloom_insert_only_matches_fresh_bits_and_screen(spark, corpus0, tmp_path):
    from siddhi_io_cdc_spark.functions.sketch import bloom_bits
    from siddhi_io_cdc_spark.streaming.sketch import (
        apply_changelog_bloom,
        bloom_screen,
        foreach_batch_bloom,
        read_bloom_bits,
        write_bloom_state,
    )

    path = str(tmp_path / "bloom")
    write_bloom_state(spark, corpus0, path, m_bits=1024, k=3)
    b = spark.createDataFrame([(4, "zeta alpha", None, "insert", 10)], SCHEMA)
    foreach_batch_bloom(spark, path)(b, 1)
    got = sorted(r["bit"] for r in read_bloom_bits(spark, path).collect())
    union = corpus0.unionByName(
        spark.createDataFrame([(4, "zeta alpha")], "doc_id bigint, text string")
    )
    fresh = bloom_bits(_tokens(union, "text"), "tok", m_bits=1024, k=3)
    assert got == sorted(r["bit"] for r in fresh.collect())
    # screen: no false negatives on ingested tokens; the absent probe
    # misses (1024 bits vs ~7 tokens: collision odds are negligible)
    keys = spark.createDataFrame(
        [("zeta",), ("alpha",), ("never-ingested-zzz",)], "tok string"
    )
    hits = {
        r["tok"]: r["bloom_hit"]
        for r in bloom_screen(spark, path, keys, "tok").collect()
    }
    assert hits == {"zeta": True, "alpha": True, "never-ingested-zzz": False}


def test_bloom_mutations_raise_by_default_union_opt_in(spark, corpus0, tmp_path):
    from siddhi_io_cdc_spark.streaming.sketch import (
        apply_changelog_bloom,
        read_bloom_bits,
        write_bloom_state,
    )

    path = str(tmp_path / "bloom")
    write_bloom_state(spark, corpus0, path, m_bits=1024, k=3)
    b1, _ = _batches(spark)
    with pytest.raises(ValueError, match="OR-monotone"):
        apply_changelog_bloom(spark, b1, path, batch_id=1)
    # union mode only ever ADDS bits (ever-ingested screen semantics)
    before = {r["bit"] for r in read_bloom_bits(spark, path).collect()}
    apply_changelog_bloom(spark, b1, path, on_mutate="union", batch_id=1)
    after = {r["bit"] for r in read_bloom_bits(spark, path).collect()}
    assert before <= after
    # replay: marker skip leaves the state unchanged
    apply_changelog_bloom(spark, b1, path, on_mutate="union", batch_id=1)
    assert {r["bit"] for r in read_bloom_bits(spark, path).collect()} == after


def test_versioned_state_single_live_dir(spark, corpus0, tmp_path):
    # after several applies exactly one state-* version remains (GC) and
    # the pointer names it
    import json
    import os

    path = str(tmp_path / "cms")
    write_cms_state(spark, corpus0, path, width=64, depth=3)
    b1, b2 = _batches(spark)
    apply_changelog_cms(spark, b1, path, batch_id=1)
    apply_changelog_cms(spark, b2, path, batch_id=2)
    dirs = [d for d in os.listdir(path) if d.startswith("state-")]
    assert dirs == ["state-2"]
    ptr = json.load(open(os.path.join(path, "_current.json")))
    assert ptr == {"dir": "state-2", "batch_id": 2}


def _qhist_rows(spark, path):
    from siddhi_io_cdc_spark.streaming.sketch import read_qhist

    return {
        (r["bucket"]): r["cnt"] for r in read_qhist(spark, path).collect()
    }


def test_qhist_maintained_equals_fresh_sketch(spark, corpus0, tmp_path):
    """Length-histogram linearity: after two changelog batches (with an
    intra-batch insert+update chain) the maintained counters equal a fresh
    quantile_histogram over the hand-applied final corpus, and the served
    quantiles match the batch estimator over that rebuild."""
    from siddhi_io_cdc_spark.functions.sketch import (
        quantile_estimates,
        quantile_histogram,
    )
    from siddhi_io_cdc_spark.streaming.sketch import (
        apply_changelog_qhist,
        qhist_quantiles,
        write_qhist_state,
    )

    path = str(tmp_path / "qh")
    write_qhist_state(spark, corpus0, path, lo=0.0, hi=64.0, bins=32)
    b1, b2 = _batches(spark)
    apply_changelog_qhist(spark, b1, path, batch_id=1)
    apply_changelog_qhist(spark, b2, path, batch_id=2)
    fresh = quantile_histogram(
        _final_corpus(spark).select(F.length("text").alias("__v")),
        "__v", 0.0, 64.0, 32,
    )
    assert _qhist_rows(spark, path) == {
        r["bucket"]: r["cnt"] for r in fresh.collect()
    }
    got = {r["q"]: r["estimate"]
           for r in qhist_quantiles(spark, path, [0.25, 0.5, 0.9]).collect()}
    want = {r["q"]: r["estimate"]
            for r in quantile_estimates(fresh, [0.25, 0.5, 0.9],
                                        0.0, 64.0, 32).collect()}
    assert got == want


def test_qhist_replay_and_guard(spark, corpus0, tmp_path):
    from siddhi_io_cdc_spark.streaming.sketch import (
        apply_changelog_qhist,
        write_qhist_state,
    )

    path = str(tmp_path / "qh")
    write_qhist_state(spark, corpus0, path, lo=0.0, hi=64.0, bins=32)
    b1, _ = _batches(spark)
    apply_changelog_qhist(spark, b1, path, batch_id=7)
    before = _qhist_rows(spark, path)
    apply_changelog_qhist(spark, b1, path, batch_id=7)  # replay: no-op
    assert _qhist_rows(spark, path) == before
    null_before = spark.createDataFrame(
        [(2, "changed", None, "update", 30)], SCHEMA
    )
    with pytest.raises(ValueError, match="NULL"):
        apply_changelog_qhist(spark, null_before, path, batch_id=8)


def test_qhist_quantiles_refuse_negative_drifted_state(spark, tmp_path):
    """A delete for a never-ingested document leaves a negative counter —
    legal for the linear (turnstile) state, undefined for quantile
    serving: qhist_quantiles must fail loudly, not interpolate over a
    non-monotone cumulative."""
    from siddhi_io_cdc_spark.streaming.sketch import (
        apply_changelog_qhist,
        qhist_quantiles,
        write_qhist_state,
    )

    path = str(tmp_path / "qh")
    empty = spark.createDataFrame([], SCHEMA)
    write_qhist_state(spark, empty, path, lo=0.0, hi=64.0, bins=32)
    orphan_delete = spark.createDataFrame(
        [(99, None, "ghost document text", "delete", 10)], SCHEMA
    )
    apply_changelog_qhist(spark, orphan_delete, path, batch_id=1)
    with pytest.raises(ValueError, match="negative counter"):
        qhist_quantiles(spark, path, [0.5]).collect()


def test_qhist_foreach_batch_adapter(spark, corpus0, tmp_path):
    from siddhi_io_cdc_spark.streaming.sketch import (
        foreach_batch_qhist,
        write_qhist_state,
    )

    path = str(tmp_path / "qh")
    write_qhist_state(spark, corpus0, path, lo=0.0, hi=64.0, bins=32)
    b1, _ = _batches(spark)
    foreach_batch_qhist(spark, path)(b1, 1)
    assert sum(_qhist_rows(spark, path).values()) == 3  # docs 1, 2, 4
