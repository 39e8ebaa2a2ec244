"""HyperLogLog / count-min sketch: accuracy, determinism, mergeability."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.sketch import (
    cms_point_estimates,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


@pytest.fixture(scope="module")
def stream(spark):
    # 5000 distinct keys, each appearing 1 + (k % 3) times -> 10k rows
    return spark.range(5000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("tok"),
        F.explode(F.sequence(F.lit(0), F.col("id") % 3)).alias("rep"),
    ).select("tok").persist()


def test_hll_accuracy_and_determinism(spark, stream):
    est1 = hll_distinct(stream, "tok", p=8).collect()[0]
    est2 = hll_distinct(stream, "tok", p=8).collect()[0]
    assert est1 == est2  # md5-derived: bit-deterministic across runs
    # p=8 -> sigma ~ 1.04/sqrt(256) = 6.5%; 5000 distinct
    assert abs(est1["n_distinct_est"] - 5000) / 5000 < 0.15
    assert 0 < est1["n_buckets_set"] <= 256


def test_hll_repetitions_do_not_move_registers(spark, stream):
    once = stream.distinct()
    r_all = sorted(map(tuple, hll_registers(stream, "tok", p=8).collect()))
    r_once = sorted(map(tuple, hll_registers(once, "tok", p=8).collect()))
    assert r_all == r_once


def test_hll_linear_counting_small_range(spark):
    small = spark.range(10).select(F.col("id").cast("string").alias("tok"))
    est = hll_distinct(small, "tok", p=8).collect()[0]
    # linear-counting branch: essentially exact at 10 << 256 registers
    assert abs(est["n_distinct_est"] - 10) <= 1


def test_hll_merge_is_register_max(spark, stream):
    a = stream.where(F.substring("tok", 5, 1).isin("0", "1", "2"))
    b = stream.where(~F.substring("tok", 5, 1).isin("0", "1", "2"))
    merged = (
        hll_registers(a, "tok", p=8)
        .unionByName(hll_registers(b, "tok", p=8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(stream, "tok", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # and the estimate off the merged registers matches the one-shot path
    assert (
        hll_estimate(merged, p=8).collect()
        == hll_distinct(stream, "tok", p=8).collect()
    )


def test_hll_grouped(spark):
    df = spark.range(600).select(
        F.when(F.col("id") < 200, "en").otherwise("de").alias("lang"),
        F.concat(
            F.lit("w"),
            F.when(F.col("id") < 200, F.col("id") % 20)
            .otherwise(F.col("id") % 50)
            .cast("string"),
        ).alias("tok"),
    )
    out = {
        r["lang"]: r["n_distinct_est"]
        for r in hll_distinct(df, "tok", p=8, group_cols=["lang"]).collect()
    }
    # en: 20 distinct, de: 50 distinct — linear-counting regime, ~±15%
    assert abs(out["en"] - 20) <= 4 and abs(out["de"] - 50) <= 8


def test_hll_null_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "tok string")
    est = hll_distinct(df, "tok", p=8).collect()[0]
    assert abs(est["n_distinct_est"] - 2) <= 1


def test_cms_never_underestimates_and_is_exact_when_sparse(spark, stream):
    exact = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    sk = cms_sketch(stream, "tok", width=4096, depth=4)
    est = cms_point_estimates(
        sk, exact, "tok", width=4096, depth=4
    )
    bad = est.where(F.col("cms_est") < F.col("cnt")).count()
    assert bad == 0  # one-sided error: min over rows never undercounts
    # 5000 keys in 4 x 4096 counters: collisions exist, but most keys exact
    exact_frac = est.where(F.col("cms_est") == F.col("cnt")).count() / 5000
    assert exact_frac > 0.5


def test_cms_absent_key_estimates_zero_or_collision(spark, stream):
    sk = cms_sketch(stream, "tok", width=4096, depth=4)
    absent = spark.createDataFrame([("nope",)], "tok string")
    est = cms_point_estimates(sk, absent, "tok", width=4096, depth=4).collect()
    assert est[0]["cms_est"] >= 0  # >= 0 always; usually 0


def test_cms_merge_is_counter_sum(spark, stream):
    a = stream.where(F.substring("tok", 5, 1).isin("0", "1", "2"))
    b = stream.where(~F.substring("tok", 5, 1).isin("0", "1", "2"))
    merged = (
        cms_sketch(a, "tok", width=512, depth=4)
        .unionByName(cms_sketch(b, "tok", width=512, depth=4))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_sketch(stream, "tok", width=512, depth=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_validates(spark, stream):
    with pytest.raises(ValueError):
        cms_sketch(stream, "tok", width=0)
    with pytest.raises(ValueError):
        hll_registers(stream, "tok", p=3)


def test_bloom_no_false_negatives_and_rare_false_positives(spark, stream):
    from siddhi_io_cdc_spark.functions.sketch import (
        bloom_bits,
        bloom_maybe_contains,
    )

    present = stream.distinct()
    bits = bloom_bits(stream, "tok", m_bits=65536, k=3)
    hits = bloom_maybe_contains(bits, present, "tok", m_bits=65536, k=3)
    assert hits.where(~F.col("bloom_hit")).count() == 0  # no false negatives
    absent = spark.range(500).select(
        F.concat(F.lit("absent_"), F.col("id")).alias("tok")
    )
    fp = bloom_maybe_contains(bits, absent, "tok", m_bits=65536, k=3)
    # 5000 keys * 3 hashes in 65536 bits -> fpr ~ (1-e^-0.23)^3 ~ 0.9%
    assert fp.where(F.col("bloom_hit")).count() < 25


def test_bloom_duplicated_probe_keys_no_false_negative(spark, stream):
    """Round-10 verdict finding #1: a present key probed TWICE must still
    report bloom_hit=true. The old probe compared the set-bit count to the
    literal ``k`` — a duplicated key's group holds 2k probe rows, 2k != k,
    so a key that IS in the filter came back false (a false negative from
    the one structure whose guarantee is no-false-negatives). The probe
    now compares against the per-group probe count."""
    from siddhi_io_cdc_spark.functions.sketch import (
        bloom_bits,
        bloom_maybe_contains,
    )

    bits = bloom_bits(stream, "tok", m_bits=65536, k=3)
    # Pin ONE row deterministically: limit(1) without ordering is
    # nondeterministic and each union branch re-evaluates independently,
    # so three limit(1) branches are not guaranteed to be the same row.
    one = stream.select("tok").orderBy("tok").first()
    dup_present = spark.createDataFrame([one] * 3, ["tok"])
    hits = bloom_maybe_contains(bits, dup_present, "tok", m_bits=65536, k=3)
    rows = hits.collect()
    # duplicates collapse to one row per distinct key row, and it's a hit
    assert len(rows) == 1 and rows[0]["bloom_hit"] is True
    # a duplicated ABSENT key still reports false (no new false positives)
    absent = spark.createDataFrame(
        [("definitely_absent_xyz",)] * 4, ["tok"]
    )
    fp = bloom_maybe_contains(bits, absent, "tok", m_bits=65536, k=3)
    assert [r["bloom_hit"] for r in fp.collect()] == [False]


def test_bloom_merge_is_bit_union(spark, stream):
    from siddhi_io_cdc_spark.functions.sketch import bloom_bits

    a = stream.where(F.substring("tok", 5, 1).isin("0", "1", "2"))
    b = stream.where(~F.substring("tok", 5, 1).isin("0", "1", "2"))
    merged = (
        bloom_bits(a, "tok", 4096, 3)
        .unionByName(bloom_bits(b, "tok", 4096, 3))
        .distinct()
    )
    whole = bloom_bits(stream, "tok", 4096, 3)
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in whole.collect()
    )


def test_bloom_validates(spark, stream):
    from siddhi_io_cdc_spark.functions.sketch import bloom_bits

    with pytest.raises(ValueError):
        bloom_bits(stream, "tok", m_bits=0)


def test_quantile_histogram_matches_reference(spark):
    """Fixed-bin histogram + interpolated quantiles vs an independent
    Python reference, including out-of-range clamping into the edge bins
    and the q=0 / q=1 edge semantics; estimator error bounded by one bin
    width against exact order statistics; merge-by-sum linearity."""
    import math
    import random
    from collections import Counter

    from siddhi_io_cdc_spark.functions.sketch import (
        quantile_estimates,
        quantile_histogram,
    )

    rng = random.Random(3)
    vals = [rng.gauss(100, 25) for _ in range(4000)] + [-50.0, 1e6]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id bigint, x double"
    )
    LO, HI, B = 0.0, 200.0, 128
    w = (HI - LO) / B
    sk = quantile_histogram(df, "x", LO, HI, B)
    qs = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: r["estimate"]
        for r in quantile_estimates(sk, qs, LO, HI, B).collect()
    }
    c = Counter(min(B - 1, max(0, math.floor((v - LO) / w))) for v in vals)
    N = sum(c.values())

    def ref(q):
        t = q * N
        cum = 0
        for b in sorted(c):
            cum += c[b]
            if cum >= t:
                return round(LO + w * (b + (t - (cum - c[b])) / c[b]), 6)

    assert got == {q: ref(q) for q in qs}
    sv = sorted(vals)
    for q in (0.1, 0.5, 0.9):
        assert abs(got[q] - sv[int(q * len(sv))]) <= 2 * w
    # merge-by-sum: two half-corpus sketches compose to the full sketch
    h1 = quantile_histogram(df.where("id % 2 = 0"), "x", LO, HI, B)
    h2 = quantile_histogram(df.where("id % 2 = 1"), "x", LO, HI, B)
    merged = {
        r["bucket"]: r["cnt"]
        for r in h1.unionByName(h2).groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == {r["bucket"]: r["cnt"] for r in sk.collect()}

    with pytest.raises(ValueError, match="bins"):
        quantile_histogram(df, "x", LO, HI, 0)
    with pytest.raises(ValueError, match="lo < hi"):
        quantile_histogram(df, "x", 5.0, 5.0)
    with pytest.raises(ValueError, match="quantiles"):
        quantile_estimates(sk, [1.5], LO, HI, B)
