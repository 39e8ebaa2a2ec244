"""Small shared DataFrame utilities."""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame

# Cache-lifetime bookkeeping for multi-reference pipelines (minhash/simhash/
# n-gram/embedding near-dup): those operators MUST persist intermediates that
# feed both sides of a self-join, but a long-lived session running repeated
# curation jobs would otherwise accrete cached blocks until eviction
# pressure. Two release mechanisms, combinable:
#
# - ``cache_scope()``: every ``scoped_persist`` inside the ``with`` block is
#   unpersisted at exit — use around a whole job.
# - ``release_caches(result)``: pipelines tag their result DataFrame with the
#   intermediates built for it; call after materializing (collect/write) to
#   free them immediately.
#
# Unpersisting is always safe for correctness — a re-evaluated result merely
# recomputes.

_SCOPES: list[list[DataFrame]] = []
_CACHE_TAG = "_siddhi_cached_deps"


def scoped_persist(df: DataFrame) -> DataFrame:
    """``persist()`` that registers with the innermost :func:`cache_scope`."""
    df = df.persist()
    if _SCOPES:
        _SCOPES[-1].append(df)
    return df


def tag_caches(result: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Record ``deps`` (persisted intermediates) on ``result`` for
    :func:`release_caches`."""
    setattr(result, _CACHE_TAG, list(deps))
    return result


def release_caches(result: DataFrame) -> None:
    """Unpersist the intermediates a pipeline cached to build ``result``.

    Call after the result is materialized (collected / written); evaluating
    the result again afterwards recomputes instead of reading cache."""
    for df in getattr(result, _CACHE_TAG, []):
        df.unpersist()
    setattr(result, _CACHE_TAG, [])


@contextlib.contextmanager
def cache_scope():
    """Release every pipeline-internal persist created inside the block."""
    scope: list[DataFrame] = []
    _SCOPES.append(scope)
    try:
        yield
    finally:
        _SCOPES.remove(scope)
        for df in scope:
            df.unpersist()


_AQE_LOCK = __import__("threading").Lock()
_AQE_STATE: dict[int, tuple[int, str]] = {}  # id(session) -> (depth, saved)


@contextlib.contextmanager
def aqe_off(spark):
    """Scope ``spark.sql.adaptive.enabled=false`` around a driver-side
    training loop (the loops reduce to 1-row/model-sized actions AQE can't
    improve but taxes with re-planning barriers), re-entrantly and
    race-free across threads: concurrent scopes on one session share a
    single save/restore (first entry saves the prior value, last exit
    restores it), so two trainers can no longer race the toggle and leave
    AQE off after both return. The conf is still SESSION-global — an
    unrelated query PLANNED while any scope is open loses AQE for that one
    plan. That is perf-only (results unaffected) and accepted; the engine's
    own background threads (KN scorers) only run collects on
    already-planned, checkpoint-leaf tables inside such windows."""
    key = id(spark)
    with _AQE_LOCK:
        depth, saved = _AQE_STATE.get(key, (0, "true"))
        if depth == 0:
            saved = spark.conf.get("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        _AQE_STATE[key] = (depth + 1, saved)
    try:
        yield
    finally:
        with _AQE_LOCK:
            depth, saved = _AQE_STATE[key]
            if depth == 1:
                spark.conf.set("spark.sql.adaptive.enabled", saved)
                del _AQE_STATE[key]
            else:
                _AQE_STATE[key] = (depth - 1, saved)


#: Plan-stats bytes of per-slot work below which the widening shuffle is
#: skipped: the narrow compute then finishes faster than the extra stage +
#: exchange cost. Measured calibration (two rounds): at sf0.1 (584 KiB
#: documents → 8-18 KiB/core after column pruning) the always-on shuffle
#: taxed the r7 bench ~0.4-1.3 s per text query, so those stay narrow; at
#: sf2 (~150 KiB/core) widening is a 10× wall-time win (gopher_quality
#: 15.3 s → 1.5 s, BASELINE.md round-7 section). The r16 sf1 series found
#: the old 128 KiB threshold straddled the middle: sf1's pruned estimate
#: (2.45 MiB → 77 KiB/core) skipped the widening and serialized a ~7 s
#: tokenize+explode onto the scan's 2 row-group partitions — slower in
#: absolute terms than the same query at sf2 — while an explicit widening
#: measured 6.1-10.8 s → 2.2-2.8 s (~3×, paired in-session). The estimate
#: is COMPRESSED, COLUMN-PRUNED scan bytes, ~5-10× under the in-flight
#: decompressed text it predicts, so 32 KiB of estimate per core ≈ a few
#: hundred KiB of real per-core work — comfortably above the measured
#: shuffle tax, comfortably below the measured serialization cliff.
#: Production override: SPARK_GRAFT_FANOUT_MIN_SLOT_KIB (KiB per slot).
MIN_FAN_OUT_BYTES_PER_SLOT = (
    int(__import__("os").environ.get("SPARK_GRAFT_FANOUT_MIN_SLOT_KIB", "32"))
    * 1024
)


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the optimized plan (for a scan:
    sum of file sizes × compression factor; for a local relation: rows ×
    row-width). None when unavailable — callers treat unknown as large."""
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return None
    # Long.MaxValue-ish sentinels mean "no estimate"
    return None if size >= (1 << 62) else size


def fan_out(
    df: DataFrame,
    num_partitions: int | None = None,
    min_bytes_per_slot: int | None = None,
) -> DataFrame:
    """Ensure CPU-heavy narrow stages actually parallelize.

    A small/compact parquet input can arrive in a handful of partitions
    (row-group granularity), which serializes narrow per-row compute (JSON
    parsing, shingling, hashing) on a many-core executor. Repartition UP to
    the session's default parallelism before the heavy work — but never
    DOWN: a 100 TB input already carrying thousands of partitions must not
    be collapsed (the shuffle would dwarf the win), so this is a no-op
    there.

    The widening is ALSO skipped when the estimated per-core work is below
    the shuffle's own cost (``min_bytes_per_slot`` of plan-stats bytes per
    target partition): round-robin-shuffling a few hundred KiB to 32 cores
    costs more scheduling than the narrow compute it parallelizes. Unknown
    sizes (no stats) widen as before — the conservative choice for the
    scale this engine targets. ``min_bytes_per_slot=None`` (default) reads
    ``MIN_FAN_OUT_BYTES_PER_SLOT`` at CALL time, so the threshold stays
    env-tunable (a definition-time default froze the constant into the
    signature and silently ignored overrides).
    """
    if min_bytes_per_slot is None:
        min_bytes_per_slot = MIN_FAN_OUT_BYTES_PER_SLOT
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is not None and size < parts * min_bytes_per_slot:
        return df
    if df.rdd.getNumPartitions() < parts:
        return df.repartition(parts)
    return df
