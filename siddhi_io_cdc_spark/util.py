"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Ensure CPU-heavy narrow stages actually parallelize.

    A small/compact parquet input can arrive in a handful of partitions
    (row-group granularity), which serializes narrow per-row compute (JSON
    parsing, shingling, hashing) on a many-core executor. Repartition UP to
    the session's default parallelism before the heavy work — but never
    DOWN: a 100 TB input already carrying thousands of partitions must not
    be collapsed (the shuffle would dwarf the win), so this is a no-op
    there.
    """
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parts:
        return df.repartition(parts)
    return df
