"""Shared plan-shaping helpers for CPU-bound stages."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure a CPU-bound stage (Python UDF, heavy array expressions)
    gets cluster parallelism.

    Two ways a frame arrives under-partitioned: a small table is one
    scan partition, and AQE coalesces post-shuffle partitions toward
    the 64 MB advisory size — both are byte-oriented policies that
    serialize compute-per-row work on one core. An EXPLICIT
    repartition(n) is exempt from AQE coalescing, so it sticks. At
    real scale the input already has ≥ cores partitions and this is a
    no-op (checking the partition count costs only plan conversion,
    no job)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
