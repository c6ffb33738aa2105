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


def release_checkpoint(df: DataFrame) -> None:
    """Release the block storage behind a ``localCheckpoint``'d frame.

    Iterative operators truncate lineage with an eager localCheckpoint
    per round; the backing RDD blocks stay pinned in executor storage
    for the whole session unless explicitly unpersisted (neither
    ``spark.catalog.clearCache()`` nor cleanup-on-GC reaches them
    promptly from Python). Call this on the PREVIOUS round's
    checkpointed frame once the next round is materialized — after
    release the frame is NOT recomputable (the checkpoint cut its
    lineage), so it must never be referenced again.

    ``df`` must be the direct localCheckpoint result (its analyzed
    plan is the LogicalRDD holding the persisted RDD); anything else
    is left untouched. Best-effort: failures are swallowed — a leaked
    block degrades performance, a raise here would fail a correct
    query."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
