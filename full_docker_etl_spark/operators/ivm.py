"""Incremental materialized-view maintenance for the day/month/year
grain family (SURVEY §4.2.2's materialized grain table, kept fresh
without full rebuilds).

The reference rebuilds every grain collection from scratch on each
scheduled run (its Load stage is a full table copy). At 100 TB the
grain table must instead be REFRESHED: when a batch of new fact rows
arrives, only the periods that batch touches are recomputed — from a
fact read pruned to the touched years — and only those period
directories are rewritten (dynamic partition overwrite). Everything
else on disk is untouched (pinned by inode in tests), and the result
is bit-identical to a full rebuild (pinned by the driver oracle, which
recomputes the ENTIRE grain from scratch in SQL).

Contract with ``build``: it maps a fact DataFrame to grain rows with
``agg_type ∈ {day, month, year}`` and ``period_key`` a prefix of
``yyyy-MM-dd`` — the flagship multigrain shape. Aggregates may be any
per-period function (not just distributive ones): correctness comes
from RECOMPUTING each affected period from the pruned fact read, never
from merging partial states.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_docker_etl_spark.sources.sinks import overwrite_partitions

GRAIN_PARTITIONING = ("agg_type", "period_bucket")


def with_bucket(grain: DataFrame) -> DataFrame:
    """Attach the storage partition column: ``period_bucket`` =
    yyyy-MM prefix of the period key. Partitioning raw period keys
    directly means one directory PER DAY — thousands of tiny
    directories whose file-creation overhead dominates the backfill
    (measured 55 s vs 8 s at sf0.01). Month buckets bound the
    directory count at 12/year/grain while keeping the refresh scope
    tight (a touched day rewrites its month's directory — recomputed
    identically from the pruned fact read, so correctness is
    unaffected)."""
    return grain.withColumn(
        "period_bucket", F.substring(F.col("period_key"), 1, 7)
    )


def refresh_grain(
    raw: DataFrame,
    batch: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    path: str,
    date_col: str,
) -> int:
    """Refresh the grain table at ``path`` for the periods ``batch``
    touches. ``raw`` is the COMPLETE fact table (batch already landed
    in it); returns the number of (agg_type, period_bucket)
    directories rewritten (0 = empty batch, nothing touched).

    Scale shape, step by step:
    - affected periods come from running ``build`` on the BATCH alone
      (a batch is a day/month of data — its distinct periods are a
      handful of rows; the collect is bounded by that, not the corpus);
    - the fact re-read is pruned to the contiguous year span covering
      the affected periods — a plain ``date_col`` range predicate that
      pushes down to the parquet scan (year grains need their whole
      year of fact rows, so the year span is the exact lower bound of
      what any correct refresh must read);
    - the recompute keeps ONLY affected (agg_type, period_bucket)
      tuples (per-agg-type isin — same static-prune shape as the
      scoped merge), so the dynamic partition overwrite replaces
      exactly those month-bucket directories and no others.
    """
    affected = (
        with_bucket(build(batch))
        .select(*GRAIN_PARTITIONING)
        .distinct()
        .collect()
    )
    if not affected:
        return 0
    years = sorted({row["period_bucket"][:4] for row in affected})
    lo = f"{years[0]}-01-01"
    hi = f"{int(years[-1]) + 1}-01-01"
    scoped = raw.where(
        (F.col(date_col) >= F.lit(lo).cast("timestamp"))
        & (F.col(date_col) < F.lit(hi).cast("timestamp"))
    )
    keys_by_type: dict[str, list[str]] = {}
    for row in affected:
        keys_by_type.setdefault(row["agg_type"], []).append(
            row["period_bucket"]
        )
    regrained = with_bucket(build(scoped))
    cond = None
    for agg_type, keys in keys_by_type.items():
        clause = (F.col("agg_type") == agg_type) & F.col(
            "period_bucket"
        ).isin(sorted(keys))
        cond = clause if cond is None else (cond | clause)
    # route each bucket to ONE task → one file per rewritten directory
    # (32 agg tasks × partitionBy otherwise fan out to many small
    # files per dir; grain rows are tiny, the extra exchange is noise)
    overwrite_partitions(
        regrained.where(cond).repartition(
            *[F.col(c) for c in GRAIN_PARTITIONING]
        ),
        path,
        GRAIN_PARTITIONING,
    )
    return len(affected)
