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

import os
import shutil
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


def pre_image_periods(
    fact: DataFrame,
    batch: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    keys: list[str],
) -> list[tuple[str, str]]:
    """The (agg_type, period_bucket) tuples of the fact rows ``batch``
    is about to REPLACE (semi-join on the upsert keys) — collected
    EAGERLY, before the upsert rewrites the fact table, so the frame
    can never lazily evaluate against post-upsert files. Needed
    because the keyed upsert permits UPDATES: if a re-delivered key's
    event time moved, the row leaves its old period, and that period
    must be recomputed too or the grain silently keeps the removed
    row's contribution and diverges from a full rebuild. Bounded like
    the batch-side collect: matched rows ≤ batch keys, and only their
    distinct periods come back."""
    matched = fact.join(batch.select(*keys).distinct(), on=keys, how="left_semi")
    rows = (
        with_bucket(build(matched))
        .select(*GRAIN_PARTITIONING)
        .distinct()
        .collect()
    )
    return [(r["agg_type"], r["period_bucket"]) for r in rows]


def refresh_grain(
    raw: DataFrame,
    batch: DataFrame,
    build: Callable[[DataFrame], DataFrame],
    path: str,
    date_col: str,
    extra_affected: list[tuple[str, str]] | None = None,
) -> int:
    """Refresh the grain table at ``path`` for the periods ``batch``
    touches. ``raw`` is the COMPLETE fact table (batch already landed
    in it); returns the number of (agg_type, period_bucket)
    directories rewritten (0 = empty batch, nothing touched).
    ``extra_affected`` adds pre-computed period tuples to the affected
    set — the caller passes :func:`pre_image_periods` when the fact
    maintenance allows a key's event time to change (see there).

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
    batch_rows = (
        with_bucket(build(batch))
        .select(*GRAIN_PARTITIONING)
        .distinct()
        .collect()
    )
    affected = {(r["agg_type"], r["period_bucket"]) for r in batch_rows}
    affected |= set(extra_affected or [])
    if not affected:
        return 0
    if any(bucket is None for _, bucket in affected):
        raise ValueError(
            f"grain refresh at {path} got a NULL {date_col}: a NULL date "
            "cannot address a grain period; repair or drop null-dated "
            "rows before the refresh"
        )
    years = sorted({bucket[:4] for _, bucket in affected})
    lo = f"{years[0]}-01-01"
    hi = f"{int(years[-1]) + 1}-01-01"
    scoped = raw.where(
        (F.col(date_col) >= F.lit(lo).cast("timestamp"))
        & (F.col(date_col) < F.lit(hi).cast("timestamp"))
    )
    keys_by_type: dict[str, list[str]] = {}
    for agg_type, bucket in affected:
        keys_by_type.setdefault(agg_type, []).append(bucket)
    regrained = with_bucket(build(scoped))
    cond = None
    for agg_type, keys in keys_by_type.items():
        clause = (F.col("agg_type") == agg_type) & F.col(
            "period_bucket"
        ).isin(sorted(keys))
        cond = clause if cond is None else (cond | clause)
    # persisted: the write and the emptied-period probe below both
    # consume it, and re-running the aggregation would double the
    # refresh cost (grain rows are tiny — periods × groups)
    fresh = regrained.where(cond).persist()
    try:
        # route each bucket to ONE task → one file per rewritten
        # directory (32 agg tasks × partitionBy otherwise fan out to
        # many small files per dir)
        overwrite_partitions(
            fresh.repartition(*[F.col(c) for c in GRAIN_PARTITIONING]),
            path,
            GRAIN_PARTITIONING,
        )
        # An affected period the recompute produced NO rows for (its
        # last fact row moved away) gets no directory from the dynamic
        # overwrite, so its stale grain dir must be removed explicitly
        # or the removed contribution lives on. Bucket values are plain
        # yyyy-MM strings, so the leaf path needs no escaping.
        recomputed = {
            (r["agg_type"], r["period_bucket"])
            for r in fresh.select(*GRAIN_PARTITIONING).distinct().collect()
        }
    finally:
        fresh.unpersist()
    for agg_type, bucket in affected - recomputed:
        stale = os.path.join(
            path, f"agg_type={agg_type}", f"period_bucket={bucket}"
        )
        shutil.rmtree(stale, ignore_errors=True)
    return len(affected)
