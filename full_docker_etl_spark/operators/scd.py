"""Slowly-changing-dimension maintenance (SCD Type 2): keep full
attribute HISTORY per key as (valid_from, valid_to] intervals instead
of overwriting — the warehouse pattern behind every "what did this
customer look like when the order shipped" question. Pairs with the
as-of join (``operators/temporal.py``) for point-in-time enrichment.

The reference overwrites dimension rows in place (Mongo upserts),
losing history; this is the lake-shape alternative, composable with
:class:`~full_docker_etl_spark.sources.sinks.VersionedTable` for
atomic publishes of each application.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    history: DataFrame | None,
    updates: DataFrame,
    key: str,
    batch_ts,
    attrs: list[str],
) -> DataFrame:
    """Apply one update batch to an SCD2 history frame.

    ``history`` columns: ``key, *attrs, valid_from, valid_to``
    (``valid_to`` NULL = current row); pass ``None`` to initialize.
    ``updates`` carries one row per key (dedupe upstream —
    ``natural_key_dedup`` — a batch with two versions of a key would
    make "the" new value ambiguous). ``batch_ts`` is the batch's
    effective timestamp (a Column or literal).

    Semantics per key: a NEW key opens a current row; a matched key
    whose attributes CHANGED closes the old row (``valid_to`` =
    batch_ts) and opens a new one; an unchanged key is left alone (no
    churn — re-delivering the same batch is a no-op, which is what
    makes the apply idempotent under replay). Closed history rows pass
    through untouched.

    Scale shape: ONE key-partitioned join between the current slice
    and the batch (closed rows never join — they filter out first),
    null-safe struct compare for change detection, and a unionByName
    of the four row classes; no window, no global sort. At 100 TB the
    current slice is |keys| rows, the history table append-mostly —
    partition the backing table by a key hash bucket and both join
    sides co-locate. Chain applications through a MATERIALIZED table
    (write each result before applying the next batch — what any real
    pipeline does anyway): stacking the raw plans of repeated applies
    can trip Spark's PartitioningCollection same-numPartitions check
    on the unioned full-outer outputs. If chaining IN-MEMORY instead
    (tests, micro-batch loops), materialize each result with
    :func:`~full_docker_etl_spark.operators.util.fresh_checkpoint`,
    not a plain ``localCheckpoint``: checkpoint carries the origin
    plan's size estimate forward and the per-apply join then
    compounds it multiplicatively — by a few dozen chained applies
    the driver drowns in BigInteger stats arithmetic (the
    connected-components chaining pathology; see fresh_checkpoint)."""
    ts = batch_ts if isinstance(batch_ts, Column) else F.lit(batch_ts)
    fresh = updates.select(
        key,
        *attrs,
        ts.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    if history is None:
        return fresh
    closed = history.where(F.col("valid_to").isNotNull())
    current = history.where(F.col("valid_to").isNull())

    cur_attrs = F.struct(*[F.col(f"__cur.{a}") for a in attrs])
    upd_attrs = F.struct(*[F.col(f"__upd.{a}") for a in attrs])
    joined = current.alias("__cur").join(
        updates.alias("__upd"),
        on=F.col(f"__cur.{key}") == F.col(f"__upd.{key}"),
        how="full_outer",
    )
    changed = ~cur_attrs.eqNullSafe(upd_attrs)

    # class 1: current rows with no update, or an update that changed
    # nothing → survive as-is
    keep_current = joined.where(
        F.col(f"__cur.{key}").isNotNull()
        & (F.col(f"__upd.{key}").isNull() | ~changed)
    ).select("__cur.*")
    # class 2: current rows superseded by a real change → closed
    close_now = joined.where(
        F.col(f"__cur.{key}").isNotNull()
        & F.col(f"__upd.{key}").isNotNull()
        & changed
    ).select(
        *[F.col(f"__cur.{c}") for c in [key, *attrs, "valid_from"]],
        ts.alias("valid_to"),
    )
    # class 3: new keys, or changed keys' fresh row → open
    open_now = joined.where(
        F.col(f"__upd.{key}").isNotNull()
        & (F.col(f"__cur.{key}").isNull() | changed)
    ).select(
        F.col(f"__upd.{key}").alias(key),
        *[F.col(f"__upd.{a}").alias(a) for a in attrs],
        ts.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return (
        closed.unionByName(keep_current)
        .unionByName(close_now)
        .unionByName(open_now)
    )
