"""Temporal joins (SURVEY.md §2.3 closing note: range/as-of joins
"fall out of between-predicates on the time-series table") — the two
operators every OHLCV/event workload eventually needs, composed from
existing DataFrame ops so Catalyst keeps optimizing them.

- :func:`asof_join` — for each left row, the most recent right row at
  or before it (per key). Implemented as union + last-ignoring-nulls
  window: ONE shuffle on (key), no inequality join, no explosion —
  the classic distributed as-of formulation.
- :func:`range_join_bucketed` — left rows joined to right rows within
  a trailing time window, via time-bucket blocking: each left row
  probes ⌈window/bucket⌉+1 buckets instead of the whole key history.
  A naive inequality join degenerates to per-key cartesian; the
  bucket join keeps candidates proportional to the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """Left as-of join: attach the latest ``right_vals`` with
    ``right_ts`` <= ``left_ts`` per ``key`` (ties: the right row sorts
    first, so equality matches — ASOF semantics). Right rows must be
    unique per (key, ts); pre-dedup if not, or the match is ambiguous.

    The matched row's values are carried AS A ROW — ``right_vals``
    pack into ONE struct and the last-ignorenulls window fills the
    struct, so a NULL inside the latest matched row comes through as
    NULL (per-column filling would skip it and stitch values from
    DIFFERENT right rows — not any row that ever existed, and not what
    a SQL ASOF JOIN returns). Right rows with a NULL timestamp have no
    position on the timeline and are excluded (nulls-first ordering
    would otherwise make them precede — and leak into — everything);
    left rows with a NULL timestamp survive with NULL values.
    ``right_vals`` may not collide with left columns — the collision
    previously made every left row silently re-read its OWN value."""
    reserved = {"__is_left", "__ts", "__rv"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join: reserved column name(s) {sorted(clash)}")
    overlap = set(right_vals) & set(left.columns)
    if overlap:
        raise ValueError(
            f"asof_join: right_vals {sorted(overlap)} already exist on the "
            "left side — rename before joining (the window would fill "
            "each left row from its own value, silently)"
        )
    r_tag = (
        right.where(F.col(right_ts).isNotNull())
        .select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            F.struct(*[F.col(c) for c in right_vals]).alias("__rv"),
        )
        .withColumn("__is_left", F.lit(0))
    )
    rv_type = r_tag.schema["__rv"].dataType
    l_tag = (
        left.withColumn("__is_left", F.lit(1))
        .withColumn("__ts", F.col(left_ts))
        .withColumn("__rv", F.lit(None).cast(rv_type))
    )
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows sort before left rows at equal ts → "at or before"
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = unioned.withColumn("__rv", F.last("__rv", ignorenulls=True).over(w))
    out = out.where(F.col("__is_left") == 1)
    for c in right_vals:
        out = out.withColumn(c, F.col("__rv")[c])
    return out.drop("__is_left", "__ts", "__rv")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_us: int,
    bucket_us: int | None = None,
) -> DataFrame:
    """Pairs (left, right) with the SAME key and ``right_ts`` in
    ``(left_ts - window_us, left_ts]`` (timestamps as epoch-micro
    longs). Blocking: right rows land in one bucket, left rows probe
    every bucket overlapping their trailing window, the exact
    predicate filters inside buckets."""
    if "__bucket" in left.columns or "__bucket" in right.columns:
        raise ValueError(
            "range_join_bucketed: reserved column name '__bucket' in input"
        )
    bucket_us = bucket_us or window_us
    # A trailing window of length W starting anywhere in a bucket spans
    # at most ceil(W/B)+1 buckets (inclusive of its own).
    n_probe = -(-window_us // bucket_us) + 1
    r = right.withColumn(
        "__bucket", (F.col(right_ts) / F.lit(bucket_us)).cast("long")
    )
    probes = F.array(
        *[
            ((F.col(left_ts) / F.lit(bucket_us)).cast("long") - F.lit(i))
            for i in range(n_probe)
        ]
    )
    l = left.withColumn("__bucket", F.explode(probes))
    joined = l.join(r, on=[key, "__bucket"]).where(
        (F.col(right_ts) <= F.col(left_ts))
        & (F.col(right_ts) > F.col(left_ts) - F.lit(window_us))
    )
    return joined.drop("__bucket")
