"""Structured Streaming over the events table (SURVEY.md §2.10, M6).

The reference's incremental semantics are cron-driven batch loops
(status flags, id-list handoffs — T1-T5). The idiomatic superset is
event-time windowed aggregation with watermarks:

- :func:`tumbling_agg` / :func:`sliding_agg` / :func:`session_agg`
  are pure DataFrame transforms — the SAME function runs on a batch
  frame (oracle-checkable) and on a streaming frame (incremental),
  which is how Structured Streaming is meant to be used.
- :func:`stream_events` wires a parquet-directory source →
  watermark → windowed agg; tests drive it with Trigger.AvailableNow
  into a memory sink and assert it matches the batch run bit-for-bit.

Timestamps surface as epoch seconds/micros (bigint) for engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_start_s(window_col: str = "w") -> F.Column:
    return (F.unix_micros(F.col(f"{window_col}.start")) / 1_000_000).cast("long")


def tumbling_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact decimal
    sum. One shuffle on (window, event_type)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            _bucket_start_s().alias("bucket_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2
    windows) — global per-window counts."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(_bucket_start_s().alias("bucket_s"), "n_events", "sum_value")
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows (gap-based). A new session starts when
    the inter-event gap reaches ``gap`` — [start, last+gap) half-open,
    so an exactly-gap-sized silence splits."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_upsert(
    spark: SparkSession,
    source_dir: str,
    schema,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    versioned: bool = False,
):
    """T5 streaming form: parquet-directory stream → foreachBatch keyed
    upsert into a parquet target. Exactly-once end to end: the
    checkpoint tracks which source files each epoch consumed, and the
    keyed merge is idempotent, so a batch replayed after a failure
    converges instead of duplicating — the standard recipe for
    exactly-once on a non-transactional sink. With ``versioned=True``
    the target is a :class:`VersionedTable` at ``target_path`` and each
    micro-batch commits ATOMICALLY (pointer swap): concurrent readers
    see whole epochs only, never a mid-rewrite table — the
    transactional-sink shape without a lake format. Returns the started
    query (caller awaits termination; tests use AvailableNow)."""
    from full_docker_etl_spark.sources.sinks import VersionedTable, upsert_parquet

    vtable = VersionedTable(target_path) if versioned else None

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Late duplicates within one micro-batch would make the upsert
        # ambiguous — keep a deterministic winner per key first. Prefer
        # event time; without a 'ts' column, order by every non-key
        # column (ordering by the key itself would leave the winner
        # among same-key rows arbitrary across micro-batch replays,
        # breaking the idempotent-replay contract).
        from full_docker_etl_spark.operators.dedup import natural_key_dedup

        if "ts" in batch_df.columns:
            order = [("ts", False)]
        else:
            order = [(c, False) for c in batch_df.columns if c not in keys] or [
                (keys[0], True)
            ]
        cleaned = natural_key_dedup(batch_df, keys, order)
        if vtable is not None:
            vtable.merge(cleaned, keys)
        else:
            upsert_parquet(batch_df.sparkSession, target_path, cleaned, keys)

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events(
    spark: SparkSession,
    source_dir: str,
    schema,
    agg=tumbling_agg,
    watermark: str = "2 hours",
):
    """readStream over a parquet directory with an event-time watermark
    (late data beyond ``watermark`` is dropped; state for closed
    windows is evicted — bounded memory at any scale)."""
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withWatermark("ts", watermark)
    )
    return agg(stream)


def stream_stream_range_join(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "3 days",
    watermark: str = "1 hour",
):
    """Stream-stream interval join: each click pairs with the same
    user's purchases in the trailing ``window`` — the streaming form
    of the batch range join. Both sides carry watermarks and the join
    predicate bounds event time on BOTH ends, so the state store can
    evict: a buffered purchase dies once the watermark passes
    purchase_ts + window; an unmatched click dies at its watermark.
    Without the two-sided time bound the state would grow forever —
    that bound is what makes this run on an unbounded 100 TB/day
    stream. Input frames may be batch OR streaming (same plan either
    way; tests exploit that for stream==batch equality)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    joined = c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            purchase_ts <= click_ts AND
            purchase_ts > click_ts - INTERVAL {window}
            """
        ),
    )
    return joined.select(
        "c_user",
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "purchase_value",
    )


def stream_grain_refresh(
    spark: SparkSession,
    source_dir: str,
    schema,
    fact_path: str,
    grain_path: str,
    build,
    date_col: str,
    keys: list[str],
    checkpoint_dir: str,
):
    """STREAMING materialized-view maintenance: each micro-batch lands
    in the fact table via an IDEMPOTENT keyed upsert, then
    :func:`~full_docker_etl_spark.operators.ivm.refresh_grain`
    recomputes only the grain periods that batch touches. The pair is
    replay-convergent end to end — a re-delivered epoch upserts the
    same keys (no duplicates) and the refresh recomputes affected
    periods FROM the fact table (never merges partial states), so a
    replayed refresh overwrites with identical values instead of
    double-counting. That recompute-from-facts property is what makes
    the exactly-once recipe work on a non-transactional sink; the
    first epoch backfills the grain in full. Returns the started query
    (AvailableNow in tests)."""
    from full_docker_etl_spark.operators.dedup import natural_key_dedup
    from full_docker_etl_spark.operators.ivm import (
        GRAIN_PARTITIONING,
        pre_image_periods,
        refresh_grain,
        with_bucket,
    )
    from full_docker_etl_spark.sources.sinks import upsert_parquet

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        import os

        s = batch_df.sparkSession
        # same fallback ladder as stream_upsert: event time, else every
        # non-key column, else (keys-only frame) the first key — an
        # empty order would make the dedup window unorderable
        order = [("ts", False)] if "ts" in batch_df.columns else (
            [(c, False) for c in batch_df.columns if c not in keys]
            or [(keys[0], True)]
        )
        cleaned = natural_key_dedup(batch_df, keys, order)
        pre_image: list[tuple[str, str]] = []
        if os.path.exists(fact_path):
            # BEFORE the upsert: the periods of the rows this batch
            # replaces. The upsert permits updates, so a re-delivered
            # key whose event time moved leaves its old period — which
            # must be recomputed too, or the grain keeps the removed
            # row's contribution and diverges from a full rebuild.
            pre_image = pre_image_periods(
                s.read.parquet(fact_path), cleaned, build, keys
            )
            upsert_parquet(s, fact_path, cleaned, keys)
        else:
            cleaned.write.parquet(fact_path)
        raw = s.read.parquet(fact_path)
        if not os.path.exists(grain_path):
            with_bucket(build(raw)).repartition(
                *[F.col(c) for c in GRAIN_PARTITIONING]
            ).write.partitionBy(*GRAIN_PARTITIONING).parquet(grain_path)
        else:
            refresh_grain(
                raw,
                cleaned,
                build,
                grain_path,
                date_col,
                extra_affected=pre_image,
            )

    stream = spark.readStream.schema(schema).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_model_scores(
    spark: SparkSession,
    source_dir: str,
    schema,
    odds: DataFrame,
    scalars: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Serve a FROZEN offline-trained quality model on the ingest
    stream — the production split every LLM pipeline runs: nb_train
    on yesterday's corpus (batch), nb_score on today's firehose.
    foreachBatch applies the SAME nb_score used by the batch backfill
    (stream ≡ batch by construction — per-doc scoring is stateless
    given the model), with the frozen model's word-odds join and OOV
    default doing the work for tokens the training corpus never saw.

    Exactly-once: each epoch writes ``out_dir/epoch=<id>`` with
    overwrite, so a replayed micro-batch rewrites its own partition
    instead of duplicating scores. Returns the started query (caller
    awaits termination; tests use AvailableNow)."""
    from full_docker_etl_spark.operators.text import nb_score

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        nb_score(batch_df, "text", "doc_id", odds, scalars).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/epoch={epoch_id}")

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(source_dir)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
