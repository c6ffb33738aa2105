"""End-to-end tests for the custom stateful streaming operators:
applyInPandasWithState must accumulate across micro-batches to the
batch-equivalent totals, and watermarked stream dedup must drop
in-window duplicates."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from full_docker_etl_spark.sources.catalog import load_table
from full_docker_etl_spark.streaming.stateful import (
    dedup_stream_within_watermark,
    user_activity_tracker,
)


@pytest.fixture(scope="module")
def events_two_batches(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="fde_state_") + "/events"
    ev.where("event_id % 2 = 0").write.mode("overwrite").parquet(d)
    ev.where("event_id % 2 = 1").write.mode("append").parquet(d)
    yield d, ev
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(df, name, mode):
    chk = tempfile.mkdtemp(prefix="fde_chk_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return chk


def test_stateful_tracker_matches_batch(spark, events_two_batches):
    d, ev = events_two_batches
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    tracked = user_activity_tracker(stream)
    chk = _run_stream(tracked, "t_tracker", "update")
    # update mode emits one row per user per batch → keep the latest
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM t_tracker) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.total, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want
    shutil.rmtree(chk, ignore_errors=True)


def test_stream_dedup_within_watermark(spark, events_two_batches):
    d, ev = events_two_batches
    # duplicate the source: every event arrives twice across batches
    dup_dir = tempfile.mkdtemp(prefix="fde_dup_") + "/events"
    ev.write.mode("overwrite").parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)
    stream = spark.readStream.schema(ev.schema).parquet(dup_dir)
    deduped = dedup_stream_within_watermark(
        stream, ["event_id"], "ts", "2 hours"
    )
    chk = _run_stream(deduped.select("event_id"), "t_dedup", "append")
    n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n FROM t_dedup").collect()[0].n
    total = spark.sql("SELECT COUNT(*) AS n FROM t_dedup").collect()[0].n
    assert n == ev.count()
    assert total == n, "duplicates inside the watermark must be dropped"
    shutil.rmtree(dup_dir, ignore_errors=True)
    shutil.rmtree(chk, ignore_errors=True)
