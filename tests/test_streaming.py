"""Structured Streaming end-to-end: the windowed aggregates must
produce IDENTICAL results run incrementally (readStream over a parquet
directory, watermark, AvailableNow trigger, memory sink) and as a
batch query — the core Structured Streaming contract the engine
relies on for T1-T5 semantics."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from full_docker_etl_spark.sources.catalog import load_table
from full_docker_etl_spark.streaming.events import stream_events, tumbling_agg


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Copy events into a multi-file directory source (two batches, so
    the stream actually processes >1 file)."""
    ev = load_table(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="fde_stream_") + "/events"
    ev.where("event_id % 2 = 0").write.mode("overwrite").parquet(d)
    ev.where("event_id % 2 = 1").write.mode("append").parquet(d)
    yield d, ev.schema
    shutil.rmtree(d, ignore_errors=True)


def test_stream_equals_batch(spark, sf_dir, events_dir):
    d, schema = events_dir
    agg = stream_events(spark, d, schema, agg=tumbling_agg, watermark="2 hours")
    chk = tempfile.mkdtemp(prefix="fde_chk_")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_stream")
        .outputMode("complete")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.bucket_s, r.event_type): (r.n_events, str(r.sum_value))
        for r in spark.sql("SELECT * FROM t_stream").collect()
    }
    batch = {
        (r.bucket_s, r.event_type): (r.n_events, str(r.sum_value))
        for r in tumbling_agg(load_table(spark, sf_dir, "events")).collect()
    }
    assert streamed == batch
    shutil.rmtree(chk, ignore_errors=True)
