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
    assert q.awaitTermination(180), 'stream drain timed out'
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


def test_host_quota_admitter_matches_batch_order(spark):
    """Cross-batch quota state: 12 docs over 3 hosts arrive in two
    micro-batches (one file each); with quota=3 the admitted set and
    per-host admission ordinals must equal the batch-mode rank over
    (batch, doc_id) arrival order — host state must CARRY across
    batches (a host filling 2 slots in batch 1 admits only 1 more)."""
    import pandas as pd

    from full_docker_etl_spark.streaming.stateful import host_quota_admitter

    rows_b0 = [(0, "a"), (1, "a"), (2, "b"), (3, "c"), (4, "b")]
    rows_b1 = [(5, "a"), (6, "a"), (7, "b"), (8, "b"), (9, "c"),
               (10, "a"), (11, "b")]
    d = tempfile.mkdtemp(prefix="fde_quota_") + "/docs"
    schema = "doc_id long, host string"
    spark.createDataFrame(rows_b0, schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(rows_b1, schema).repartition(1).write.mode(
        "append"
    ).parquet(d)

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(d)
    admitted = host_quota_admitter(stream, quota=3)
    chk = _run_stream(admitted, "t_quota", "append")
    got = {
        (r.host, r.doc_id): r.host_seq
        for r in spark.sql("SELECT * FROM t_quota").collect()
    }
    # batch-mode reference: rank per host over (batch, doc_id) arrival
    arrival = [(b, i, h) for b, rows in enumerate([rows_b0, rows_b1])
               for i, h in rows]
    want = {}
    seen: dict[str, int] = {}
    for b, i, h in sorted(arrival):
        if seen.get(h, 0) < 3:
            seen[h] = seen.get(h, 0) + 1
            want[(h, i)] = seen[h]
    assert got == want
    # host 'a' fills 2 slots in batch 0 and its 3rd with doc 5 in
    # batch 1 — docs 6 and 10 arrive over quota and must be rejected
    assert ("a", 5) in got and got[("a", 5)] == 3
    assert ("a", 6) not in got and ("a", 10) not in got

    import pytest as _pytest

    with _pytest.raises(ValueError, match="quota"):
        host_quota_admitter(stream, quota=0)
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(chk, ignore_errors=True)


def test_quota_admitter_restart_resumes_state_exactly_once(spark):
    """Production restart semantics: a NEW streaming query over the
    SAME checkpoint must resume — offsets (batch 0 is not reprocessed),
    GroupState (host counts continue, not reset), and the file sink
    (no duplicate rows). A third run with no new data emits nothing.
    This is the crash/redeploy path every always-on ingest hits."""
    from full_docker_etl_spark.streaming.stateful import host_quota_admitter

    d = tempfile.mkdtemp(prefix="fde_restart_") + "/docs"
    out = tempfile.mkdtemp(prefix="fde_restart_out_")
    chk = tempfile.mkdtemp(prefix="fde_restart_chk_")
    schema = "doc_id long, host string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(d)
        q = (
            host_quota_admitter(stream, quota=3)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'stream drain timed out'

    # run 1: batch 0 — host a fills 2 of 3 slots
    spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], schema
    ).repartition(1).write.mode("overwrite").parquet(d)
    run_once()
    first = {
        (r.host, r.doc_id, r.host_seq)
        for r in spark.read.parquet(out).collect()
    }
    assert first == {("a", 0, 1), ("a", 1, 2), ("b", 2, 1)}

    # run 2 (restart): batch 1 — host a admits ONE more (state carried
    # across the restart), doc 4 is over quota; batch 0 NOT reprocessed
    spark.createDataFrame(
        [(3, "a"), (4, "a"), (5, "b")], schema
    ).repartition(1).write.mode("append").parquet(d)
    run_once()
    second = {
        (r.host, r.doc_id, r.host_seq)
        for r in spark.read.parquet(out).collect()
    }
    assert second == first | {("a", 3, 3), ("b", 5, 2)}, second

    # run 3 (restart, no new data): exactly-once — nothing re-emitted
    run_once()
    third = {
        (r.host, r.doc_id, r.host_seq)
        for r in spark.read.parquet(out).collect()
    }
    assert third == second

    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(chk, ignore_errors=True)


class _FakeState:
    """Duck-typed GroupState for unit-testing the handler closures'
    timeout path without a streaming query (Spark invokes timed-out
    keys with hasTimedOut=True and an EMPTY batch iterator)."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_tracker_timeout_evicts_state_and_emits_nothing():
    """On a timeout invocation (empty iterator) the tracker must remove
    state and emit nothing — NOT re-arm the timer or re-emit the stale
    row (the pre-r12 behavior, which grew state without bound)."""
    from full_docker_etl_spark.streaming.stateful import _make_track

    track = _make_track(idle_timeout_ms=500)
    st = _FakeState(value=(3, 7.5, 123), timed_out=True)
    out = list(track((42,), iter([]), st))
    assert out == []
    assert st.removed and not st.exists
    assert st.timeout_set is None, "timer must not be re-armed on eviction"


def test_admitter_timeout_evicts_without_crashing():
    """Pre-r12 the admitter crashed on the timeout path:
    pd.concat(list(empty_iterator)) raises ValueError('No objects to
    concatenate'), killing the streaming query; and state was never
    removed. Now: evict, emit nothing, no crash."""
    from full_docker_etl_spark.streaming.stateful import _make_admit

    admit = _make_admit(quota=3, idle_timeout_ms=500)
    st = _FakeState(value=(2,), timed_out=True)
    out = list(admit(("example.com",), iter([]), st))
    assert out == []
    assert st.removed and not st.exists

    # non-timeout path still admits and re-arms the idle timer
    import pandas as pd

    st2 = _FakeState()
    batch = pd.DataFrame({"doc_id": [5, 1, 9], "host": "h"})
    (res,) = list(admit(("h",), iter([batch]), st2))
    assert list(res["doc_id"]) == [1, 5, 9]
    assert list(res["host_seq"]) == [1, 2, 3]
    assert st2.get == (3,) and st2.timeout_set == 500


def test_quota_admitter_idle_timeout_evicts_live_stream(spark):
    """Integration: with a short ProcessingTimeTimeout on an always-on
    (processingTime-trigger) stream, Spark's no-data batches must invoke
    the timed-out host WITHOUT crashing the query, and the state row
    must actually be removed (numRowsRemoved in the progress metrics).
    A host revisiting AFTER eviction starts a fresh quota window."""
    import time

    from full_docker_etl_spark.streaming.stateful import host_quota_admitter

    d = tempfile.mkdtemp(prefix="fde_evict_") + "/docs"
    chk = tempfile.mkdtemp(prefix="fde_evict_chk_")
    schema = "doc_id long, host string"
    spark.createDataFrame([(0, "a"), (1, "a")], schema).repartition(
        1
    ).write.mode("overwrite").parquet(d)

    stream = spark.readStream.schema(schema).parquet(d)
    admitted = host_quota_admitter(stream, quota=2, idle_timeout_ms=500)
    q = (
        admitted.writeStream.format("memory")
        .queryName("t_evict")
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        evicted = False
        while time.time() < deadline and not evicted:
            time.sleep(1)
            if q.exception() is not None:
                raise AssertionError(
                    f"query crashed on timeout path: {q.exception()}"
                )
            for p in q.recentProgress:
                for op in p.get("stateOperators", []):
                    if op.get("numRowsRemoved", 0) > 0:
                        evicted = True
        assert evicted, "idle host state was never evicted within 90 s"
        # revisit after eviction: the quota window restarts (host_seq 1)
        spark.createDataFrame([(10, "a")], schema).repartition(
            1
        ).write.mode("append").parquet(d)
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = {
                (r.doc_id, r.host_seq)
                for r in spark.sql("SELECT * FROM t_evict").collect()
            }
            if (10, 1) in rows:
                break
            time.sleep(1)
        assert (10, 1) in rows, f"fresh window not observed: {rows}"
    finally:
        q.stop()
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(chk, ignore_errors=True)
