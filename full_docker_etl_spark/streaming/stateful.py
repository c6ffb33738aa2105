"""Custom stateful streaming operators (SURVEY.md M6, the T1-T5
superset): arbitrary per-key state via ``applyInPandasWithState`` and
watermarked stream deduplication.

- :func:`user_activity_tracker` — a per-user running profile (event
  count, value total, last-seen) maintained as GroupState across
  micro-batches: the shape of every "custom operator Spark lacks"
  (session scoring, rate limiting, CDC folding). Emits one updated
  row per user per batch; state is bounded by a processing-time
  timeout.
- :func:`dedup_stream_within_watermark` — T4's streaming form:
  ``dropDuplicatesWithinWatermark`` keeps the dedup state finite (an
  unbounded ``dropDuplicates`` on a stream leaks state forever — the
  watermark bound is what makes it runnable at 100 TB/day).

Both run identically under batch for testing: the tracker has a
groupBy equivalent asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRACKER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _make_track(idle_timeout_ms: int | None):
    def _track(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, last = state.get
        else:
            n, total, last = 0, 0.0, 0
        # STREAM the Arrow chunks — one in memory at a time. A hot key
        # (millions of events in one micro-batch) arrives as many
        # chunks; collecting them into a list first (the old no-data
        # detection) held the whole group in executor Python memory at
        # once, the exact skewed-key OOM this fold-per-chunk shape
        # exists to avoid.
        saw_data = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw_data = True
            n += len(pdf)
            total += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].astype("int64").max()) // 1000)
        if state.hasTimedOut or not saw_data:
            # idle eviction: Spark invokes timed-out keys with NO data.
            # Drop the state and emit nothing — re-arming the timer or
            # re-emitting the stale row here would keep state (and the
            # output) alive forever on an always-on stream.
            state.remove()
            return
        state.update((n, total, last))
        if idle_timeout_ms is not None:
            # evict idle users — bounded state for always-on streams
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_seen_us": [last],
            }
        )

    return _track


def user_activity_tracker(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Per-user running profile as arbitrary stateful processing.
    ``events`` must be a STREAMING frame with (user_id, ts, value).

    ``idle_timeout_ms`` evicts state for users idle that long — set it
    on an ALWAYS-ON stream so state stays bounded. Leave ``None`` for
    drain-and-stop runs (Trigger.AvailableNow): processing-time timers
    keep the no-data-batch scheduler busy forever, so an AvailableNow
    query with timers never terminates (verified on Spark 4.1; the
    timer loop also defeats processAllAvailable)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_track(idle_timeout_ms),
        outputStructType=TRACKER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def dedup_stream_within_watermark(
    events: DataFrame, keys: list[str], watermark_col: str, delay: str
) -> DataFrame:
    """T4 streaming: natural-key dedup with finite state — duplicates
    arriving within the watermark delay are dropped; state for keys
    older than the watermark is evicted."""
    return events.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark(
        keys
    )


QUOTA_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("host_seq", T.LongType()),
    ]
)

_QUOTA_STATE = T.StructType([T.StructField("n_admitted", T.LongType())])


def _make_admit(quota: int, idle_timeout_ms: int | None):
    def _admit(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        n = state.get[0] if state.exists else 0
        remaining = max(0, quota - n)
        # STREAM the Arrow chunks, folding a running buffer of the
        # `remaining` SMALLEST doc_ids only (the admitted set is the
        # remaining-quota smallest of the micro-batch, and min-of-union
        # folds per chunk). Collecting every chunk and sorting the
        # whole group (the old shape) held a hot host's entire
        # micro-batch in executor Python memory — the exact skewed-key
        # OOM the tracker's fold-per-chunk rewrite already fixed; an
        # over-quota host now drains its chunks at O(1) memory and a
        # live one buffers O(remaining quota) rows, never O(arrivals).
        buf: pd.DataFrame | None = None
        saw_data = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw_data = True
            if remaining == 0:
                continue  # quota exhausted: drain, admit nothing
            part = pdf[["doc_id"]]
            buf = part if buf is None else pd.concat([buf, part])
            if len(buf) > remaining:
                # stable sort keeps arrival order among equal doc_ids,
                # matching the old whole-batch mergesort exactly
                buf = buf.sort_values("doc_id", kind="mergesort").iloc[
                    :remaining
                ]
        if state.hasTimedOut or not saw_data:
            # timed-out hosts arrive with an EMPTY iterator. Evict the
            # counter — the host starts a fresh quota window on its
            # next crawl revisit.
            state.remove()
            return
        if buf is None:
            take, admitted_ids = 0, pd.Series([], dtype="int64")
        else:
            buf = buf.sort_values("doc_id", kind="mergesort")
            take = min(remaining, len(buf))
            admitted_ids = buf["doc_id"].iloc[:take].astype("int64")
        out = pd.DataFrame(
            {
                "host": host,
                "doc_id": admitted_ids,
                "host_seq": range(n + 1, n + take + 1),
            }
        )
        # the counter updates (and the idle timer re-arms) even when
        # nothing was admitted: the host is still ACTIVE — letting its
        # state expire mid-stream would reset the quota window and
        # re-admit past the cap
        state.update((n + take,))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield out

    return _admit


def host_quota_admitter(
    docs: DataFrame, quota: int, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Streaming per-host quota ADMITTER — the ingest-time form of the
    batch domain-quota curation stage (`curate_domains` /
    `quota_per_group`): each host's running admitted-count is GroupState
    carried across micro-batches, and a document is admitted only while
    its host is under ``quota``. This is the operator a 100 TB/day
    crawl ingest actually runs — the batch quota pass needs the whole
    corpus; this one decides per arrival with O(#hosts) state, exactly
    the CCNet/C4-style per-domain cap applied at the firehose.

    ``docs`` must be a STREAMING frame with (doc_id, host). Within a
    micro-batch, rows are admitted in ascending doc_id order (the
    deterministic tie-break; arrival order across batches is the
    stream's file order). Emits ONLY admitted rows, each with its
    1-based per-host admission ordinal ``host_seq`` — so downstream
    can audit exactly which arrival filled each quota slot. State is
    one long per host; ``idle_timeout_ms`` evicts hosts idle that long
    (size it to the crawl revisit cadence on an always-on stream;
    leave ``None`` for drain-and-stop AvailableNow runs — see
    :func:`user_activity_tracker` on why timers block termination)."""
    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return docs.groupBy("host").applyInPandasWithState(
        _make_admit(quota, idle_timeout_ms),
        outputStructType=QUOTA_SCHEMA,
        stateStructType=_QUOTA_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
