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
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last = max(last, int(pdf["ts"].astype("int64").max()) // 1000)
    state.update((n, total, last))
    # evict users idle for an hour of processing time — bounded state
    state.setTimeoutDuration(3600 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_seen_us": [last],
        }
    )


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """Per-user running profile as arbitrary stateful processing.
    ``events`` must be a STREAMING frame with (user_id, ts, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=TRACKER_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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
