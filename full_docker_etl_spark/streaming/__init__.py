from full_docker_etl_spark.streaming.events import (
    session_agg,
    sliding_agg,
    stream_events,
    tumbling_agg,
)

__all__ = ["session_agg", "sliding_agg", "stream_events", "tumbling_agg"]
