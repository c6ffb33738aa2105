"""Query modules. Importing this package populates the registry
(each module registers its queries at import time via @query)."""

from full_docker_etl_spark.queries import (  # noqa: F401
    analytics_q,
    flagship,
    functions_q,
    joins_windows,
    llm_q,
    pipelines_q,
    sinks_streaming,
    sources_q,
    surface,
    xbrl_q,
)
