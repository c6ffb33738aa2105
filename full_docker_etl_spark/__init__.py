"""full_docker_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark implementation of the query and
data-processing capabilities of the reference system
``salsilsulselsol/Full-Docker-ETL`` (an Airflow + Spark + MongoDB +
Flask stock-analytics stack), re-expressed as:

- partitioned Parquet tables + Spark SQL views (replacing
  namespace-as-schema Mongo collections),
- declarative DataFrame/SQL transforms optimized by Catalyst/AQE
  (replacing per-entity driver loops),
- a parameterized query surface (replacing the Flask/Mongo filter
  dicts),
- Structured Streaming for the reference's incremental-batch
  semantics,
- plus large-scale training-data-pipeline extensions (dedup,
  similarity search, text analysis, multimodal columns).

See SURVEY.md for the full blueprint and reference citations.
"""

from full_docker_etl_spark.plans import plan_stats, plan_text, read_schemas
from full_docker_etl_spark.session import get_spark, tune_session

__all__ = [
    "get_spark",
    "tune_session",
    "plan_text",
    "plan_stats",
    "read_schemas",
]

__version__ = "0.1.0"
