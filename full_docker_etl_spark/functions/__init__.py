from full_docker_etl_spark.functions.scalars import (
    collapse_whitespace,
    format_compact_id,
    format_rupiah,
    name_underscore,
    safe_div,
)

__all__ = [
    "collapse_whitespace",
    "format_compact_id",
    "format_rupiah",
    "name_underscore",
    "safe_div",
]
