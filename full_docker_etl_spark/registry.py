"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers itself here as a
named ``(spark, sf_dir) -> DataFrame`` callable, optionally paired with
an ANSI-SQL oracle string that DuckDB runs on the same parquet tables.
``__spark_entry__.py`` exposes the registry verbatim as
``queries()`` / ``oracle_sql()``.

Determinism rules every registered query follows (so the driver's
row-count + schema + value-hash compare is stable across engines):

- SUM over doubles goes through DECIMAL (exact, order-independent);
  the per-row double→decimal cast is unambiguous because source values
  are small-scale decimals stored as doubles.
- AVG / STDDEV are rounded to 4 decimals — their absolute FP error is
  orders of magnitude below the rounding grid.
- MIN/MAX/CONT and arithmetic on row values are bit-deterministic.
- LIMIT/top-k queries carry a total order with a unique tie-break key.
- Timestamps are surfaced as epoch microseconds (bigint) or DATE, never
  raw TIMESTAMP, to avoid tz-annotation mismatches between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from full_docker_etl_spark.session import tune_session


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a query. ``oracle`` is DuckDB SQL over the pre-registered
    views (region nation customer supplier part orders lineitem events
    documents embeddings); omit it only for genuinely
    non-SQL-expressible operators (the driver then records a weaker
    rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The correctness driver owns the session; apply our
            # runtime-tunable engine defaults (UTC, Arrow, AQE) to it.
            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_specs() -> dict[str, QuerySpec]:
    """Import all query modules (populating the registry) and return it."""
    import full_docker_etl_spark.queries  # noqa: F401  (registration side effect)

    return dict(_REGISTRY)
