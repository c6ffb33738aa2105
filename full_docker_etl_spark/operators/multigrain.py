"""Multi-grain time-series aggregation — the reference's flagship
transform, Spark-first.

The reference computes daily (projection+distinct), monthly and yearly
(21-aggregate hash-aggs) OHLCV tables per stock and unions them into
one collection keyed by ``agg_type``/``period_key``
(``TransForm_Load_Yfinance.py:212-342``), looping over one collection
per company. Here it is a single distributed job over one table:

- :func:`aggregate_grain` — one grain as a declarative groupBy (A1/A2);
- :func:`daily_grain` — the projection+distinct daily slice (A3);
- :func:`multigrain_sql` — all grains in ONE pass via GROUPING SETS
  (A4/U1): one shuffle instead of three, which is the difference that
  matters at 100 TB (the union-of-three-groupBys form scans and
  shuffles the fact table three times).

Aggregate-value determinism (oracle parity): sums go through DECIMAL
(exact), avg/stddev are rounded to 4 decimals (their FP error is
~1e-9, far below the grid). See registry.py docstring.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.util import spread


@dataclass(frozen=True)
class GrainSpec:
    """Declarative description of the aggregate family for one dataset.

    ``measures``: short name -> source column expression (doubles).
    ``scales``: measure name -> decimal scale of the source values
    (used for exact SUM/AVG; the testdata money columns are 2-decimal,
    derived products like revenue are 4-decimal).
    ``sum_measures``: measures that get an explicit SUM output column.
    ``std_measures``: measures that also get a sample-stddev column.
    """

    series: str
    ts: str
    measures: dict[str, Column] = field(default_factory=dict)
    scales: dict[str, int] = field(default_factory=dict)
    sum_measures: tuple[str, ...] = ()
    std_measures: tuple[str, ...] = ()


def _sum_as_double(col: Column, scale: int) -> Column:
    """Exact decimal SUM surfaced as DOUBLE, with the losslessness
    precondition ENFORCED: the double surface is only exact below
    2^53, so a total past that raises instead of silently rounding
    (runtime check per GROUP, not per row — one branch on the final
    aggregate value). NULL totals (empty/all-null groups) pass
    through."""
    total = F.sum(col.cast(f"decimal(18,{scale})"))
    in_range = total.isNull() | (F.abs(total) <= F.lit(2**53))
    return F.when(in_range, total.cast("double")).otherwise(
        F.raise_error(
            F.lit(
                "multigrain sum exceeds 2^53: the DOUBLE surface would "
                "round; widen the output type or pre-scale the measure"
            )
        )
    )


def _exact_sum(col: Column, scale: int) -> Column:
    """Order-independent SUM of a fixed-scale double column: cast each
    row to DECIMAL (unambiguous — values are exact k-decimal numbers
    stored as doubles), sum exactly, then surface as DOUBLE. The final
    cast is lossless for k-decimal totals below 2^53 — enforced at
    runtime by :func:`_sum_as_double` — and correctly rounded
    identically in every engine, so the value hashes portably —
    DECIMAL output representations do not (driver finding, round 2)."""
    return _sum_as_double(col, scale)


def _exact_avg(col: Column, scale: int) -> Column:
    """AVG without float-summation nondeterminism OR rounding ties:
    exact decimal numerator → double (correctly-rounded, identical in
    any engine) → one IEEE division by the count. Plain ROUND(AVG(x),k)
    is NOT portable here: 2-decimal inputs averaged over small counts
    land exactly on round-half boundaries, where engines disagree."""
    return _sum_as_double(col, scale) / F.count(F.lit(1))


def grain_aggs(spec: GrainSpec) -> list[Column]:
    """The reference's 21-aggregate family (avg/sum/max/min/stddev/count,
    ``TransForm_Load_Yfinance.py:232-249``) as deterministic columns."""
    aggs: list[Column] = []
    for name, col in spec.measures.items():
        aggs.append(_exact_avg(col, spec.scales[name]).alias(f"avg_{name}"))
    for name in spec.sum_measures:
        aggs.append(
            _exact_sum(spec.measures[name], spec.scales[name]).alias(f"sum_{name}")
        )
    for name, col in spec.measures.items():
        aggs.append(F.max(col).alias(f"max_{name}"))
    for name, col in spec.measures.items():
        aggs.append(F.min(col).alias(f"min_{name}"))
    for name in spec.std_measures:
        aggs.append(F.round(F.stddev_samp(spec.measures[name]), 4).alias(f"std_{name}"))
    aggs.append(F.count(F.lit(1)).alias("row_count"))
    return aggs


_PERIOD_FMT = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}
_PERIOD_START_SUFFIX = {"day": "", "month": "-01", "year": "-01-01"}


def aggregate_grain(df: DataFrame, spec: GrainSpec, grain: str) -> DataFrame:
    """One calendar grain (A1 monthly / A2 yearly) as a single hash-agg.

    Partial aggregation (map-side combine) happens automatically; the
    only shuffle is on (series, period_key) — the natural key.
    """
    period = F.date_format(F.col(spec.ts), _PERIOD_FMT[grain]).alias("period_key")
    # spread: the per-row date_format + 21-agg partial aggregation is
    # the stage's cost, and a single-row-group fact file arrives as ONE
    # scan partition — serializing it on one core. At real scale the
    # scan already has >= cores partitions and this is a no-op.
    out = (
        spread(df).groupBy(F.col(spec.series).alias("series"), period)
        .agg(*grain_aggs(spec))
        .withColumn("agg_type", F.lit(grain))
        .withColumn(
            "record_date",
            F.to_date(
                F.concat(F.col("period_key"), F.lit(_PERIOD_START_SUFFIX[grain]))
            ),
        )
    )
    front = ["series", "period_key", "agg_type", "record_date"]
    return out.select(*front, *[c for c in out.columns if c not in front])


def daily_grain(df: DataFrame, spec: GrainSpec) -> DataFrame:
    """A3: the daily grain is a tagged projection + distinct
    (``TransForm_Load_Yfinance.py:212-226``), not an aggregate."""
    cols = [
        F.col(spec.series).alias("series"),
        F.date_format(F.col(spec.ts), "yyyy-MM-dd").alias("period_key"),
        F.lit("day").alias("agg_type"),
    ] + [col.alias(name) for name, col in spec.measures.items()]
    # spread before the map-side distinct for the same single-scan-
    # partition reason as aggregate_grain (no-op at real scale)
    return spread(df).select(*cols).distinct()


def multigrain_sql(view: str, spec_sql: dict[str, str]) -> str:
    """One-pass day∪month∪year via GROUPING SETS (runs on both Spark SQL
    and DuckDB modulo the date-format function, supplied by the caller).

    ``spec_sql`` keys: series, day, month, year (SQL expressions), plus
    agg column SQL handled by the caller's template.
    """
    return f"""
        WITH base AS (
          SELECT {spec_sql['series']} AS series,
                 {spec_sql['day']}    AS day,
                 {spec_sql['month']}  AS month,
                 {spec_sql['year']}   AS year,
                 {spec_sql['values']}
          FROM {view}
        )
        SELECT series,
               CASE WHEN GROUPING(day) = 0 THEN day
                    WHEN GROUPING(month) = 0 THEN month
                    ELSE year END AS period_key,
               CASE WHEN GROUPING(day) = 0 THEN 'day'
                    WHEN GROUPING(month) = 0 THEN 'month'
                    ELSE 'year' END AS agg_type,
               {spec_sql['aggs']}
        FROM base
        GROUP BY series, GROUPING SETS ((day), (month), (year))
    """
