"""Flagship: the multi-grain time-series aggregate (SURVEY.md §2 A1-A4,
U1, F1-F4, F16, P6; reference ``TransForm_Load_Yfinance.py:212-342``).

Mapped onto the testdata ``lineitem`` fact table: series =
``l_returnflag`` (the reference's company_code), event time =
``l_shipdate``, measures = quantity / extendedprice / discount / tax /
revenue — the same avg/sum/max/min/stddev/count family the reference
computes over OHLCV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.multigrain import (
    GrainSpec,
    aggregate_grain,
    daily_grain,
    multigrain_sql,
)
from full_docker_etl_spark.operators.util import spread
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table


def _lineitem_spec() -> GrainSpec:
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return GrainSpec(
        series="l_returnflag",
        ts="l_shipdate",
        measures={
            "qty": F.col("l_quantity"),
            "price": F.col("l_extendedprice"),
            "disc": F.col("l_discount"),
            "tax": F.col("l_tax"),
            "rev": rev,
        },
        scales={"qty": 2, "price": 2, "disc": 2, "tax": 2, "rev": 4},
        sum_measures=("qty", "rev"),
        std_measures=("qty", "price", "disc", "rev"),
    )


# The same aggregate family in ANSI SQL (DuckDB oracle). Deterministic:
# sums via DECIMAL, avg/stddev rounded (see registry.py docstring).
_AGG_SQL = """
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_tax,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_rev,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_rev,
  MAX(l_quantity)                          AS max_qty,
  MAX(l_extendedprice)                     AS max_price,
  MAX(l_discount)                          AS max_disc,
  MAX(l_tax)                               AS max_tax,
  MAX(l_extendedprice * (1.0 - l_discount)) AS max_rev,
  MIN(l_quantity)                          AS min_qty,
  MIN(l_extendedprice)                     AS min_price,
  MIN(l_discount)                          AS min_disc,
  MIN(l_tax)                               AS min_tax,
  MIN(l_extendedprice * (1.0 - l_discount)) AS min_rev,
  ROUND(STDDEV_SAMP(l_quantity), 4)        AS std_qty,
  ROUND(STDDEV_SAMP(l_extendedprice), 4)   AS std_price,
  ROUND(STDDEV_SAMP(l_discount), 4)        AS std_disc,
  ROUND(STDDEV_SAMP(l_extendedprice * (1.0 - l_discount)), 4) AS std_rev,
  COUNT(*)                                 AS row_count
"""


def _grain_oracle(fmt: str, suffix: str, grain: str) -> str:
    return f"""
      SELECT l_returnflag AS series,
             strftime(l_shipdate, '{fmt}') AS period_key,
             '{grain}' AS agg_type,
             CAST(strftime(l_shipdate, '{fmt}') || '{suffix}' AS DATE) AS record_date,
             {_AGG_SQL}
      FROM lineitem
      GROUP BY 1, 2
    """


@query(
    "agg_daily",
    oracle="""
      SELECT DISTINCT
             l_returnflag AS series,
             strftime(l_shipdate, '%Y-%m-%d') AS period_key,
             'day' AS agg_type,
             l_quantity AS qty,
             l_extendedprice AS price,
             l_discount AS disc,
             l_tax AS tax,
             l_extendedprice * (1.0 - l_discount) AS rev
      FROM lineitem
    """,
)
def agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: daily grain = tagged projection + distinct
    (``TransForm_Load_Yfinance.py:212-226``)."""
    return daily_grain(load_table(spark, sf_dir, "lineitem"), _lineitem_spec())


@query("agg_monthly", oracle=_grain_oracle("%Y-%m", "-01", "month"))
def agg_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: monthly 21-aggregate hash-agg
    (``TransForm_Load_Yfinance.py:232-249``)."""
    return aggregate_grain(
        load_table(spark, sf_dir, "lineitem"), _lineitem_spec(), "month"
    )


@query("agg_yearly", oracle=_grain_oracle("%Y", "-01-01", "year"))
def agg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: yearly 21-aggregate hash-agg
    (``TransForm_Load_Yfinance.py:276-293``)."""
    return aggregate_grain(
        load_table(spark, sf_dir, "lineitem"), _lineitem_spec(), "year"
    )


_MULTIGRAIN_AGGS = """
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS sum_rev,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS row_count
"""


def _multigrain_query(date_fn) -> str:
    """Shared GROUPING SETS text; ``date_fn(expr, fmt)`` renders the
    engine's date-format call (Spark date_format vs DuckDB strftime)."""
    return multigrain_sql(
        "lineitem",
        {
            "series": "l_returnflag",
            "day": date_fn("l_shipdate", "yyyy-MM-dd"),
            "month": date_fn("l_shipdate", "yyyy-MM"),
            "year": date_fn("l_shipdate", "yyyy"),
            "values": "l_quantity, l_extendedprice, "
            "l_extendedprice * (1.0 - l_discount) AS rev",
            "aggs": _MULTIGRAIN_AGGS,
        },
    )


_SPARK_FMT = {"yyyy-MM-dd": "yyyy-MM-dd", "yyyy-MM": "yyyy-MM", "yyyy": "yyyy"}
_DUCK_FMT = {"yyyy-MM-dd": "%Y-%m-%d", "yyyy-MM": "%Y-%m", "yyyy": "%Y"}


@query(
    "agg_multigrain",
    oracle=_multigrain_query(
        lambda col, fmt: f"strftime({col}, '{_DUCK_FMT[fmt]}')"
    ),
)
def agg_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/U1: day∪month∪year in ONE pass via GROUPING SETS — one scan +
    one shuffle, vs. the reference's three groupBys + union
    (``TransForm_Load_Yfinance.py:330-342``). At 100 TB this is the
    dominant cost difference."""
    # spread: the base CTE's three per-row date_formats + the Expand +
    # partial aggregation all run in the scan stage, and a single-row-
    # group fact file is ONE scan partition — one core does the whole
    # map side. No-op at real scale (scan already >= cores partitions);
    # the plan keeps its single parquet scan (tests/test_plans.py).
    spread(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(
        _multigrain_query(lambda col, fmt: f"date_format({col}, '{_SPARK_FMT[fmt]}')")
    )


@query(
    "serve_materialized_grain",
    oracle=f"""
      SELECT * FROM (
        {_multigrain_query(lambda col, fmt: f"strftime({col}, '{_DUCK_FMT[fmt]}')")}
      ) WHERE agg_type = 'month'
    """,
)
def serve_materialized_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §4.2.2 / T1 serve path: the reference materializes each
    grain into its own collection and points reads at it (the Load
    stage is literally a table copy,
    ``TransForm_Load_Yfinance.py:453-474``). Here ONE multigrain table
    is written partitioned by ``agg_type``, and the serve-side read
    filters on the partition column — a month query opens only the
    month directory (PartitionFilters prune files before any row is
    read; asserted in tests/test_plans.py). At 100 TB the agg table is
    what interactive traffic hits; the fact table is never rescanned."""
    import tempfile

    path = tempfile.mkdtemp(prefix="fde_grain_") + "/agg"
    agg_multigrain(spark, sf_dir).write.mode("overwrite").partitionBy(
        "agg_type"
    ).parquet(path)
    return spark.read.parquet(path).where(F.col("agg_type") == "month")


@query(
    "serve_incremental_grain",
    oracle=_multigrain_query(
        lambda col, fmt: f"strftime({col}, '{_DUCK_FMT[fmt]}')"
    ).replace("FROM lineitem\n", "FROM lineitem_recent\n").replace(
        "WITH base AS (",
        """WITH lineitem_recent AS (
             SELECT * FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '2000-01-01'),
           base AS (""",
    ),
)
def serve_incremental_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL materialized-view maintenance (the scheduled-rebuild
    T1 pattern, made 100 TB-safe): the grain table is backfilled once
    WITHOUT the newest two months, then those months arrive as a batch
    and ``refresh_grain`` recomputes ONLY the touched periods — from a
    fact read pruned to the touched year — and dynamic-partition-
    overwrites exactly those (agg_type, month-bucket) directories
    (untouched directories byte-identical, inode-pinned in
    tests/test_analytics.py). The oracle rebuilds the ENTIRE grain
    from scratch in SQL, so the driver hash-check proves
    incremental-refresh ≡ full-rebuild, row for row — the invariant
    every IVM scheme owes you. The reference instead re-copies every
    grain collection per run (``TransForm_Load_Yfinance.py:453-474``);
    at scale that full rebuild is the one shape that cannot survive."""
    import tempfile

    from full_docker_etl_spark.operators.ivm import (
        GRAIN_PARTITIONING,
        refresh_grain,
        with_bucket,
    )

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp")
    )  # bounded demo history: ~70 bucket dirs instead of ~250
    cutoff = F.lit("2001-09-01").cast("timestamp")

    def build(df: DataFrame) -> DataFrame:
        spread(df).createOrReplaceTempView("__ivm_fact")
        return spark.sql(
            multigrain_sql(
                "__ivm_fact",
                {
                    "series": "l_returnflag",
                    "day": "date_format(l_shipdate, 'yyyy-MM-dd')",
                    "month": "date_format(l_shipdate, 'yyyy-MM')",
                    "year": "date_format(l_shipdate, 'yyyy')",
                    "values": "l_quantity, l_extendedprice, "
                    "l_extendedprice * (1.0 - l_discount) AS rev",
                    "aggs": _MULTIGRAIN_AGGS,
                },
            )
        )

    path = tempfile.mkdtemp(prefix="fde_ivm_") + "/grain"
    with_bucket(build(li.where(F.col("l_shipdate") < cutoff))).repartition(
        *[F.col(c) for c in GRAIN_PARTITIONING]
    ).write.mode("overwrite").partitionBy(*GRAIN_PARTITIONING).parquet(path)
    refresh_grain(
        li, li.where(F.col("l_shipdate") >= cutoff), build, path, "l_shipdate"
    )
    return spark.read.parquet(path).select(
        "series", "period_key", "agg_type",
        "sum_qty", "sum_rev", "avg_price", "row_count",
    )
