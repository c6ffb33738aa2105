"""Registered queries for the remaining pipeline operators: schema
conform (P2-P5), the news transform (M5/D4/F11/F12), manifest handoff
(S14/T3), and observe()-based job metrics (A10)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from full_docker_etl_spark.operators.conform import ConformSpec, conform_schema
from full_docker_etl_spark.operators.joins import semi_manifest
from full_docker_etl_spark.operators.news import transform_news
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table
from full_docker_etl_spark.sources.sinks import read_manifest, write_manifest


@query(
    "conform_schema",
    oracle="""
      WITH dirty AS (
        SELECT event_id,
               CASE WHEN event_type = 'error' THEN NULL
                    WHEN event_type = 'view' THEN 'not_a_number'
                    ELSE CAST(value AS VARCHAR) END AS amount,
               CASE WHEN event_type = 'signup' THEN 'nan'
                    ELSE CAST(CAST(floor(value * 2) AS BIGINT) AS VARCHAR)
               END AS volume
        FROM events)
      SELECT event_id,
             COALESCE(TRY_CAST(amount AS DOUBLE), -1.0) AS amount,
             COALESCE(TRY_CAST(volume AS BIGINT), 0) AS volume,
             CAST(0.0 AS DOUBLE) AS dividends
      FROM dirty
    """,
)
def conform_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2-P5/§1.3: the schema-conform operator as a checked query —
    dirty strings (nulls, unparseable, 'nan') repaired to typed
    defaults, missing column added
    (``TransForm_Load_Yfinance.py:194-208``)."""
    ev = load_table(spark, sf_dir, "events")
    dirty = ev.select(
        "event_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .when(F.col("event_type") == "view", F.lit("not_a_number"))
        .otherwise(F.col("value").cast("string"))
        .alias("amount"),
        F.when(F.col("event_type") == "signup", F.lit("nan"))
        .otherwise(F.floor(F.col("value") * 2).cast("long").cast("string"))
        .alias("volume"),
    )
    spec = ConformSpec(
        columns={
            "amount": (T.DoubleType(), -1.0),
            "volume": (T.LongType(), 0),
            "dividends": (T.DoubleType(), 0.0),
        },
        required=("event_id",),
    )
    return conform_schema(dirty, spec)


@query(
    "news_transform",
    oracle="""
      WITH base AS (
        SELECT doc_id,
               substr(text, 1, 50000) AS content,
               'http://news.example/' ||
                 CASE WHEN doc_id % 3 = 0 THEN 'market_news'
                      WHEN doc_id % 3 = 1 THEN 'stock_news'
                      ELSE 'other' END || '/' || doc_id AS link
        FROM documents),
      s AS (
        SELECT doc_id, content, link,
               regexp_split_to_array(trim(content), '\\s+') AS words
        FROM base)
      SELECT doc_id,
             content AS original_content,
             CASE WHEN len(words) > 20
                  THEN array_to_string(words[1:20], ' ') || ' ...'
                  ELSE array_to_string(words, ' ') END AS summary,
             CASE WHEN contains(link, 'market_news') THEN 'Market News'
                  WHEN contains(link, 'stock_news') THEN 'Stock News'
                  ELSE 'General' END AS category,
             CAST(len(words) AS INTEGER) AS content_words,
             CAST(CASE WHEN len(words) > 20 THEN 21
                       ELSE len(words) END AS INTEGER) AS summary_words
      FROM s
    """,
)
def news_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5/D4/F11/F12/A9: the news pipeline — char cap, pluggable
    mapInPandas summarizer (deterministic lead-20 stub, so even the
    Python stage is oracle-checkable), category from link, word
    counts (``transform_iqplus_news_dags.py:56-176``)."""
    docs = load_table(spark, sf_dir, "documents")
    with_link = docs.select(
        "doc_id",
        F.col("text"),
        F.concat(
            F.lit("http://news.example/"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("market_news"))
            .when(F.col("doc_id") % 3 == 1, F.lit("stock_news"))
            .otherwise(F.lit("other")),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ).alias("link"),
    )
    return transform_news(with_link, "text", "doc_id", "link")


@query(
    "manifest_semi_join",
    oracle="""
      SELECT e.event_id, e.user_id, e.event_type FROM events e
      WHERE e.user_id IN (SELECT DISTINCT user_id FROM events
                          WHERE event_type = 'purchase' AND value > 95)
    """,
)
def manifest_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14/T3/J3: write a processed-keys manifest (the pickle handoff
    as a warehouse table), read it back, and semi-join the fact table
    against it — the id-list change-propagation pattern
    (``extract_iqplus_news_dag.py:241-242``)."""
    ev = load_table(spark, sf_dir, "events")
    manifest_keys = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") > 95))
        .select("user_id")
        .distinct()
    )
    path = tempfile.mkdtemp(prefix="fde_manifest_") + "/m"
    write_manifest(spark, path, manifest_keys)
    manifest = read_manifest(spark, path)
    return semi_manifest(ev, manifest, on="user_id").select(
        "event_id", "user_id", "event_type"
    )


@query(
    "observe_metrics",
    oracle="""
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors
      FROM events
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: job-level accumulator totals via observe() — metrics ride
    the action itself (no second scan, unlike the reference's eager
    count() probes, ``TransForm_Load_Yfinance.py:138,183``)."""
    ev = load_table(spark, sf_dir, "events")
    obs = Observation("etl_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
    )
    observed.write.format("noop").mode("overwrite").save()
    row = obs.get
    # JVM-side VALUES, not createDataFrame — a Python local-collection
    # scan pays a Python-worker spawn on first action
    return spark.sql(
        "SELECT CAST({n} AS BIGINT) AS n_rows, "
        "CAST({t} AS DOUBLE) AS total_value, "
        "CAST({e} AS BIGINT) AS n_errors".format(
            n=row["n_rows"], t=repr(row["total_value"]), e=row["n_errors"]
        )
    )
