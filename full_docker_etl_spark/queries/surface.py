"""Interactive query surface bound to the testdata tables — one
registered query per Flask-endpoint behavior (SURVEY.md §2.2 P7-P15,
§2.6 O1-O5, §2.4 A5-A9). Reference: ``api/app.py``.

Timestamps are surfaced as epoch microseconds (``unix_micros`` /
DuckDB ``epoch_us``) or DATE — never raw TIMESTAMP — to keep
cross-engine type comparison exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_docker_etl_spark.operators import query_surface as qs
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


@query(
    "filter_eq",
    oracle="""
      SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
      FROM events WHERE event_type = 'click'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: equality filter-dict (``api/app.py:44-47``)."""
    return (
        _events(spark, sf_dir)
        .where(qs.eq_filter("event_type", "click"))
        .select(
            "event_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "user_id",
            "event_type",
            "value",
        )
    )


@query(
    "filter_range",
    oracle="""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <= TIMESTAMP '1996-12-31'
    """,
)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: $gte/$lte range over the period key (``api/app.py:48-49``)."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-12-31").cast("timestamp")
    return (
        _orders(spark, sf_dir)
        .where((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi))
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_totalprice",
        )
    )


@query(
    "filter_contains_ci",
    oracle="""
      SELECT p_partkey, p_name FROM part
      WHERE contains(lower(p_name), 'widget')
    """,
)
def filter_contains_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: case-insensitive unanchored $regex = substring match
    (``api/app.py:144-145``)."""
    return (
        load_table(spark, sf_dir, "part")
        .where(qs.contains_ci("p_name", "WIDget"))
        .select("p_partkey", "p_name")
    )


@query(
    "filter_or_search",
    oracle="""
      SELECT p_partkey, p_name, p_type FROM part
      WHERE contains(lower(p_name), 'sma') OR contains(lower(p_type), 'sma')
    """,
)
def filter_or_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: $or of substring predicates over several columns
    (``api/app.py:253-258``)."""
    return (
        load_table(spark, sf_dir, "part")
        .where(qs.any_contains_ci(["p_name", "p_type"], "SMA"))
        .select("p_partkey", "p_name", "p_type")
    )


@query(
    "filter_in",
    oracle="""
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: $in-list predicate (``transform_iqplus_news_dags.py:78``)."""
    return (
        _orders(spark, sf_dir)
        .where(qs.in_list("o_orderpriority", ["1-URGENT", "2-HIGH"]))
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "filter_pending",
    oracle="""
      SELECT event_id, event_type, status FROM (
        SELECT event_id, event_type,
               CASE WHEN event_type = 'error' THEN 'belum'
                    WHEN event_type = 'view' THEN NULL
                    ELSE 'selesai' END AS status
        FROM events
      ) WHERE status = 'belum' OR status IS NULL
    """,
)
def filter_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12/T2: pending-work filter — status = sentinel OR missing
    (``transform_iqplus_news_dags.py:80-83``)."""
    status = (
        F.when(F.col("event_type") == "error", F.lit("belum"))
        .when(F.col("event_type") == "view", F.lit(None).cast("string"))
        .otherwise(F.lit("selesai"))
    )
    return (
        _events(spark, sf_dir)
        .withColumn("status", status)
        .where(qs.pending_filter("status", "belum"))
        .select("event_id", "event_type", "status")
    )


@query(
    "point_lookup",
    oracle="SELECT * FROM customer WHERE c_custkey = 42 LIMIT 1",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: find_one on a unique key (``api/app.py:323``) — deterministic
    because the key is unique."""
    return qs.point_lookup(load_table(spark, sf_dir, "customer"), "c_custkey", 42)


@query(
    "nested_reshape",
    oracle="""
      SELECT event_id,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events
    """,
)
def nested_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15/F19: project a nested/JSON field into a typed column
    (``api/app.py:154-163`` metadata flattening)."""
    return _events(spark, sf_dir).select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
    )


@query(
    "sort_topk",
    oracle="""
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_totalprice
      FROM orders
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 50
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O3: sort desc by date (``api/app.py:151``) + head — executes
    as TakeOrderedAndProject, no full sort. Unique tie-break key makes
    the result set deterministic."""
    df = _orders(spark, sf_dir).select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        "o_totalprice",
    )
    return qs.top_k(df, [("order_date", False), ("o_orderkey", False)], 50)


@query(
    "paginate",
    oracle="""
      SELECT CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        SELECT row_number() OVER (ORDER BY o_orderkey) AS rn,
               o_orderkey, o_totalprice
        FROM orders
      ) WHERE rn BETWEEN 19 AND 27
    """,
)
def paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O5: page 3 at 9/page (the reference's default limit 9,
    ``api/app.py:227-231``), deterministic via row_number over a
    total order."""
    df = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    out = qs.paginate(df, [("o_orderkey", True)], page=3, per_page=9)
    return out.select("rn", "o_orderkey", "o_totalprice")


@query(
    "topk_by_value",
    oracle="""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10
    """,
)
def topk_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: top-10 by measure (NewsController latest-10)."""
    df = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    return qs.top_k(df, [("o_totalprice", False), ("o_orderkey", True)], 10)


@query(
    "limit_one",
    oracle="SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 1",
)
def limit_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: limit(1) sampling, pinned to a total order for determinism."""
    df = _orders(spark, sf_dir).select("o_orderkey", "o_orderstatus")
    return qs.top_k(df, [("o_orderkey", True)], 1)


@query("global_count", oracle="SELECT COUNT(*) AS n FROM lineitem")
def global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: count_documents (``api/app.py:148,251``)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: collection.distinct(field) (``api/app.py:92,121,317``)."""
    return qs.distinct_values(_events(spark, sf_dir), "event_type")


@query(
    "column_max",
    oracle="SELECT CAST(MAX(o_orderdate) AS DATE) AS latest_date FROM orders",
)
def column_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: latest-date scalar — as an agg, NOT a collect
    (``dag_transform_load_yfinance_fixed.py:333``)."""
    return _orders(spark, sf_dir).agg(
        F.max(F.col("o_orderdate")).cast("date").alias("latest_date")
    )


@query(
    "group_counts",
    oracle="""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    """,
)
def group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: per-group record counts → metadata rows
    (``dag_transform_load_yfinance_fixed.py:335-350``) — a groupBy,
    not a createDataFrame-in-a-loop."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "word_counts",
    oracle="""
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_words
      FROM documents
    """,
)
def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: per-row word counts (``transform_iqplus_news_dags.py:151-152``)
    via split+size — JVM expressions, no UDF."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_words"),
    )


@query(
    "catalog_tables",
    oracle="""
      SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),
        ('events'),('lineitem'),('nation'),('orders'),('part'),
        ('region'),('supplier')) AS t(table_name)
    """,
)
def catalog_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S15: namespace listing → catalog listing (``api/app.py:19,30``).
    Lists via ``list_tables`` (one SHOW TABLES round trip) —
    ``spark.catalog.listTables()`` resolves every view's schema with a
    py4j call per table, which is exactly the per-entity chatter this
    operator exists to replace."""
    from full_docker_etl_spark.sources.catalog import (
        TESTDATA_TABLES,
        list_tables,
        register_views,
    )

    register_views(spark, sf_dir)
    listed = [t for t in list_tables(spark) if t in TESTDATA_TABLES]
    values = ", ".join(f"('{n}')" for n in sorted(listed))
    # JVM-side VALUES, not createDataFrame — a Python local-collection
    # scan pays a Python-worker spawn on first action
    return spark.sql(f"SELECT table_name FROM VALUES {values} AS t(table_name)")
