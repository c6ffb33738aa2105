"""Registered queries exercising the scalar-function library
(SURVEY.md §2.8 F1-F21) against the testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_docker_etl_spark.functions.scalars import (
    collapse_whitespace,
    format_compact_id,
    format_rupiah,
    name_underscore,
    safe_div,
)
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table


@query(
    "fn_dates",
    oracle="""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS ymd,
             strftime(o_orderdate, '%Y-%m') AS ym,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
             strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso_ts,
             strftime(o_orderdate + INTERVAL 7 HOURS, '%Y-%m-%d %H:%M') AS wib_time
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def fn_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3/F5/F6: date_format, year, period-start trunc, ISO
    rendering, timezone shift (UTC→WIB, the reference's pendulum usage,
    ``idx_data_ETL_pipeline_parallel.py:144``)."""
    return (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("ymd"),
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.year("o_orderdate").cast("int").alias("yr"),
            F.trunc("o_orderdate", "month").alias("month_start"),
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("iso_ts"),
            F.date_format(
                F.from_utc_timestamp("o_orderdate", "Asia/Jakarta"),
                "yyyy-MM-dd HH:mm",
            ).alias("wib_time"),
        )
    )


@query(
    "fn_strings",
    oracle="""
      SELECT doc_id,
             upper(source) AS src_upper,
             source || '_' || lang AS src_lang,
             regexp_replace(substr(text, 1, 30), '\\s+', '_', 'g') AS head_norm,
             trim(regexp_replace(text, '\\s+', ' ', 'g')) AS collapsed,
             substr(text, 1, 50) AS truncated
      FROM documents
    """,
)
def fn_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8/F9/F10/F11: concat, case normalization, space→underscore,
    whitespace collapse, substring truncation (the news pipeline's
    50k-char cap, ``transform_iqplus_news_dags.py:110-113``)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.upper("source").alias("src_upper"),
        F.concat(F.col("source"), F.lit("_"), F.col("lang")).alias("src_lang"),
        name_underscore(F.substring("text", 1, 30)).alias("head_norm"),
        collapse_whitespace(F.col("text")).alias("collapsed"),
        F.substring("text", 1, 50).alias("truncated"),
    )


@query(
    "fn_rupiah",
    oracle="""
      WITH c AS (
        SELECT o_orderkey, o_totalprice - 150000.0 AS charge,
               CAST(round(abs(o_totalprice - 150000.0) * 100) AS BIGINT) AS cents
        FROM orders
      )
      SELECT o_orderkey, charge,
             (CASE WHEN charge < 0 THEN 'Rp -' ELSE 'Rp ' END)
             || replace(format('{:,}', cents // 100), ',', '.')
             || ',' || lpad(CAST(cents % 100 AS VARCHAR), 2, '0') AS charge_rupiah
      FROM c
    """,
)
def fn_rupiah(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: Indonesian Rupiah display format with built-ins only — no
    UDF (reference uses a Python UDF,
    ``idx_transformation_load_script.py:284-308``). Negative values
    exercise the 'Rp -' sign placement."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_totalprice") - F.lit(150000.0)).alias("charge")
    )
    return orders.select(
        "o_orderkey",
        "charge",
        format_rupiah(F.col("charge")).alias("charge_rupiah"),
    )


@query(
    "fn_safe_div",
    oracle="""
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_discount <> 0 THEN l_extendedprice / l_discount
                  ELSE NULL END AS price_per_disc
      FROM lineitem
    """,
)
def fn_safe_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14: guarded division — NULL on zero denominator (the DER ratio,
    ``idx_transformation_load_script.py:448-454``). Raw IEEE division
    of identical doubles is bit-deterministic across engines."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        safe_div(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_disc"
        ),
    )


@query(
    "fn_coalesce_cast",
    oracle="""
      SELECT event_id,
             CAST(event_id AS VARCHAR) AS id_str,
             COALESCE(CAST(json_extract_string(props, '$.missing') AS DOUBLE), 0.0)
               AS missing_val,
             CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val,
             CAST(floor(value) AS INTEGER) AS value_floor
      FROM events
    """,
)
def fn_coalesce_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/F16/F20: coalesce-defaulting, numeric cast family, id→string
    (``idx_transformation_load_script.py:407-440``; ``api/app.py:56``).
    Integer conversion is an explicit floor — Spark CAST truncates but
    DuckDB CAST rounds, so bare casts are not portable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        F.coalesce(
            F.get_json_object("props", "$.missing").cast("double"), F.lit(0.0)
        ).alias("missing_val"),
        F.get_json_object("props", "$.k").cast("double").alias("k_val"),
        F.floor("value").cast("int").alias("value_floor"),
    )


_COMPACT_CASE = """
      CASE WHEN abs({x}) >= 1e12
             THEN {sign} || translate(CAST(round(abs({x})/1e12, 1) AS VARCHAR), '.', ',') || ' T'
           WHEN abs({x}) >= 1e9
             THEN {sign} || translate(CAST(round(abs({x})/1e9, 1) AS VARCHAR), '.', ',') || ' M'
           WHEN abs({x}) >= 1e6
             THEN {sign} || translate(CAST(round(abs({x})/1e6, 1) AS VARCHAR), '.', ',') || ' jt'
           WHEN abs({x}) >= 1e3
             THEN {sign} || translate(CAST(round(abs({x})/1e3, 1) AS VARCHAR), '.', ',') || ' rb'
           ELSE {sign} || translate(CAST(round(abs({x}), 1) AS VARCHAR), '.', ',')
      END
""".strip()


def _compact(x: str) -> str:
    sign = f"(CASE WHEN {x} < 0 THEN '-' ELSE '' END)"
    return _COMPACT_CASE.format(x=x, sign=sign)


@query(
    "fn_compact",
    oracle=f"""
      SELECT o_orderkey,
             {_compact('o_totalprice')} AS compact_raw,
             {_compact('(o_totalprice * 10000.0)')} AS compact_big,
             {_compact('(0.0 - o_totalprice * 10000000.0)')} AS compact_neg_t,
             {_compact('(o_totalprice / 1000.0)')} AS compact_small
      FROM orders
    """,
)
def fn_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F21: id-ID compact number rendering (rb/jt/M/T) — the
    dashboard's display formatting as engine columns; scaled variants
    hit every magnitude branch including negatives."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        format_compact_id(p).alias("compact_raw"),
        format_compact_id(p * 10000.0).alias("compact_big"),
        format_compact_id(F.lit(0.0) - p * 10000000.0).alias("compact_neg_t"),
        format_compact_id(p / 1000.0).alias("compact_small"),
    )


@query(
    "fn_to_json",
    oracle="""
      SELECT o_orderkey,
             CAST(to_json(struct_pack(o_orderkey := o_orderkey,
                                      o_orderstatus := o_orderstatus))
                  AS VARCHAR) AS doc
      FROM orders
    """,
)
def fn_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F19: row→JSON serialization (the extract's to_json handoff,
    ``extractyfinance.py:203``). Integer+string fields only — float
    JSON rendering differs across engines."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_json(F.struct("o_orderkey", "o_orderstatus")).alias("doc"),
    )


@query(
    "fn_arrays",
    oracle="""
      SELECT doc_id,
             len(toks) AS n_tok,
             len(list_distinct(toks)) AS n_distinct_tok,
             array_to_string(list_sort(toks)[1:3], ' ') AS first3,
             CAST(list_sum(list_transform(toks, t -> length(t)))
                  AS BIGINT) AS total_chars,
             list_contains(toks, 'data') AS has_data
      FROM (SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents)
    """,
)
def fn_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function surface in one pass — size,
    distinct, sort+slice, lambda fold (F.aggregate), membership — all
    JVM expressions inside whole-stage codegen, the idiom that keeps
    per-row collection logic OUT of Python UDFs. Arrays are surfaced
    as scalars (joined strings / counts) because array reprs don't
    hash portably across engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tok"),
        F.concat_ws(" ", F.slice(F.array_sort(toks), 1, 3)).alias("first3"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.length(t),
        ).alias("total_chars"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@query(
    "fn_maps",
    oracle="""
      SELECT doc_id,
             CAST(cardinality(m) AS INTEGER) AS n_keys,
             m['lang'][1] AS lang_val,
             array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
             m['missing'][1] AS absent
      FROM (SELECT doc_id, map(['lang','source'], [lang, source]) AS m
            FROM documents)
    """,
)
def fn_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-function surface (F17/F18's element_at lookup
    generalized): construct from arrays, size, lookup (present and
    absent → NULL, the Mongo-style optional-field read), sorted key
    census — all JVM expressions; maps are surfaced as scalars because
    map reprs don't hash portably across engines."""
    docs = load_table(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")),
        F.array(F.col("lang"), F.col("source")),
    )
    return docs.select(
        "doc_id",
        F.size(m).alias("n_keys"),
        F.element_at(m, "lang").alias("lang_val"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(m, "missing").alias("absent"),
    )
