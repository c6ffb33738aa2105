"""Registered queries for file/REST sources (S1-S5): CSV round trip
with explicit schema, binary landing dir + ZIP→XML extraction feeding
the XBRL parser, and the distributed rate-limited fetch."""

from __future__ import annotations

import io
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.xbrl import financial_metrics, with_parsed_xbrl
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table
from full_docker_etl_spark.sources.files import (
    STOCK_MASTER_SCHEMA,
    extract_zip_xml,
    read_binary_dir,
    read_csv,
)
from full_docker_etl_spark.sources.rest import SyntheticFetcher, fetch_ohlcv


@query(
    "csv_scan",
    oracle="""
      SELECT 'C' || CAST(c_custkey AS VARCHAR) AS kode,
             c_name AS nama_perusahaan,
             c_mktsegment AS papan_pencatatan
      FROM customer WHERE c_custkey < 200
    """,
)
def csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: stock-master CSV scan with an EXPLICIT schema (no
    inference pass), via a write→read round trip (the testdata ships no
    CSV). Missing schema columns surface as NULL, reference posture."""
    # NB: an explicit CSV schema binds by POSITION, not header name —
    # the file must carry every schema column in order (absent middle
    # columns are written empty, read back as NULL).
    master = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("kode"),
            F.col("c_name").alias("nama_perusahaan"),
            F.lit(None).cast("date").alias("tanggal_pencatatan"),
            F.lit(None).cast("long").alias("saham"),
            F.col("c_mktsegment").alias("papan_pencatatan"),
        )
    )
    path = tempfile.mkdtemp(prefix="fde_csv_") + "/master"
    master.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv(spark, path, STOCK_MASTER_SCHEMA)
    return back.select("kode", "nama_perusahaan", "papan_pencatatan")


def _make_zip_landing(spark: SparkSession, sf_dir: str) -> str:
    """Build a landing dir of XBRL instance zips from supplier rows.
    Driver-side file creation is an ingestion FIXTURE, so it is capped:
    the distributed part under test (binaryFile scan → per-executor
    unzip → parse) doesn't get more interesting with more tiny files,
    it just serializes the driver."""
    rows = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .orderBy("s_suppkey")
        .limit(64)
        .collect()
    )
    d = tempfile.mkdtemp(prefix="fde_zips_")
    for r in rows:
        xml = (
            '<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance" '
            'xmlns:idx-cor="http://www.idx.co.id/xbrl/taxonomy/2014-04-30/cor">'
            f'<idx-cor:Equity contextRef="CurrentYearInstant">{r.s_acctbal}'
            "</idx-cor:Equity>"
            f'<idx-cor:Liabilities contextRef="CurrentYearInstant">{r.s_acctbal * 2}'
            "</idx-cor:Liabilities></xbrli:xbrl>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("readme.txt", "ignore me")
            zf.writestr("instance_report.xml", xml)
        with open(os.path.join(d, f"report_{r.s_suppkey}.zip"), "wb") as f:
            f.write(buf.getvalue())
    return d


@query(
    "zip_xml_ingest",
    oracle="""
      WITH s AS (SELECT s_suppkey, s_acctbal FROM supplier
                 ORDER BY s_suppkey LIMIT 64),
      m AS (
        SELECT CAST(s_suppkey AS VARCHAR) AS company_code,
               '2024' AS year, 'audit' AS period,
               CAST(NULL AS VARCHAR) AS sector,
               CAST(0.0 AS DOUBLE) AS revenue,
               CAST(0.0 AS DOUBLE) AS cost_of_revenue,
               CAST(0.0 AS DOUBLE) AS gross_profit,
               CAST(0.0 AS DOUBLE) AS net_profit_loss,
               CAST(0.0 AS DOUBLE) AS total_assets,
               s_acctbal * 2 AS total_liabilities,
               s_acctbal AS total_equity
        FROM s
      )
      SELECT company_code, year, period, sector,
             revenue, cost_of_revenue, gross_profit, net_profit_loss,
             total_assets, total_liabilities, total_equity,
             CASE WHEN total_equity <> 0
                  THEN total_liabilities / total_equity END
               AS debt_to_equity_ratio,
             (CASE WHEN revenue < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(revenue) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(revenue) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS revenue_rupiah,
             (CASE WHEN cost_of_revenue < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(cost_of_revenue) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(cost_of_revenue) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS cost_of_revenue_rupiah,
             (CASE WHEN gross_profit < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(gross_profit) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(gross_profit) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS gross_profit_rupiah,
             (CASE WHEN net_profit_loss < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(net_profit_loss) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(net_profit_loss) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS net_profit_loss_rupiah,
             (CASE WHEN total_assets < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_assets) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_assets) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_assets_rupiah,
             (CASE WHEN total_liabilities < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_liabilities) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_liabilities) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_liabilities_rupiah,
             (CASE WHEN total_equity < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_equity) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_equity) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_equity_rupiah
      FROM m
    """,
)
def zip_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5+D1: binaryFile landing dir → distributed in-memory unzip
    (instance*.xml selection, traversal guard, encoding fallback) →
    XBRL parse → metrics. The reference's Selenium download loop ends
    at the same landing-dir boundary. ORACLE-checked: the fixture
    derives every metric from supplier rows in closed form, so DuckDB
    re-derives the full output — binary scan, in-executor unzip, XML
    parse, metrics, and Rupiah strings are all value-verified; unzip
    edge cases additionally pinned in tests/test_sources.py."""
    landing = _make_zip_landing(spark, sf_dir)
    binaries = read_binary_dir(spark, landing, glob="*.zip")
    xmls = extract_zip_xml(binaries)
    reports = xmls.where(F.col("xml").isNotNull()).select(
        F.regexp_extract(F.col("source_path"), r"report_(\d+)\.zip", 1).alias(
            "company_code"
        ),
        F.lit("2024").alias("year"),
        F.lit("audit").alias("period"),
        F.col("xml").alias("data"),
    )
    return financial_metrics(with_parsed_xbrl(reports, "data"))


@query(
    "rest_batch_fetch",
    oracle="""
      WITH syms AS (SELECT 'SYM' || CAST(s_suppkey AS VARCHAR) AS symbol
                    FROM supplier),
      seeds AS (SELECT symbol,
                       list_sum(list_transform(range(1, length(symbol) + 1),
                                i -> ascii(symbol[i]) * i)) % 997 AS seed
                FROM syms),
      days AS (SELECT symbol, seed, unnest(range(0, 30)) AS d FROM seeds)
      SELECT symbol,
             COUNT(*) AS n_days,
             CAST('2024-01-01' AS DATE) AS first_day,
             CAST('2024-01-30' AS DATE) AS last_day,
             CAST(SUM(10000 + (seed * 31 + d * 17) % 5000) AS BIGINT)
               AS total_volume
      FROM days GROUP BY symbol
    """,
)
def rest_batch_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the per-ticker REST fetch as a DISTRIBUTED mapInPandas over
    the symbol table (deterministic synthetic fetcher in-container; a
    real yfinance callable drops in unchanged). The reference fetches
    951 tickers sequentially at ~10 s each — here lanes run in
    parallel with the politeness pause kept per lane. ORACLE-checked:
    the synthetic fetcher is pure integer arithmetic, so DuckDB
    re-derives every row's volume/date from the symbol alone — the
    whole Python source stage is value-verified, not just counted."""
    symbols = (
        load_table(spark, sf_dir, "supplier")
        .select(F.concat(F.lit("SYM"), F.col("s_suppkey").cast("string")).alias("symbol"))
    )
    ohlcv = fetch_ohlcv(symbols, fetcher_factory=SyntheticFetcher, parallelism=8)
    return ohlcv.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("trade_date").alias("first_day"),
        F.max("trade_date").alias("last_day"),
        F.sum("volume").alias("total_volume"),
    )
