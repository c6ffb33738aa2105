"""XBRL pipeline query: synthesize deterministic XBRL instance
documents from the orders table (the testdata has no XML), run the
full parse → extract → metrics → Rupiah path. Rows-only driver check
(the parser is a Python stage); semantics are pinned by fixture tests
in tests/test_xbrl.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.xbrl import financial_metrics, with_parsed_xbrl
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table


def synth_reports(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synthetic XBRL instance per customer: revenue/liabilities/
    equity derived from order aggregates, with contextRef variants that
    exercise the priority rule (a decoy no-context Revenue tag precedes
    the prioritized one; Equity appears only context-free)."""
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    xml = F.concat(
        F.lit(
            '<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance" '
            'xmlns:idx-cor="http://www.idx.co.id/xbrl/taxonomy/2014-04-30/cor">'
            "<idx-cor:RevenueFromContractsWithCustomers>-1"
            "</idx-cor:RevenueFromContractsWithCustomers>"
            '<idx-cor:RevenueFromContractsWithCustomers contextRef="CurrentYearDuration">'
        ),
        F.col("rev").cast("string"),
        F.lit(
            "</idx-cor:RevenueFromContractsWithCustomers>"
            '<idx-cor:Liabilities contextRef="CurrentYearInstant">'
        ),
        # rev*2 doubles the mantissa exponent only — exact in binary,
        # so every currency value stays an exact 2-decimal and the
        # Rupiah cents arithmetic can never hit a round-half tie
        (F.col("rev") * F.lit(2.0)).cast("string"),
        F.lit("</idx-cor:Liabilities><idx-cor:Equity>"),
        (F.col("n") * F.lit(1000.0)).cast("string"),
        F.lit(
            "</idx-cor:Equity>"
            '<idx-cor:Subsector contextRef="Year">S1</idx-cor:Subsector>'
            "</xbrli:xbrl>"
        ),
    )
    return per_cust.select(
        F.col("o_custkey").cast("string").alias("company_code"),
        F.lit("2024").alias("year"),
        F.lit("audit").alias("period"),
        xml.alias("data"),
    )


@query(
    "xbrl_metrics",
    oracle="""
      WITH agg AS (
        SELECT CAST(o_custkey AS VARCHAR) AS company_code,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
               COUNT(*) AS n
        FROM orders GROUP BY o_custkey
      ),
      m AS (
        SELECT company_code, '2024' AS year, 'audit' AS period, 'S1' AS sector,
               rev AS revenue,
               CAST(0.0 AS DOUBLE) AS cost_of_revenue,
               CAST(0.0 AS DOUBLE) AS gross_profit,
               CAST(0.0 AS DOUBLE) AS net_profit_loss,
               CAST(0.0 AS DOUBLE) AS total_assets,
               rev * 2 AS total_liabilities,
               CAST(n * 1000.0 AS DOUBLE) AS total_equity
        FROM agg
      )
      SELECT company_code, year, period, sector,
             revenue, cost_of_revenue, gross_profit, net_profit_loss,
             total_assets, total_liabilities, total_equity,
             total_liabilities / total_equity AS debt_to_equity_ratio,
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
def xbrl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/F17/F18 + metrics + DER + Rupiah (M4): the full reports
    pipeline over synthesized instances. The decoy tags verify the
    contextRef priority inside a distributed run, not just in unit
    tests."""
    reports = synth_reports(spark, sf_dir)
    parsed = with_parsed_xbrl(reports, "data")
    return financial_metrics(parsed)
