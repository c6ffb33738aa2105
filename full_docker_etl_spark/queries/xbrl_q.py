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
        (F.col("rev") / F.lit(2.0)).cast("string"),
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


@query("xbrl_metrics")
def xbrl_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/F17/F18 + metrics + DER + Rupiah (M4): the full reports
    pipeline over synthesized instances. The decoy tags verify the
    contextRef priority inside a distributed run, not just in unit
    tests."""
    reports = synth_reports(spark, sf_dir)
    parsed = with_parsed_xbrl(reports, "data")
    return financial_metrics(parsed)
