"""Fixture tests pinning the XBRL parser's order-sensitive semantics
(SURVEY.md §7.3.1) and the metric pipeline, including a direct parity
check of our built-in Rupiah formatter against the reference UDF's
Python formatting (``idx_transformation_load_script.py:284-308``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_docker_etl_spark.functions.scalars import format_rupiah
from full_docker_etl_spark.operators.xbrl import (
    financial_metrics,
    parse_xbrl_to_map,
    with_parsed_xbrl,
)

NS = (
    'xmlns:xbrli="http://www.xbrl.org/2003/instance" '
    'xmlns:idx-cor="http://www.idx.co.id/xbrl/taxonomy/2014-04-30/cor"'
)


def test_context_priority_beats_document_order():
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:Revenue>111</idx-cor:Revenue>
      <idx-cor:Revenue contextRef="Interim">222</idx-cor:Revenue>
      <idx-cor:Revenue contextRef="CurrentYearDuration">333</idx-cor:Revenue>
    </xbrli:xbrl>"""
    # prioritized context wins over earlier no-context and wrong-context
    assert parse_xbrl_to_map(xml)["revenue"] == "333"


def test_prioryear_substring_quirk_is_preserved():
    """Reference quirk we deliberately reproduce: contextRef matching is
    SUBSTRING containment, so 'PriorYear' contains target 'Year' and is
    treated as prioritized (``idx_transformation_load_script.py:243``).
    A fixed engine would anchor the match; parity wins here."""
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:Revenue contextRef="PriorYear">222</idx-cor:Revenue>
      <idx-cor:Revenue contextRef="CurrentYearDuration">333</idx-cor:Revenue>
    </xbrli:xbrl>"""
    assert parse_xbrl_to_map(xml)["revenue"] == "222"


def test_first_wins_within_priority_pass():
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:Assets contextRef="CurrentYearInstant">1</idx-cor:Assets>
      <idx-cor:Assets contextRef="YTD">2</idx-cor:Assets>
    </xbrli:xbrl>"""
    assert parse_xbrl_to_map(xml)["assets"] == "1"


def test_no_context_fallback_only_fills_gaps():
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:Equity>77</idx-cor:Equity>
      <idx-cor:Liabilities contextRef="Year">55</idx-cor:Liabilities>
    </xbrli:xbrl>"""
    m = parse_xbrl_to_map(xml)
    assert m["equity"] == "77" and m["liabilities"] == "55"


def test_substring_context_match():
    # the reference matches contextRef by SUBSTRING containment
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:Equity contextRef="Ctx_CurrentYearInstant_Cons">9</idx-cor:Equity>
    </xbrli:xbrl>"""
    assert parse_xbrl_to_map(xml)["equity"] == "9"


def test_malformed_and_empty_inputs():
    assert parse_xbrl_to_map("<unclosed") == {}
    assert parse_xbrl_to_map("not xml at all") == {}
    assert parse_xbrl_to_map("") == {}
    assert parse_xbrl_to_map(None) == {}
    assert parse_xbrl_to_map("   ") == {}


def test_pipeline_metrics_and_der(spark):
    xml = f"""<xbrli:xbrl {NS}>
      <idx-cor:RevenueFromContractsWithCustomers contextRef="CurrentYearDuration">1000.5</idx-cor:RevenueFromContractsWithCustomers>
      <idx-cor:Liabilities contextRef="CurrentYearInstant">600</idx-cor:Liabilities>
      <idx-cor:Equity contextRef="CurrentYearInstant">300</idx-cor:Equity>
      <idx-cor:Subsector contextRef="Year">Banking</idx-cor:Subsector>
    </xbrli:xbrl>"""
    zero_eq = xml.replace(">300<", ">0<")
    df = spark.createDataFrame(
        [("AAAA", "2024", "tw1", xml), ("BBBB", "2024", "tw1", zero_eq),
         ("CCCC", "2024", "tw1", "<bad")],
        "company_code string, year string, period string, data string",
    )
    out = {
        r.company_code: r
        for r in financial_metrics(with_parsed_xbrl(df, "data")).collect()
    }
    a = out["AAAA"]
    assert a.revenue == 1000.5 and a.total_liabilities == 600.0
    assert a.sector == "Banking"
    assert a.debt_to_equity_ratio == 2.0
    assert a.revenue_rupiah == "Rp 1.000,50"
    b = out["BBBB"]
    assert b.debt_to_equity_ratio is None  # zero equity → NULL, not error
    c = out["CCCC"]  # unparseable → defaults, pipeline survives
    assert c.revenue == 0.0 and c.sector is None
    assert c.revenue_rupiah == "Rp 0,00"


def test_rupiah_matches_reference_python_formatting(spark):
    """Grid parity with the reference UDF's exact algorithm."""

    def reference_format(amount):
        if amount is None:
            return None
        float_amount = float(amount)
        if float_amount == 0:
            return "Rp 0,00"
        s = f"{abs(float_amount):,.2f}".replace(".", "#").replace(",", ".").replace("#", ",")
        prefix = "Rp " if float_amount >= 0 else "Rp -"
        return f"{prefix}{s}"

    values = [0.0, 0.01, -0.01, 1.0, 999.99, 1000.0, -1234567.89,
              1234567.89, 1e9 + 0.5, -1e12, 123456789.01]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r[0] for r in df.select(format_rupiah(F.col("x"))).collect()]
    assert got == [reference_format(v) for v in values]
