"""XBRL financial-report path (SURVEY.md §2 D1/F17/F18, M4).

Replicates the reference's parse-and-extract semantics
(``idx_transformation_load_script.py:207-262,375-467``):

- contextRef priority: elements whose contextRef contains one of
  CurrentYearDuration / CurrentYearInstant / Year / YTD win; elements
  with NO contextRef fill remaining tags second; first match per tag
  wins within each pass (document order);
- tag name = local name (namespace stripped);
- malformed / empty XML → empty map (never an error);
- metric extraction: coalesce(cast(value as double), 0.0) per tag,
  DER = liabilities/equity guarded on zero equity, Rupiah display
  columns.

Engine differences from the reference (better, not different results):

- ONE Python stage: the parser is an Arrow-batched pandas UDF that
  lower-cases map keys at parse time, so the per-tag lookup is the
  built-in ``element_at`` (the reference burns a second row-wise UDF
  per tag, ``:264-282``);
- Rupiah formatting is pure built-ins (functions/scalars.py), not a
  third UDF.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from full_docker_etl_spark.functions.scalars import format_rupiah, safe_div

TARGET_CONTEXTS = ("CurrentYearDuration", "CurrentYearInstant", "Year", "YTD")

# metric column -> XBRL tag (reference financial_tags_map,
# idx_transformation_load_script.py:375-394)
FINANCIAL_TAGS = {
    "sector": "Subsector",
    "revenue": "RevenueFromContractsWithCustomers",
    "cost_of_revenue": "CostOfGoodsSoldAndServices",
    "gross_profit": "GrossProfit",
    "net_profit_loss": "ProfitLoss",
    "total_assets": "Assets",
    "total_liabilities": "Liabilities",
    "total_equity": "Equity",
}

CURRENCY_COLUMNS = (
    "revenue",
    "cost_of_revenue",
    "gross_profit",
    "net_profit_loss",
    "total_assets",
    "total_liabilities",
    "total_equity",
)


def parse_xbrl_to_map(xml_string: str | None) -> dict[str, str]:
    """Pure-Python XBRL instance → {lower(localname): value}.

    Two passes in document order (contextRef-priority then no-context
    fallback), first-wins per tag — pinned by fixture tests because the
    rule is order-sensitive (SURVEY.md §7.3.1). Keys are lower-cased
    HERE so downstream lookup needs no case-insensitive UDF."""
    if not xml_string or not isinstance(xml_string, str):
        return {}
    xml_string = xml_string.strip()
    if not xml_string or not xml_string.startswith("<"):
        return {}
    try:
        root = ET.fromstring(xml_string)
    except ET.ParseError:
        return {}

    data: dict[str, str] = {}
    elems = list(root.iter())
    for elem in elems:  # pass 1: prioritized contexts
        if elem.tag and elem.text:
            tag = elem.tag.split("}")[-1].lower()
            ref = elem.get("contextRef")
            if ref and any(c in ref for c in TARGET_CONTEXTS) and tag not in data:
                data[tag] = elem.text.strip()
    for elem in elems:  # pass 2: context-free fallback
        if elem.tag and elem.text:
            tag = elem.tag.split("}")[-1].lower()
            if elem.get("contextRef") is None and tag not in data:
                data[tag] = elem.text.strip()
    return data


@F.pandas_udf(T.MapType(T.StringType(), T.StringType()))
def _parse_xbrl_batch(xml: pd.Series) -> pd.Series:
    return xml.map(parse_xbrl_to_map)


def with_parsed_xbrl(df: DataFrame, xml_col: str, out_col: str = "parsed_data") -> DataFrame:
    """D1: attach the parsed tag map. Arrow-batched (one Python
    crossing per batch); explicit MapType output keeps Catalyst able to
    prune every other column around this stage. The input is spread to
    cluster parallelism first — XML parsing is CPU-bound per row, and
    an AQE-coalesced (or single-file) upstream otherwise serializes the
    whole parse on one worker."""
    from full_docker_etl_spark.operators.util import spread

    return spread(df).withColumn(out_col, _parse_xbrl_batch(F.col(xml_col)))


def _tag(map_col: Column, metric: str) -> Column:
    """F18 without a UDF: keys were lower-cased at parse time."""
    return F.element_at(map_col, FINANCIAL_TAGS[metric].lower())


def financial_metrics(
    df: DataFrame,
    map_col: str = "parsed_data",
    keep: tuple[str, ...] = ("company_code", "year", "period"),
) -> DataFrame:
    """Metric extraction + DER + Rupiah display columns
    (``idx_transformation_load_script.py:398-467``)."""
    m = F.col(map_col)
    cols: list[Column] = [F.col(c) for c in keep]
    cols.append(_tag(m, "sector").alias("sector"))
    for metric in CURRENCY_COLUMNS:
        cols.append(
            F.coalesce(_tag(m, metric).try_cast("double"), F.lit(0.0)).alias(metric)
        )
    out = df.select(*cols)
    out = out.withColumn(
        "debt_to_equity_ratio",
        safe_div(F.col("total_liabilities"), F.col("total_equity")),
    )
    for metric in CURRENCY_COLUMNS:
        out = out.withColumn(f"{metric}_rupiah", format_rupiah(F.col(metric)))
    return out
