"""Unit tests for the schema-conform operator (SURVEY.md §1.3, P2-P5).

Covers the round-1 advice findings: cast-before-repair for unparseable
strings, integral-target NaN repair (the reference's Volume double→long,
``TransForm_Load_Yfinance.py:204-208``), rename-collision safety, and
required-column hard failure
(``idx_transformation_load_script.py:346-350``).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import types as T

from full_docker_etl_spark.operators.conform import (
    ConformSpec,
    MissingRequiredColumns,
    conform_schema,
)

PRICE_SPEC = ConformSpec(
    renames={"Stock Splits": "Stock_Splits"},
    columns={
        "Open": (T.DoubleType(), 0.0),
        "Close": (T.DoubleType(), 0.0),
        "Volume": (T.LongType(), 0),
        "Dividends": (T.DoubleType(), 0.0),
        "Stock_Splits": (T.DoubleType(), 0.0),
    },
    required=("Open", "Close"),
    drop_null_keys=("Date",),
)


def _rows(df):
    return [r.asDict() for r in df.collect()]


def test_nan_and_null_repair_floating(spark):
    df = spark.createDataFrame(
        [("2024-01-01", float("nan"), 1.0, 10.0), ("2024-01-02", None, 2.0, 20.0)],
        "Date string, Open double, Close double, Volume double",
    )
    out = conform_schema(df, PRICE_SPEC)
    got = {r["Date"]: r for r in _rows(out)}
    assert got["2024-01-01"]["Open"] == 0.0
    assert got["2024-01-02"]["Open"] == 0.0


def test_nan_double_source_to_long_target(spark):
    # The reference's Volume: NaN in a double column cast to long must
    # land on the default, not on Spark's silent NaN→0 integral cast.
    df = spark.createDataFrame(
        [("a", 1.0, 1.0, float("nan")), ("b", 1.0, 1.0, 123.9)],
        "Date string, Open double, Close double, Volume double",
    )
    spec = ConformSpec(
        columns={"Volume": (T.LongType(), -1)}, required=("Open",)
    )
    got = {r["Date"]: r for r in _rows(conform_schema(df, spec))}
    assert got["a"]["Volume"] == -1
    assert got["b"]["Volume"] == 123  # truncating cast, reference semantics


def test_uncastable_string_gets_default(spark):
    df = spark.createDataFrame(
        [("a", "abc", "1.5", "7")],
        "Date string, Open string, Close string, Volume string",
    )
    out = conform_schema(df, PRICE_SPEC)
    row = _rows(out)[0]
    assert row["Open"] == 0.0  # "abc" fails the cast → typed default
    assert row["Close"] == 1.5
    assert row["Volume"] == 7
    assert row["Dividends"] == 0.0  # missing column added with default


def test_nan_string_to_double_gets_default(spark):
    df = spark.createDataFrame(
        [("a", "NaN", "1.0", "1")],
        "Date string, Open string, Close string, Volume string",
    )
    row = _rows(conform_schema(df, PRICE_SPEC))[0]
    assert row["Open"] == 0.0 and not math.isnan(row["Open"])


def test_rename_and_collision(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0, 1.0, 1.0, 1)],
        "`Stock Splits` double, Stock_Splits double, Open double, Close double, Volume long",
    )
    out = conform_schema(df, PRICE_SPEC)
    assert out.columns.count("Stock_Splits") == 1
    assert _rows(out)[0]["Stock_Splits"] == 2.0  # existing target wins

    df2 = spark.createDataFrame(
        [(3.0, 1.0, 1.0, 1)],
        "`Stock Splits` double, Open double, Close double, Volume long",
    )
    assert _rows(conform_schema(df2, PRICE_SPEC))[0]["Stock_Splits"] == 3.0


def test_missing_required_raises(spark):
    df = spark.createDataFrame([(1.0,)], "Open double")
    with pytest.raises(MissingRequiredColumns):
        conform_schema(df, PRICE_SPEC)


def test_drop_null_keys(spark):
    df = spark.createDataFrame(
        [("2024-01-01", 1.0, 1.0, 1), (None, 2.0, 2.0, 2)],
        "Date string, Open double, Close double, Volume long",
    )
    out = conform_schema(df, PRICE_SPEC)
    assert out.count() == 1
