"""Golden tests for the scalar library, esp. Rupiah formatting parity
with the reference (``idx_transformation_load_script.py:284-308``):
separator swap, 'Rp -' sign placement on the absolute value, null
passthrough (SURVEY.md §7.3.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from full_docker_etl_spark.functions.scalars import (
    collapse_whitespace,
    format_rupiah,
    name_underscore,
    safe_div,
)


def _one_col(spark, rows, schema, expr):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr).collect()]


def test_format_rupiah_golden(spark):
    got = _one_col(
        spark,
        [(1234567.89,), (-1234567.89,), (0.0,), (None,), (999.5,), (0.01,)],
        "x double",
        format_rupiah(F.col("x")),
    )
    assert got == [
        "Rp 1.234.567,89",
        "Rp -1.234.567,89",
        "Rp 0,00",
        None,
        "Rp 999,50",
        "Rp 0,01",
    ]


def test_safe_div(spark):
    got = _one_col(
        spark,
        [(10.0, 2.0), (10.0, 0.0), (None, 2.0)],
        "a double, b double",
        safe_div(F.col("a"), F.col("b")),
    )
    assert got == [5.0, None, None]


def test_name_underscore_and_collapse(spark):
    got = _one_col(
        spark,
        [("PT Astra  International Tbk",)],
        "s string",
        name_underscore(F.col("s")),
    )
    assert got == ["PT_Astra_International_Tbk"]
    got = _one_col(
        spark,
        [("  a \t b\n\nc ",)],
        "s string",
        collapse_whitespace(F.col("s")),
    )
    assert got == ["a b c"]
