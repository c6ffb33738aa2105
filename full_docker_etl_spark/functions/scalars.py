"""Scalar function library (SURVEY.md §2.8 F1-F21) — every reference
scalar as a pure built-in Column expression, ZERO Python UDFs.

The interesting ones:

- :func:`format_rupiah` replaces the reference's row-at-a-time Python
  UDF (``idx_transformation_load_script.py:284-308``) with built-ins:
  Indonesian money format uses '.' for thousands and ',' for decimals,
  with a ``Rp `` / ``Rp -`` prefix on the absolute value. format_number
  gives the en-US grouping; one translate() swaps the separators.
  Staying JVM-side keeps the whole projection in whole-stage codegen —
  ~10-100x over the Python-UDF hot path at scale.
- :func:`safe_div` is the reference's DER guard
  (``idx_transformation_load_script.py:448-454``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_rupiah(col: Column, decimals: int = 2) -> Column:
    """``1234567.89`` → ``'Rp 1.234.567,89'``; negatives → ``'Rp -…'``
    (sign placed after the prefix, magnitude formatted absolute —
    reference semantics at ``idx_transformation_load_script.py:290-300``).
    """
    grouped = F.format_number(F.abs(col), decimals)  # '1,234,567.89'
    swapped = F.translate(grouped, ",.", ".,")  # '1.234.567,89'
    prefix = F.when(col < 0, F.lit("Rp -")).otherwise(F.lit("Rp "))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(prefix, swapped)
    )


def safe_div(num: Column, den: Column) -> Column:
    """F14: NULL (not error, not inf) when the denominator is 0 —
    the reference's DER ratio guard."""
    return F.when(den != 0, num / den).otherwise(F.lit(None).cast("double"))


def name_underscore(col: Column) -> Column:
    """F9: space→underscore normalization of entity names — the
    reference derives Mongo collection names this way
    (``extractyfinance.py:141``); here it is just a derived column."""
    return F.regexp_replace(col, r"\s+", "_")


def format_compact_id(col: Column) -> Column:
    """F21: Indonesian compact number rendering (the dashboard's
    ``Intl.NumberFormat('id-ID', notation:'compact')``):
    ``1234567`` → ``'1,2 jt'``; rb/jt/M/T = ribu/juta/miliar/triliun.
    Positive HALF_UP and half-away-from-zero agree, so the rounding is
    engine-portable on the absolute value."""

    def fmt(scaled: Column) -> Column:
        return F.translate(F.round(scaled, 1).cast("string"), ".", ",")

    mag = F.abs(col)
    sign = F.when(col < 0, F.lit("-")).otherwise(F.lit(""))
    return (
        F.when(mag >= 1e12, F.concat(sign, fmt(mag / 1e12), F.lit(" T")))
        .when(mag >= 1e9, F.concat(sign, fmt(mag / 1e9), F.lit(" M")))
        .when(mag >= 1e6, F.concat(sign, fmt(mag / 1e6), F.lit(" jt")))
        .when(mag >= 1e3, F.concat(sign, fmt(mag / 1e3), F.lit(" rb")))
        .otherwise(F.concat(sign, fmt(mag)))
    )


def collapse_whitespace(col: Column) -> Column:
    """F10: whitespace collapse + trim
    (``extract_iqplus_news_dag.py:96-97``)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))
