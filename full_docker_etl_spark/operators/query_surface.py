"""The interactive query surface: every Flask-endpoint semantics from
the reference's API (``api/app.py``), as parameterized DataFrame
functions instead of Mongo filter dicts.

Reference behaviors covered (SURVEY.md §2.2/§2.6):

- equality / range filter-dict build (``api/app.py:42-49``) — P7/P8
- case-insensitive substring search (``:144-151``) — P9 (Mongo $regex
  without anchors is substring match, so `contains`, not `rlike`)
- disjunctive multi-column search (``:253-258``) — P10
- IN-list / pending-status predicates
  (``transform_iqplus_news_dags.py:78-83``) — P11/P12
- point lookup (``:323``) — P13
- pagination via skip/limit (``:227-265``) — O2/O5, made deterministic
  with a row_number over a total order (the reference paginates with
  NO stable order — a latent bug we do not replicate)
- sort by (nested) field + top-k (``:151``; NewsController) — O1/O3

Everything is a Column expression — filters reach the parquet scan as
pushed-down predicates, pagination is a window, nothing collects.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def eq_filter(col: str, value) -> Column:
    """P7: ``{field: value}``."""
    return F.col(col) == F.lit(value)


def range_filter(col: str, lo=None, hi=None) -> Column:
    """P8: ``{field: {$gte: lo, $lte: hi}}`` — either bound optional."""
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (F.col(col) >= F.lit(lo))
    if hi is not None:
        cond = cond & (F.col(col) <= F.lit(hi))
    return cond


def contains_ci(col: str, needle: str) -> Column:
    """P9: ``{$regex: s, $options: "i"}`` — unanchored Mongo regex is a
    case-insensitive substring match."""
    return F.lower(F.col(col)).contains(needle.lower())


def any_contains_ci(cols: Iterable[str], needle: str) -> Column:
    """P10: ``$or`` of case-insensitive substring predicates."""
    cond = F.lit(False)
    for c in cols:
        cond = cond | contains_ci(c, needle)
    return cond


def in_list(col: str, values: Iterable) -> Column:
    """P11: ``{field: {$in: [...]}}``."""
    return F.col(col).isin(list(values))


def pending_filter(status_col: str, pending_value: str) -> Column:
    """P12: ``$or: [{status: pending}, {status: {$exists: false}}]`` —
    the new-items-only incremental predicate (T2)."""
    return (F.col(status_col) == F.lit(pending_value)) | F.col(status_col).isNull()


def point_lookup(df: DataFrame, col: str, value) -> DataFrame:
    """P13: ``find_one({key: value})`` — a pushed-down key probe."""
    return df.where(eq_filter(col, value)).limit(1)


def order_spec(pairs: list[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in pairs]


def paginate(
    df: DataFrame,
    order: list[tuple[str, bool]],
    page: int,
    per_page: int,
    out_col: str = "rn",
) -> DataFrame:
    """O2/O5: deterministic pagination. ``order`` MUST end in a unique
    tie-break key (the reference pages without a total order —
    ``api/app.py:264-265`` — which is nondeterministic; we don't copy
    that). row_number is computed over an un-partitioned window: fine
    for page-sized results, and Spark fuses it with the sort."""
    w = Window.orderBy(*order_spec(order))
    lo = (page - 1) * per_page + 1
    hi = page * per_page
    return (
        df.withColumn(out_col, F.row_number().over(w))
        .where(F.col(out_col).between(lo, hi))
    )


def top_k(df: DataFrame, order: list[tuple[str, bool]], k: int) -> DataFrame:
    """O1/O3: sort + head — Spark executes this as TakeOrderedAndProject
    (no full sort materialization)."""
    return df.orderBy(*order_spec(order)).limit(k)


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A6: ``collection.distinct(field)``."""
    return df.select(col).distinct()
