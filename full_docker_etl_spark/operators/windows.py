"""Window-function operators (SURVEY.md §2.5).

The reference has no window functions; its closest analogues are a
driver-side ``collect()[0][0]`` for latest-date
(``dag_transform_load_yfinance_fixed.py:333``) and unordered
skip/limit pagination. These are the idiomatic distributed forms, plus
the analytic extensions (lag returns, moving averages, running totals)
that the OHLCV table begs for.

All orderings used for ranking MUST end in a unique tie-break key —
determinism is part of each operator's contract here, not an
afterthought.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _order(pairs: list[tuple[str, bool]]) -> list[Column]:
    return [F.col(c).asc() if asc else F.col(c).desc() for c, asc in pairs]


def window_of(partition: list[str], order: list[tuple[str, bool]]) -> WindowSpec:
    return Window.partitionBy(*partition).orderBy(*_order(order))


def latest_per_group(
    df: DataFrame, partition: list[str], order: list[tuple[str, bool]]
) -> DataFrame:
    """row_number()==1 per group — replaces the reference's collect-based
    'latest date per stock'. No data leaves the executors."""
    w = window_of(partition, order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def rank_top_n(
    df: DataFrame,
    partition: list[str],
    order: list[tuple[str, bool]],
    n: int,
    out_col: str = "rn",
) -> DataFrame:
    """Top-N per group via row_number ≤ N (deterministic with a unique
    tie-break in ``order``)."""
    w = window_of(partition, order)
    return df.withColumn(out_col, F.row_number().over(w)).where(F.col(out_col) <= n)


def with_lag(
    df: DataFrame,
    col: str,
    partition: list[str],
    order: list[tuple[str, bool]],
    out_col: str,
    offset: int = 1,
) -> DataFrame:
    """lag() — the building block for period-over-period change /
    daily-return analytics."""
    return df.withColumn(
        out_col, F.lag(F.col(col), offset).over(window_of(partition, order))
    )


def moving_agg(
    df: DataFrame,
    agg: Column,
    partition: list[str],
    order: list[tuple[str, bool]],
    preceding: int,
    out_col: str,
) -> DataFrame:
    """Rows-based moving aggregate over (preceding, current]."""
    w = window_of(partition, order).rowsBetween(-preceding, 0)
    return df.withColumn(out_col, agg.over(w))


def time_range_agg(
    df: DataFrame,
    agg: Column,
    partition: list[str],
    ts_col: str,
    days: int,
    out_col: str,
) -> DataFrame:
    """Time-RANGE moving aggregate: the frame is every row whose
    timestamp falls in the trailing ``days`` window of the CURRENT
    row's timestamp — value-based ``rangeBetween``, not row counts, so
    irregular gaps (weekends, missing days, bursts) are handled by the
    frame definition itself instead of a fragile rows-offset guess.
    Same shuffle shape as any window (one exchange on the partition
    key); the range frame is evaluated with a sliding pointer over the
    sorted partition, not by re-scanning the window per row.

    Boundaries are SECOND-granularity by convention (timestamp cast to
    long = whole epoch seconds, which every oracle mirrors with
    epoch()): two rows exactly ``days`` apart wall-clock can land in or
    out of each other's frame depending on their sub-second parts, by
    design and identically on both engines. ``ts_col`` must be a real
    timestamp — an epoch-micros LONG column would silently make the
    'days' window microseconds-scaled (≈2.6 s for 30 'days'), so
    non-timestamp types raise."""
    dt = dict(df.dtypes).get(ts_col)
    if dt is not None and dt not in ("timestamp", "timestamp_ntz"):
        raise ValueError(
            f"time_range_agg: {ts_col!r} is {dt}, need a timestamp — a "
            "numeric epoch column would silently scale the window to "
            "its own unit; cast with timestamp_micros()/to_timestamp() "
            "first"
        )
    w = (
        Window.partitionBy(*partition)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-days * 86400, 0)
    )
    return df.withColumn(out_col, agg.over(w))


def running_total(
    df: DataFrame,
    col: Column,
    partition: list[str],
    order: list[tuple[str, bool]],
    out_col: str,
) -> DataFrame:
    """Cumulative sum from the partition start. Pass a DECIMAL column
    for cross-engine exactness (float running sums are engine-order
    dependent)."""
    w = window_of(partition, order).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out_col, F.sum(col).over(w))
