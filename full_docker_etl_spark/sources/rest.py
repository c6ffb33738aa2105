"""REST/API batch source (SURVEY.md S3): the reference fetches OHLCV
per ticker from yfinance in a sequential, rate-limited driver loop
(``extractyfinance.py:136-212``, ~10 s/stock → 2.8 h for the board).

Here the fetch is DISTRIBUTED: the symbol table is repartitioned and
each executor fetches its own slice via mapInPandas, with the
per-request pause applied inside the worker (politeness is preserved,
but 951 stocks / N executors fetch in parallel lanes). The fetcher is
pluggable:

- :class:`SyntheticFetcher` — deterministic in-container stand-in
  (seeded per symbol); used by tests and the registered query.
- a real yfinance fetcher belongs outside the engine (network); wire
  it by passing any callable ``symbol -> pd.DataFrame`` with the same
  OHLCV columns.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OHLCV_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("trade_date", T.DateType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.LongType()),
    ]
)

Fetcher = Callable[[str], pd.DataFrame]


class SyntheticFetcher:
    """Deterministic OHLCV generator: a seeded integer random walk per
    symbol (pure arithmetic — no RNG state, reproducible anywhere).
    Stands in for the yfinance call; same output contract."""

    def __init__(self, n_days: int = 30, start: str = "2024-01-01"):
        self.n_days = n_days
        self.start = pd.Timestamp(start)

    def __call__(self, symbol: str) -> pd.DataFrame:
        seed = sum(ord(c) * (i + 1) for i, c in enumerate(symbol)) % 997
        rows = []
        px = 1000 + seed
        for d in range(self.n_days):
            step = ((seed * 2654435761 + d * 40503) % 21) - 10
            o = float(px)
            c = float(px + step)
            rows.append(
                {
                    "symbol": symbol,
                    "trade_date": (self.start + pd.Timedelta(days=d)).date(),
                    "open": o,
                    "high": float(max(o, c) + 2),
                    "low": float(min(o, c) - 2),
                    "close": c,
                    "volume": int(10_000 + (seed * 31 + d * 17) % 5_000),
                }
            )
            px = c
        return pd.DataFrame(rows)


def fetch_ohlcv(
    symbols: DataFrame,
    symbol_col: str = "symbol",
    fetcher_factory: Callable[[], Fetcher] = SyntheticFetcher,
    pause_s: float = 0.0,
    parallelism: int | None = None,
) -> DataFrame:
    """S3 distributed: one fetch per symbol, executed on executors.
    ``pause_s`` reproduces the reference's per-request politeness delay
    WITHIN each lane; lanes run in parallel."""
    src = symbols.select(symbol_col)
    if parallelism:
        src = src.repartition(parallelism)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetch = fetcher_factory()
        for pdf in batches:
            frames = []
            for sym in pdf[symbol_col]:
                if pause_s:
                    time.sleep(pause_s)
                frames.append(fetch(sym))
            if frames:
                # one Arrow batch per input batch — yielding per symbol
                # floods the stream with tiny record batches
                yield pd.concat(frames, ignore_index=True)

    return src.mapInPandas(run, OHLCV_SCHEMA)
