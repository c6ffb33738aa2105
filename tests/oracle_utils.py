"""Local re-implementation of the driver's correctness gate: run a
registered Spark query and its DuckDB oracle on the same parquet dir
and compare row count, column names, and values.

Stricter than the driver in one way: values are compared exactly
(after canonicalization), not hashed — so a failure here prints the
offending rows instead of a bare hash mismatch.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from full_docker_etl_spark.sources.catalog import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, (datetime.datetime,)):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, bytes):
        return ("b", v.hex())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("i", v)
    return ("s", str(v))


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: repr(t),
    )


# DuckDB types whose pandas conversion differs from their fetchall()
# conversion: the driver hashes oracle results through pandas, where
# HUGEINT (e.g. SUM over BIGINT) and DECIMAL become float64/object and
# render as "4568.0" against Spark's long "4568". fetchall() hands back
# Python ints, so a fetchall-based gate is blind to the class — this
# escaped as the r11 `text_bpe_merges` red row. Reject them outright;
# oracles must CAST aggregates to BIGINT/DOUBLE explicitly.
# TIMESTAMP/TIME enforce the registry's determinism rule mechanically:
# time instants surface as epoch microseconds (BIGINT) or DATE, never
# raw TIMESTAMP, to avoid tz-annotation mismatches between engines.
_HASH_UNSAFE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "TIMESTAMP", "TIME")


def _assert_hash_safe_relation(rel) -> None:
    """Fail if any oracle output column has a DuckDB type the driver's
    pandas hash path renders differently from Spark (HUGEINT/DECIMAL)."""
    bad = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, (str(t) for t in rel.types))
        if any(t.startswith(u) for u in _HASH_UNSAFE_TYPES)
    ]
    assert not bad, (
        "oracle emits driver-hash-unsafe column types (CAST them to "
        f"BIGINT/DOUBLE in the SQL): {bad}"
    )


def assert_hash_safe_oracle(oracle: str, con) -> None:
    _assert_hash_safe_relation(con.sql(oracle))


def compare_query(spark_df, oracle: str, con) -> None:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)

    # ONE relation serves both the type gate and the row fetch —
    # con.execute() after con.sql() would plan/run heavy oracles (the
    # recursive BPE CTE chains) twice per parity test.
    rel = con.sql(oracle)
    _assert_hash_safe_relation(rel)
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    s = _rowset(spark_cols, spark_rows)
    d = _rowset(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        only_s = [r for r in s if r not in d][:3]
        only_d = [r for r in d if r not in s][:3]
        raise AssertionError(
            "value mismatch (cols sorted: %s)\nfirst pairwise diffs: %s\n"
            "spark-only: %s\nduck-only: %s"
            % (sorted(spark_cols), diffs, only_s, only_d)
        )
