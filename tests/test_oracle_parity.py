"""The local correctness gate: every registered query with an oracle
must match DuckDB exactly at sf0.01 — the EXACT scale the external
driver compares at (a bug that only manifests past the smoke scale,
e.g. a bucket boundary or a slice modulus, must fail HERE first);
oracle-less queries must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from full_docker_etl_spark.registry import all_specs
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare_query, duck_connection

SPECS = all_specs()


@pytest.fixture(scope="module")
def sf_dir():
    # module-scoped override: parity runs at the driver's sf, not the
    # smoke sf the rest of the suite uses
    return SF_CORRECT


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert df.columns, f"{name}: empty schema"
    else:
        compare_query(df, spec.oracle, duck)


def test_hash_unsafe_oracle_types_rejected(duck):
    """The r11 escape: _BPE_ORACLE emitted `c AS pair_count` where c is
    DuckDB SUM(BIGINT) → HUGEINT; fetchall() hands back a Python int so
    the old gate passed, but the driver's pandas hash path rendered it
    as 4568.0 vs Spark's 4568 (CORRECTNESS_r11 red row). The gate must
    now reject uncast HUGEINT and DECIMAL oracle outputs outright."""
    from tests.oracle_utils import assert_hash_safe_oracle

    # the exact shape the old _BPE_ORACLE had: uncast SUM over BIGINT
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_hash_safe_oracle(
            "SELECT SUM(CAST(o_orderkey AS BIGINT)) AS pair_count "
            "FROM orders",
            duck,
        )
    with pytest.raises(AssertionError, match="DECIMAL"):
        assert_hash_safe_oracle(
            "SELECT CAST(1 AS DECIMAL(10,2)) AS v", duck
        )
    # the fixed form passes
    assert_hash_safe_oracle(
        "SELECT CAST(SUM(CAST(o_orderkey AS BIGINT)) AS BIGINT) "
        "AS pair_count FROM orders",
        duck,
    )


def test_all_oracles_hash_safe(duck):
    """Registry-wide sweep: no oracle may emit a column type the
    driver's pandas hash path renders differently from Spark."""
    from tests.oracle_utils import assert_hash_safe_oracle

    for name, spec in sorted(SPECS.items()):
        if spec.oracle is not None:
            try:
                assert_hash_safe_oracle(spec.oracle, duck)
            except AssertionError as ex:
                raise AssertionError(f"{name}: {ex}") from None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
