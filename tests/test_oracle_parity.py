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


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
