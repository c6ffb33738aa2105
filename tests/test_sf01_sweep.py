"""Opt-in 10x-scale parity sweep: every registered query, EXACT value
compare against DuckDB at sf0.1 — ten times the scale the external
driver compares at. This is the check that caught the round-12
percentile-interpolation 1-ulp boundary class (SCALE.md): bucket
edges, slice moduli, and window frames at larger group sizes can be
clean at sf0.01 and wrong one scale step up. Run it once per round
before freeze:

    SPARK_GRAFT_CPUS=32 python -m pytest -m sf01_sweep -q

Excluded from default runs via pytest.ini addopts (the permanent
per-commit gate stays tests/test_oracle_parity.py at sf0.01, the
driver's own compare scale)."""

from __future__ import annotations

import pytest

from full_docker_etl_spark.registry import all_specs
from tests.oracle_utils import compare_query, duck_connection

pytestmark = pytest.mark.sf01_sweep

SPECS = all_specs()
SF_SWEEP = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def sf_dir():
    return SF_SWEEP


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle_sf01(name, spark, sf_dir, duck):
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert df.columns, f"{name}: empty schema"
    else:
        compare_query(df, spec.oracle, duck)
