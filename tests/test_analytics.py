"""Accuracy pin for the approx-distinct sketch (rows-only at the
driver): HLL++ at rsd=0.02 must land within 5% of the exact count."""

from __future__ import annotations

from full_docker_etl_spark.registry import all_specs


def test_approx_distinct_accuracy(spark, sf_dir):
    df = all_specs()["agg_approx_distinct"].fn(spark, sf_dir)
    for r in df.collect():
        err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert err <= 0.05, f"{r.o_orderstatus}: approx={r.approx_customers} exact={r.exact_customers}"
