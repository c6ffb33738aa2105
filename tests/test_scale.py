"""Scale-mechanics proofs: salting must not change join results, and
bucketed joins must compile WITHOUT a shuffle exchange — asserted on
the physical plan, not assumed."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.skew import salted_join, write_bucketed
from full_docker_etl_spark.sources.catalog import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_suppkey"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    plain = li.join(sup, li["l_suppkey"] == sup["s_suppkey"]).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    li2 = li.withColumnRenamed("l_suppkey", "s_suppkey")
    salted = salted_join(
        li2, sup, key="s_suppkey", salt_src="l_orderkey", n_salts=8
    ).select("l_orderkey", "l_linenumber", "s_name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is pointed at a temp scratch in conftest (static conf)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(od.withColumnRenamed("o_orderkey", "l_orderkey"), "od_b", "l_orderkey", 8)
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def _no_shuffle(plan: str) -> bool:
    # broadcast exchanges are fine (tiny side ships to executors); the
    # thing bucketing must eliminate is the hash-partitioning shuffle
    return "Exchange hashpartitioning" not in plan


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    # force the sort-merge path: at test scale the planner would rather
    # broadcast (which also reports 'Bucketed: false'); at 100 TB
    # neither side is broadcastable and bucketing is what saves the
    # shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_b").join(spark.table("od_b"), "l_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert _no_shuffle(plan), plan  # co-located: zero shuffle
        assert "Bucketed: true" in plan, plan
        li = load_table(spark, sf_dir, "lineitem")
        od = load_table(spark, sf_dir, "orders")
        want = li.join(od, li["l_orderkey"] == od["o_orderkey"]).count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("li_b")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    assert _no_shuffle(_plan(agg))
