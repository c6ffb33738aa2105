"""Scale-mechanics proofs: salting must not change join results, and
bucketed joins must compile WITHOUT a shuffle exchange — asserted on
the physical plan, not assumed."""

from __future__ import annotations

import contextlib
import io
import os

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


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    """salted_agg's two-phase (key, salt)->key merge must be result-
    identical to the plain groupBy — including avg, whose partial
    AVERAGES must never be averaged (salt buckets hold different row
    counts); and salted_count_distinct must equal COUNT(DISTINCT)."""
    import pytest
    from pyspark.sql import functions as F

    from full_docker_etl_spark.operators.skew import (
        salted_agg,
        salted_count_distinct,
    )
    from full_docker_etl_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "vdec", F.col("value").cast("decimal(18,2)")
    )
    got = {
        r.event_type: (r.n, float(r.s), round(float(r.a), 4), r.lo, r.hi)
        for r in salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "event_id"),
                "s": ("sum", "vdec"),
                "a": ("avg", "vdec"),
                "lo": ("min", "value"),
                "hi": ("max", "value"),
            },
            salt_src="event_id",
            n_salts=8,
        ).collect()
    }
    want = {
        r.event_type: (r.n, float(r.s), round(float(r.a), 4), r.lo, r.hi)
        for r in ev.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.sum("vdec").alias("s"),
            F.avg("vdec").alias("a"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    assert got == want

    nd = {
        r.event_type: r.n_distinct
        for r in salted_count_distinct(
            ev, ["event_type"], "user_id"
        ).collect()
    }
    nd_want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert nd == nd_want

    # holistic aggregates refuse loudly — they don't merge by key-salt
    with pytest.raises(ValueError, match="salted_agg supports"):
        salted_agg(ev, ["event_type"], {"p": ("median", "value")}, "event_id")


def test_write_clustered_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """write_clustered must produce files whose cluster-key ranges are
    DISJOINT (parquet footer min/max — what file/row-group pruning
    reads), with no row lost: the layout is what makes a 100 TB
    range-scan touch only the files it needs."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from full_docker_etl_spark.operators.skew import write_clustered
    from full_docker_etl_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    path = str(tmp_path / "clustered")
    write_clustered(ev, path, ["event_id"], n_files=6)

    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        meta = pq.ParquetFile(os.path.join(path, f)).metadata
        idx = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }["event_id"]
        lo = min(
            meta.row_group(g).column(idx).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(idx).statistics.max
            for g in range(meta.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 2  # actually clustered into multiple files
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping file ranges: {(lo1, hi1)} vs {lo2}"
    # no rows lost, values identical
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0


def test_salted_count_distinct_ignores_nulls(spark):
    """SQL COUNT(DISTINCT col) ignores NULL values; the dedupe-shape
    rewrite must too (count(value_col), not count(*), after the
    distinct), and a key whose values are ALL null still surfaces
    with count 0 exactly as GROUP BY emits the group."""
    from full_docker_etl_spark.operators.skew import salted_count_distinct

    df = spark.createDataFrame(
        [("a", "u1"), ("a", None), ("a", "u2"), ("a", "u1"), ("b", None)],
        "k string, u string",
    )
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "u").collect()
    }
    want = {
        r.k: r.n
        for r in df.groupBy("k")
        .agg(F.countDistinct("u").alias("n"))
        .collect()
    }
    assert got == want == {"a": 2, "b": 0}


def test_fuzzy_join_rejects_colliding_columns(spark):
    """fuzzy_join emits both inputs' columns side by side: overlapping
    names (the default in self-linkage) must refuse up front with a
    clear ValueError, not produce an ambiguous output that fails at
    first downstream reference; internal working names are reserved
    the same way."""
    import pytest as _pytest

    from full_docker_etl_spark.operators.joins import fuzzy_join

    names = spark.createDataFrame([("alpha one",)], "p_name string")
    with _pytest.raises(ValueError, match="BOTH sides"):
        fuzzy_join(names, names, "p_name", "p_name", max_dist=2)
    left = names.select(F.col("p_name").alias("__fzj_l"))
    right = names.select(F.col("p_name").alias("name_b"))
    with _pytest.raises(ValueError, match="reserves internal"):
        fuzzy_join(left, right, "__fzj_l", "name_b", max_dist=2)
    # disjoint names join fine and keep both sides' columns
    a = names.select(F.col("p_name").alias("name_a"))
    out = fuzzy_join(a, right, "name_a", "name_b", max_dist=2)
    assert set(out.columns) == {"name_a", "name_b", "edit_dist"}


def test_write_clustered_zorder_prunes_both_columns(spark, sf_dir, tmp_path):
    """Z-ORDER clustering: after interleaved two-column clustering on
    (user_id, ts), a single-column predicate on EITHER column must be
    able to skip >50% of the files on footer min/max alone — the
    property single-key clustering cannot give (its second column's
    per-file ranges span everything). Also: no row lost, values
    identical, and every file carries real stats for both columns
    (INT96 timestamps would have none — the session pins
    TIMESTAMP_MICROS exactly for this)."""
    import datetime as dt

    import pyarrow.parquet as pq

    from full_docker_etl_spark.operators.skew import write_clustered_zorder
    from full_docker_etl_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    path = str(tmp_path / "zordered")
    write_clustered_zorder(ev, path, ["user_id", "ts"], n_files=16, bits=4)

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) >= 8

    def spans(col):
        out = []
        for f in files:
            meta = pq.ParquetFile(os.path.join(path, f)).metadata
            idx = {
                meta.schema.column(i).name: i
                for i in range(meta.num_columns)
            }[col]
            ss = [
                meta.row_group(g).column(idx).statistics
                for g in range(meta.num_row_groups)
            ]
            ss = [s for s in ss if s is not None and s.has_min_max]
            assert ss, f"file {f} has no footer stats for {col}"
            norm = (
                lambda v: v.replace(tzinfo=None)
                if isinstance(v, dt.datetime)
                else v
            )
            out.append(
                (min(norm(s.min) for s in ss), max(norm(s.max) for s in ss))
            )
        return out

    t1, t2 = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 8)
    ts_touch = sum(1 for lo, hi in spans("ts") if hi >= t1 and lo < t2)
    uid_touch = sum(1 for lo, hi in spans("user_id") if lo <= 3 <= hi)
    assert ts_touch < len(files) / 2, f"ts touches {ts_touch}/{len(files)}"
    assert uid_touch < len(files) / 2, (
        f"user_id touches {uid_touch}/{len(files)}"
    )
    back = spark.read.parquet(path)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0


def test_write_clustered_zorder_guards(spark, tmp_path):
    """Z-order input validation: a string cluster column would
    cast('double') to NULL for every row (all rows in bucket 0 — a
    silent clustering no-op) and an interleave budget past 63 bits
    would wrap the bigint Morton value and scramble the curve; both
    must refuse loudly up front."""
    import pytest as _pytest

    from full_docker_etl_spark.operators.skew import write_clustered_zorder

    df = spark.createDataFrame(
        [(1, "a", 2.0, 3, 4)], "k int, s string, x double, y int, z int"
    )
    with _pytest.raises(ValueError, match="unsupported type"):
        write_clustered_zorder(df, str(tmp_path / "o1"), ["k", "s"])
    with _pytest.raises(ValueError, match="63-bit"):
        write_clustered_zorder(
            df, str(tmp_path / "o2"), ["k", "x", "y", "z"], bits=16
        )


def test_fresh_checkpoint_resets_stats_and_releases(spark):
    """fresh_checkpoint must break Catalyst size-stat propagation:
    chaining checkpointed frames through joins with a PLAIN
    localCheckpoint compounds sizeInBytes multiplicatively (digit
    count ~doubles per chained round — the driver-melting
    connected-components pathology), while fresh_checkpoint keeps the
    leaf estimate flat. Pins the (bytecode-public) JVM surface the
    reset rides on, so a PySpark upgrade that silently breaks it
    fails here instead of re-surfacing as exponential round times.
    Also: release_checkpoint must follow the rebuilt frame back to
    its checkpoint source and actually free the persisted blocks."""
    from pyspark.sql import functions as F

    from full_docker_etl_spark.operators.util import (
        fresh_checkpoint,
        release_checkpoint,
    )

    def digits(df):
        return len(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )

    base = spark.createDataFrame([(i, i + 1) for i in range(8)], "a long, b long")

    plain = base.localCheckpoint(eager=True)
    fresh = fresh_checkpoint(base)
    leaf = digits(fresh)
    for _ in range(4):
        plain = (
            plain.join(plain.selectExpr("a AS a2", "b"), ["b"])
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        fresh = fresh_checkpoint(
            fresh.join(fresh.selectExpr("a AS a2", "b"), ["b"]).select("a", "b")
        )
    assert digits(plain) > 4 * leaf  # the pathology, still real in Spark
    assert digits(fresh) == leaf     # the reset holds round over round
    # the rebuilt frame is NOT a silent fallback: the reset actually
    # engaged (a fallback would return the plain-checkpoint digits)
    assert getattr(fresh, "_fde_ckpt_source", None) is not None

    # release follows the rebuilt frame to its source blocks
    sc = spark.sparkContext
    before = {rid for rid in sc._jsc.getPersistentRDDs().keys()}
    keep = fresh_checkpoint(base.select((F.col("a") + 1).alias("a"), "b"))
    added = {
        rid for rid in sc._jsc.getPersistentRDDs().keys()
    } - before
    assert added  # the checkpoint pinned blocks
    release_checkpoint(keep)
    after = {rid for rid in sc._jsc.getPersistentRDDs().keys()}
    assert not (added & after)  # and release unpinned exactly them


def test_project_only_checkpoint_chain_stats_stay_flat(spark):
    """The r17 chained-checkpoint AUDIT's load-bearing premise (see
    SCALE.md round-17 notes): the stats-compounding pathology needs a
    JOIN between checkpointed rounds (the size estimator MULTIPLIES
    join children), so a loop-carried plain localCheckpoint whose
    chain is Project-only — bpe_merge_table's shape: each round
    re-selects (freq, fold(syms)) from the previous checkpoint — keeps
    sizeInBytes flat and does NOT need the fresh_checkpoint
    conversion. If a Spark upgrade ever makes Project propagation
    compound too, this fails and the BPE/IVM audit verdicts must be
    revisited."""
    def digits(df):
        return len(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )

    base = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long"
    )
    cur = base.localCheckpoint(eager=True)
    start = digits(cur)
    for _ in range(6):
        cur = cur.selectExpr("a", "b + 1 AS b").localCheckpoint(eager=True)
    # linear propagation: six chained rounds stay at the leaf estimate
    # (vs the join chain, whose digit count ~doubles per round)
    assert digits(cur) <= start + 1
