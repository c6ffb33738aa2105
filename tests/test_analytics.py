"""Accuracy pin for the approx-distinct sketch (rows-only at the
driver): HLL++ at rsd=0.02 must land within 5% of the exact count."""

from __future__ import annotations

from full_docker_etl_spark.registry import all_specs


def test_approx_distinct_accuracy(spark, sf_dir):
    """The query emits a self-judging verdict row (the oracle expects
    within_bound=TRUE); assert it locally too, per group."""
    df = all_specs()["agg_approx_distinct"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.within_bound, f"{r.o_orderstatus}: exact={r.exact_customers}"
        assert r.exact_customers > 0


# ------------------------------------------------------------- temporal


def test_asof_join_semantics(spark):
    """Equality ts matches; no prior right row yields null; latest of
    several priors wins."""
    from full_docker_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("a", 5), ("a", 10), ("a", 20), ("b", 7)], "k string, lts int"
    )
    right = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 15, 2.0), ("b", 8, 9.0)],
        "k string, rts int, v double",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["v"])
    got = {(r["k"], r["lts"]): r["v"] for r in out.collect()}
    assert got == {
        ("a", 5): 1.0,   # equality matches (at-or-before)
        ("a", 10): 1.0,  # rts=15 is in the future
        ("a", 20): 2.0,  # latest prior wins
        ("b", 7): None,  # no right row at or before
    }


def test_range_join_bucketed_nondivisible_window(spark):
    """Bucket blocking must not lose matches when the window is not a
    multiple of the bucket (worst case: match sits ceil(W/B)+1 buckets
    back)."""
    from full_docker_etl_spark.operators.temporal import range_join_bucketed

    left = spark.createDataFrame([("a", 1000)], "k string, t long")
    right = spark.createDataFrame(
        [("a", 751, 1), ("a", 750, 2), ("a", 1000, 3), ("a", 1001, 4)],
        "k string, pt long, v int",
    )
    # window 250, bucket 100: (750, 1000] -> v in {1, 3}
    out = range_join_bucketed(left, right, "k", "t", "pt", 250, 100)
    assert sorted(r["v"] for r in out.collect()) == [1, 3]


def test_approx_percentiles_accuracy(spark, sf_dir):
    """percentile_approx(accuracy=1000) must land within 1% of the
    exact percentile per group — the query self-judges (the oracle
    expects within_bound=TRUE); assert it locally per group."""
    specs = all_specs()
    exact = {r.l_returnflag: r for r in specs["agg_percentiles"].fn(spark, sf_dir).collect()}
    approx = {r.l_returnflag: r for r in specs["agg_approx_percentiles"].fn(spark, sf_dir).collect()}
    assert set(exact) == set(approx)
    for g, r in approx.items():
        assert r.within_bound, (g, r)
        assert r.n > 0 and r.min_price <= r.max_price


def test_profile_columns_one_row_per_column_with_nulls(spark):
    """Profiler over a frame with nulls and mixed types: counts line
    up, non-applicable stat slots are null, unknown columns raise."""
    import pytest

    from full_docker_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, None, 4.0), (3, "c", None), (4, "a", 1.0)],
        "id int, s string, v double",
    )
    prof = {r.col_name: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert prof["s"].n_nulls == 1 and prof["v"].n_nulls == 1
    assert prof["s"].n_distinct == 2          # nulls don't count
    assert prof["id"].min_num == 1.0 and prof["id"].max_num == 4.0
    assert prof["id"].min_str is None and prof["id"].avg_len is None
    assert prof["s"].min_str == "a" and prof["s"].max_str == "c"
    assert prof["s"].min_num is None
    assert prof["v"].min_num == 1.0 and prof["v"].max_num == 4.0
    assert all(r.approx_ok for r in prof.values())
    with pytest.raises(ValueError, match="no such columns"):
        profile_columns(df, columns=["nope"])


def test_histogram_counts_and_edges(spark):
    """All non-null rows land in exactly one bucket; the max value is
    clamped into the last bucket; a constant column degenerates to one
    bucket 0; nulls are excluded."""
    import pytest

    from full_docker_etl_spark.operators.profile import histogram_equi_width

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,), (float("nan"),)],
        "v double",
    )
    h = {r.bucket: r for r in histogram_equi_width(df, "v", 10).collect()}
    assert sum(r.n for r in h.values()) == 100
    assert set(h) == set(range(10))
    assert all(h[b].n == 10 for b in range(9))
    assert h[9].n == 10                       # 90..99 incl. clamped max
    assert h[0].lo == 0.0 and h[9].hi == 99.0
    const = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    ch = histogram_equi_width(const, "v", 10).collect()
    assert len(ch) == 1 and ch[0].bucket == 0 and ch[0].n == 2
    with pytest.raises(ValueError):
        histogram_equi_width(df, "v", 0)


def test_grouped_percentiles_exact_matches_spark_percentile(spark):
    """The count-based exact percentile must equal Spark's own
    buffer-everything `percentile` aggregate (type-7 interpolation)
    bit-for-bit on the 4-dp grid — including a heavily-tied hot group,
    a single-row group, and a two-row group (frac interpolation)."""
    import random

    from full_docker_etl_spark.operators.profile import (
        grouped_percentiles_exact,
    )

    rng = random.Random(12)
    rows = (
        [("hot", round(rng.choice([1.5, 2.25, 7.0, -3.5]), 4))
         for _ in range(997)]
        + [("spread", round(rng.uniform(-10, 10), 4)) for _ in range(200)]
        + [("one", 42.0)]
        + [("two", 1.0), ("two", 2.0)]
        # percentile() ignores nulls — the count-based form must too
        + [("hot", None), ("two", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    ps = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    got = {
        r.g: (r.n, round(r.p10, 4), round(r.p50, 4), round(r.p90, 4),
              round(r.p99, 4))
        for r in grouped_percentiles_exact(df, "g", "v", ps).collect()
    }
    from pyspark.sql import functions as F

    want = {
        r.g: (r.n, round(r.p10, 4), round(r.p50, 4), round(r.p90, 4),
              round(r.p99, 4))
        for r in df.groupBy("g")
        .agg(
            # count("v") skips nulls, matching the operator's n (which
            # counts only the rows percentile() actually considers)
            F.count("v").alias("n"),
            *[
                F.expr(f"percentile(v, {p})").alias(name)
                for name, p in ps.items()
            ],
        )
        .collect()
    }
    assert got == want
    assert got["one"][1:] == (42.0, 42.0, 42.0, 42.0)
    assert got["two"][2] == 1.5  # true interpolation between the 2 rows

    # DISCRETE (nearest-rank / quantile_disc) mode: the value at
    # 1-indexed position ceil(p*n) — always an attained value, matching
    # DuckDB's quantile_disc semantics (pinned empirically: [1,2] at
    # p=0.75 -> 2, i.e. ceil, not floor); must also agree with DuckDB
    # itself on the same data
    import duckdb

    from full_docker_etl_spark.operators.profile import (
        grouped_percentiles_from_counts,
    )

    vals = sorted(v for g, v in rows if g == "spread" and v is not None)
    vc = (
        df.where("v IS NOT NULL")
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    disc = {
        r.g: (r.p10, r.p50, r.p90, r.p99)
        for r in grouped_percentiles_from_counts(
            vc, "g", "v", "c", ps, discrete=True
        ).collect()
    }
    import math

    want_disc = tuple(
        vals[max(0, math.ceil(p * len(vals)) - 1)]
        for p in (0.1, 0.5, 0.9, 0.99)
    )
    assert disc["spread"] == want_disc
    assert disc["two"] == (1.0, 1.0, 2.0, 2.0)  # ceil semantics on n=2
    con = duckdb.connect()
    duck = tuple(
        con.execute(
            f"SELECT quantile_disc(x, {p}) FROM (SELECT unnest(?) AS x)",
            [vals],
        ).fetchone()[0]
        for p in (0.1, 0.5, 0.9, 0.99)
    )
    assert disc["spread"] == duck


def test_grouped_percentiles_refuses_unbounded_grid(spark):
    """The bounded-distinct precondition is ENFORCED, not just
    documented: a group with more distinct values than max_distinct
    raises at execution time (pointing at the approx path) instead of
    silently rebuilding the O(rows-per-group) state the count-based
    operator exists to avoid; max_distinct=None opts out."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from full_docker_etl_spark.operators.profile import (
        grouped_percentiles_exact,
    )

    # 50 distinct doubles in one group — "continuous" relative to a
    # tiny max_distinct so the test stays fast
    df = spark.createDataFrame(
        [("g", i + 0.5) for i in range(50)], "g string, v double"
    )
    out = grouped_percentiles_exact(
        df, "g", "v", {"p50": 0.5}, max_distinct=10
    )
    with pytest.raises(SparkRuntimeException, match="max_distinct=10"):
        out.collect()
    # opt-out still computes (grid bound proven by the caller)
    row = grouped_percentiles_exact(
        df, "g", "v", {"p50": 0.5}, max_distinct=None
    ).collect()[0]
    assert row.n == 50 and row.p50 == 25.0
    # and the default budget admits the shipped rounded-grid callers
    ok = grouped_percentiles_exact(df, "g", "v", {"p50": 0.5}).collect()
    assert ok[0].p50 == 25.0


def test_incremental_grain_refresh_touches_only_affected_buckets(spark, sf_dir):
    """refresh_grain must (a) equal a full rebuild row-for-row, (b)
    leave untouched bucket directories' files untouched (same inodes),
    (c) rewrite the touched buckets, (d) no-op on an empty batch."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from full_docker_etl_spark.operators.ivm import (
        GRAIN_PARTITIONING,
        refresh_grain,
        with_bucket,
    )
    from full_docker_etl_spark.sources.catalog import load_table

    def build(df):
        return (
            df.groupBy(
                F.col("o_orderstatus").alias("series"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("period_key"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("agg_type", F.lit("day"))
        )

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    cutoff = F.lit("2001-06-01").cast("timestamp")
    path = tempfile.mkdtemp(prefix="fde_ivmtest_") + "/g"
    with_bucket(build(orders.where(F.col("o_orderdate") < cutoff))).write.mode(
        "overwrite"
    ).partitionBy(*GRAIN_PARTITIONING).parquet(path)

    def inodes():
        out = {}
        for base, _dirs, files in os.walk(path):
            rel = os.path.relpath(base, path)
            for f in files:
                if f.endswith(".parquet"):
                    out.setdefault(rel, set()).add(
                        os.stat(os.path.join(base, f)).st_ino
                    )
        return out

    before = inodes()
    batch = orders.where(F.col("o_orderdate") >= cutoff)
    n = refresh_grain(orders, batch, build, path, "o_orderdate")
    assert n > 0
    after = inodes()
    # untouched early-2001 buckets: identical files
    for rel in before:
        if "period_bucket=2001-0" in rel and rel < "agg_type=day/period_bucket=2001-06":
            assert after[rel] == before[rel], rel
    # touched buckets exist and are fresh
    assert any("period_bucket=2001-06" in rel for rel in after)
    # incremental == full rebuild
    full = build(orders).select("series", "period_key", "n")
    got = spark.read.parquet(path).select("series", "period_key", "n")
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    # empty batch is a no-op
    assert refresh_grain(orders, batch.where(F.lit(False)), build, path, "o_orderdate") == 0


def test_funnel_requires_strict_order(spark):
    """A click BEFORE the first view must not advance the funnel, and a
    purchase between view and click must not count either — the stage
    timestamps must be strictly increasing."""
    from pyspark.sql import functions as F

    from full_docker_etl_spark.queries.analytics_q import agg_funnel
    from full_docker_etl_spark.sources import catalog

    rows = [
        # u1: proper view -> click -> purchase
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 11:00:00", "click"),
        (1, "2024-01-01 12:00:00", "purchase"),
        # u2: click precedes the only view -> stops at view
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # u3: purchase before click -> stops at click
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 10:30:00", "purchase"),
        (3, "2024-01-01 11:00:00", "click"),
        # u4: never views -> not in the funnel at all
        (4, "2024-01-01 10:00:00", "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts string, event_type string") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")

    import unittest.mock as mock

    with mock.patch.object(catalog, "load_table", return_value=ev):
        from full_docker_etl_spark.queries import analytics_q

        with mock.patch.object(analytics_q, "load_table", return_value=ev):
            r = agg_funnel(spark, "unused").first()
    assert (r.n_view, r.n_view_click, r.n_view_click_purchase) == (3, 2, 1)


def test_cohort_offsets_cross_year_boundaries(spark):
    """Month offsets are integer year*12+month arithmetic: Dec→Jan is
    offset 1, same month twice is one active user, a later cohort
    starts at offset 0."""
    from pyspark.sql import functions as F

    from full_docker_etl_spark.queries.analytics_q import agg_cohort_retention
    from full_docker_etl_spark.queries import analytics_q

    rows = [
        (1, "2023-12-15 00:00:00", "view"),
        (1, "2023-12-20 00:00:00", "view"),   # same month: one active
        (1, "2024-01-05 00:00:00", "view"),   # Dec -> Jan = offset 1
        (1, "2024-03-01 00:00:00", "view"),   # offset 3
        (2, "2024-01-10 00:00:00", "view"),   # own cohort, offset 0
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts string, event_type string") \
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_type")

    import unittest.mock as mock

    with mock.patch.object(analytics_q, "load_table", return_value=ev):
        got = {
            (r.cohort, r.month_offset): r.n_active
            for r in agg_cohort_retention(spark, "unused").collect()
        }
    assert got == {
        ("2023-12", 0): 1, ("2023-12", 1): 1, ("2023-12", 3): 1,
        ("2024-01", 0): 1,
    }


def test_refresh_grain_moved_key_and_null_date(spark):
    """Round-6 ADVICE (medium + low): (a) when fact maintenance moved a
    key's event time to another period, passing pre_image_periods makes
    the refresh scrub the OLD period — including deleting its grain
    directory when it empties — so incremental == rebuild still holds;
    (b) a NULL event date refuses loudly instead of an opaque
    TypeError."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from full_docker_etl_spark.operators.ivm import (
        GRAIN_PARTITIONING,
        pre_image_periods,
        refresh_grain,
        with_bucket,
    )

    def build(df):
        return (
            df.groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("period_key")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("agg_type", F.lit("day"))
            .withColumn("series", F.lit("all"))
        )

    schema = "k int, ts string"
    fact_v1 = spark.createDataFrame(
        [(1, "2024-01-15"), (2, "2024-01-20"), (3, "2024-02-10")], schema
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = tempfile.mkdtemp(prefix="fde_ivmmv_") + "/g"
    with_bucket(build(fact_v1)).write.partitionBy(
        *GRAIN_PARTITIONING
    ).parquet(path)

    # key 3 moves Feb → Mar; Feb empties. The batch alone only names
    # March, so the pre-image is what carries February in.
    batch = spark.createDataFrame([(3, "2024-03-05")], schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    pre = pre_image_periods(fact_v1, batch, build, ["k"])
    assert ("day", "2024-02") in pre
    fact_v2 = fact_v1.where(F.col("k") != 3).unionByName(batch)
    n = refresh_grain(fact_v2, batch, build, path, "ts", extra_affected=pre)
    assert n >= 2  # March recomputed AND February scrubbed
    got = spark.read.parquet(path).select("period_key", "n")
    full = build(fact_v2).select("period_key", "n")
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    assert not os.path.exists(
        os.path.join(path, "agg_type=day", "period_bucket=2024-02")
    )

    import pytest

    # NULL event date: loud domain error, not NoneType[:4]
    null_batch = spark.createDataFrame([(9, None)], schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    with pytest.raises(ValueError, match="NULL date"):
        refresh_grain(fact_v2, null_batch, build, path, "ts")


def test_corpus_stats_semantics(spark):
    """Corpus census: lowercasing folds Token/token, hapax counts
    once-only TYPES, NULL/whitespace-only docs contribute nothing,
    and the modal-term tie breaks (count DESC, term ASC)."""
    from full_docker_etl_spark.operators.profile import corpus_stats

    rows = [
        (0, "The the THE zeta"),     # 'the' x3 + hapax 'zeta'
        (1, "alpha beta alpha"),     # 'alpha' x2, hapax 'beta'
        (2, None),                   # excluded entirely
        (3, "   "),                  # whitespace-only: no tokens
        (4, "aaa aaa aaa"),          # ties 'the' at 3 → 'aaa' wins ASC
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = corpus_stats(df, "text", "doc_id").collect()[0]
    assert r.n_docs == 3          # docs 0, 1, 4
    assert r.n_tokens == 10
    assert r.vocab == 5           # the, zeta, alpha, beta, aaa
    assert r.n_hapax == 2         # zeta, beta
    assert abs(r.ttr - round(5 / 10, 6)) < 1e-9
    assert (r.top_term, r.top_term_n) == ("aaa", 3)


def test_asof_join_null_semantics_round14(spark):
    """Round-14 review regressions, pinned:
    - the matched row's values arrive AS A ROW (a NULL inside the
      latest matched right row comes through as NULL — per-column
      last-ignorenulls previously stitched values from DIFFERENT
      right rows);
    - a right row with NULL timestamp never matches anything
      (nulls-first ordering previously leaked it into every frame);
    - right_vals colliding with a left column raises (the window
      previously filled every left row from its OWN value)."""
    import pytest

    from full_docker_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 3), (1, 0)], "k int, lts int"
    )
    right = spark.createDataFrame(
        [(1, 1, 5, 9), (1, 2, 7, None), (1, None, 42, 42)],
        "k int, rts int, a int, b int",
    )
    got = {r.lts: (r.a, r.b) for r in
           asof_join(left, right, "k", "lts", "rts", ["a", "b"]).collect()}
    # lts=3 matches rts=2 WHOLE: a=7, b=NULL (not b=9 from rts=1)
    assert got[3] == (7, None)
    # lts=0 precedes every real right row; the NULL-ts row must not leak
    assert got[0] == (None, None)

    with pytest.raises(ValueError, match="already exist on the left"):
        asof_join(
            left.withColumnRenamed("lts", "a"), right, "k", "a", "rts", ["a"]
        )


def test_time_range_agg_rejects_numeric_epoch_column(spark):
    """A numeric epoch column would silently scale the 'days' window to
    its own unit (30 'days' of micros ≈ 2.6 s) — must raise."""
    import pytest

    from full_docker_etl_spark.operators.windows import time_range_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, 1_000_000)], "k int, ts_us long")
    with pytest.raises(ValueError, match="need a timestamp"):
        time_range_agg(df, F.count(F.lit(1)), ["k"], "ts_us", 30, "n")


def test_excel_cell_hygiene_round14(spark):
    """Garbage Excel inputs must NULL/blank, not fabricate values:
    out-of-range date serials (> 9999-12-31's 2958465) are NULL like
    any unparseable cell, a negative shared-string index must not wrap
    to the END of the shared-string table, and a far-right empty
    formatting cell must not pad the row array."""
    import io
    import zipfile

    from full_docker_etl_spark.sources.files import _xlsx_parse_rows

    sheet = b"""<?xml version="1.0"?>
    <worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      <sheetData>
        <row r="1"><c r="A1" t="s"><v>-1</v></c><c r="B1"><v>x</v></c>
                   <c r="XFD1"><v></v></c></row>
      </sheetData>
    </worksheet>"""
    shared = b"""<?xml version="1.0"?>
    <sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      <si><t>s0</t></si><si><t>s1</t></si>
    </sst>"""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
        zf.writestr("xl/sharedStrings.xml", shared)
    (rnum, cells), = _xlsx_parse_rows(buf.getvalue())
    assert cells == ["", "x"]  # no wrap to 's1', no 16384-wide padding
