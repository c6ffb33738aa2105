"""Aggregate/analytics surface beyond the reference's own usage —
SURVEY.md §2.4 notes distinct-agg, approx-distinct, cube/rollup and
friends are "free in Spark and will be exposed via the SQL surface";
these queries are that exposure, oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table


@query(
    "agg_count_distinct",
    oracle="""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_customers,
             COUNT(DISTINCT o_orderpriority) AS n_priorities,
             COUNT(*) AS n_orders
      FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expand+two-phase agg under the hood;
    the exact companion to approx_distinct below."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_approx_distinct",
    oracle="""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS exact_customers,
             TRUE AS within_bound
      FROM orders GROUP BY 1
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB cardinality
    tool — fixed-size sketch, no expand, mergeable across partitions.

    The HLL estimate itself is engine-specific, so the query surfaces a
    VERDICT row instead: the exact count (portable) plus a boolean
    asserting the estimate landed within 3·rsd of it. The oracle
    expects ``TRUE`` — a drifting sketch flips the boolean and fails
    the external hash compare, so the accuracy claim is now
    driver-checked, not just pinned in tests."""
    est = F.approx_count_distinct("o_custkey", rsd=0.02)
    exact = F.count_distinct("o_custkey")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            exact.alias("exact_customers"),
            (
                F.abs(est - exact) <= F.lit(3 * 0.02) * exact
            ).alias("within_bound"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
      SELECT l_returnflag, l_linestatus,
             CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
             CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: subtotal hierarchy (flag, flag+status, grand total) in
    one pass — the explicit form of A4's hand-rolled multi-grain.
    GROUPING() columns disambiguate NULL-as-subtotal from NULL data."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n"
        )
    )


@query(
    "agg_pivot",
    oracle="""
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'click') AS click,
             COUNT(*) FILTER (WHERE event_type = 'error') AS error,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
             COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
             COUNT(*) FILTER (WHERE event_type = 'view') AS view
      FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event-type counts as columns per user. Values are pinned
    explicitly — an unpinned pivot runs a distinct scan first AND makes
    the output schema data-dependent (both wrong at scale)."""
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in kinds]
    )


@query(
    "agg_percentiles",
    oracle="""
      SELECT l_returnflag,
             ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
             ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same linear-interpolation definition; rounded to absorb the last
    ulp of the interpolation arithmetic), computed from (group, value)
    COUNTS rather than Spark's buffer-every-row ``percentile``
    aggregate: prices are cent-discretized, so state per group is
    O(distinct prices), not O(rows) — the hot-group ('N' is half of
    lineitem) OOM shape never materializes at 100 TB. Differential
    test pins it bit-equal to ``percentile()``; the approx companion
    at scale for truly continuous values is percentile_approx."""
    from full_docker_etl_spark.operators.profile import (
        grouped_percentiles_exact,
    )

    li = load_table(spark, sf_dir, "lineitem")
    pct = grouped_percentiles_exact(
        li, "l_returnflag", "l_extendedprice",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    return pct.select(
        "l_returnflag",
        F.round("p50", 4).alias("p50"),
        F.round("p90", 4).alias("p90"),
        F.round("p99", 4).alias("p99"),
    )


@query(
    "explode_tokens",
    oracle="""
      SELECT tok, COUNT(*) AS n FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
        FROM documents
      ) GROUP BY tok
    """,
)
def explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest + count — the word-count shape over the corpus
    (generator output feeds a partial-agg, so the exploded rows never
    hit the shuffle at full width)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_approx_percentiles",
    oracle="""
      SELECT l_returnflag,
             COUNT(*) AS n,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price,
             TRUE AS within_bound
      FROM lineitem WHERE l_orderkey % 5 = 0 GROUP BY 1
    """,
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile tool: percentile_approx (KLL-style sketch,
    fixed memory, mergeable across partitions — the exact sort-based
    percentile cannot hold a 100 TB group in memory).

    The sketch's picks are engine-specific (and exact-percentile
    INTERPOLATION rules differ between engines), so the query surfaces
    a verdict row: portable exact anchors (count, min, max) plus one
    boolean asserting every approx percentile sits within 1% of the
    exact percentile — computed Spark-side, where both definitions
    agree with themselves. The oracle expects ``TRUE``: sketch drift
    fails the external hash compare.

    The WHOLE verdict runs on a deterministic SLICE (l_orderkey % 5 —
    every group keeps ~20% of its rows): the exact percentile is a
    sort-based aggregate that must materialize each group, so judging
    the sketch on the full corpus is itself the scale-killer the sketch
    exists to avoid. Sketch and judge see the same slice, so the 1%
    tolerance needs no sampling slack, and any sketch regression still
    flips the boolean. This is how you audit a sketch at 100 TB:
    exact-vs-approx on a keyed sample, sketch-only on the rest."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 5 == 0
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    ]
    checks = []
    for p in (0.5, 0.9, 0.99):
        approx = F.expr(f"percentile_approx(l_extendedprice, {p}, 1000)")
        exact = F.expr(f"percentile(l_extendedprice, {p})")
        checks.append(F.abs(approx - exact) <= F.lit(0.01) * F.abs(exact))
    ok = checks[0] & checks[1] & checks[2]
    return li.groupBy("l_returnflag").agg(*aggs, ok.alias("within_bound"))


def _profile_col_sql(col: str, typ: str) -> str:
    num = typ != "string"
    return f"""
      SELECT '{col}' AS col_name, '{typ}' AS col_type,
             COUNT(*) AS n_rows,
             COUNT(*) - COUNT({col}) AS n_nulls,
             COUNT(DISTINCT {col}) AS n_distinct,
             TRUE AS approx_ok,
             {f"CAST(MIN({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"} AS min_num,
             {f"CAST(MAX({col}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"} AS max_num,
             {f"MIN({col})" if not num else "CAST(NULL AS VARCHAR)"} AS min_str,
             {f"MAX({col})" if not num else "CAST(NULL AS VARCHAR)"} AS max_str,
             {f"ROUND(AVG(LENGTH({col})), 4)" if not num else "CAST(NULL AS DOUBLE)"} AS avg_len
      FROM documents"""


_PROFILE_COLS = [
    ("doc_id", "bigint"),
    ("text", "string"),
    ("lang", "string"),
    ("source", "string"),
    ("n_chars", "bigint"),
]


@query(
    "profile_table",
    oracle=" UNION ALL ".join(_profile_col_sql(c, t) for c, t in _PROFILE_COLS),
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table profile census in ONE scan (the ANALYZE/data-quality
    step before any curation decision): per-column type, null count,
    exact + HLL cardinality with a within-3·rsd verdict boolean,
    numeric bounds, lexical bounds, mean string length. The pivoted
    hardcoded col_type literals double as a schema-drift tripwire —
    a column type change fails the external hash compare, not just a
    local test. The reshape is inline(array(struct)) over the single
    aggregated row, so the corpus is never re-scanned per column."""
    from full_docker_etl_spark.operators.profile import profile_columns

    return profile_columns(load_table(spark, sf_dir, "documents"))


@query(
    "profile_corpus",
    oracle="""
      WITH tok AS (SELECT doc_id,
                          unnest(regexp_split_to_array(
                            lower(trim(text)), '\\s+')) AS w
                   FROM documents WHERE text IS NOT NULL),
      tok2 AS (SELECT * FROM tok WHERE len(w) > 0),
      wc AS (SELECT w, COUNT(*) AS c FROM tok2 GROUP BY w),
      s AS (SELECT COUNT(DISTINCT doc_id) AS n_docs,
                   COUNT(*) AS n_tokens FROM tok2),
      v AS (SELECT COUNT(*) AS vocab,
                   SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
            FROM wc),
      t AS (SELECT w AS top_term, c AS top_term_n FROM wc
            ORDER BY c DESC, w LIMIT 1)
      SELECT n_docs, n_tokens, vocab,
             CAST(n_hapax AS BIGINT) AS n_hapax,
             ROUND(CAST(vocab AS DOUBLE) / n_tokens, 6) AS ttr,
             top_term, top_term_n
      FROM s CROSS JOIN v CROSS JOIN t
    """,
)
def profile_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token census (the pretraining datasheet numbers:
    token totals, vocabulary, hapax share, type-token ratio, modal
    term) in one wordcount shuffle plus scalars. Completes the profile
    family's fourth member: per-column census (profile_table), value
    histograms (profile_histogram), numeric skew (profile_skew), and
    now the TEXT-corpus statistics curation decisions cite."""
    from full_docker_etl_spark.operators.profile import corpus_stats

    return corpus_stats(load_table(spark, sf_dir, "documents"), "text", "doc_id")


_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "agg_unpivot",
    oracle=" UNION ALL ".join(
        f"""
      SELECT l_returnflag, '{m}' AS metric,
             CAST(SUM(CAST({m} AS DECIMAL(18,2))) AS DOUBLE) AS total,
             COUNT({m}) AS n
      FROM lineitem GROUP BY l_returnflag"""
        for m in _MEASURES
    ),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — the inverse of agg_pivot: the four lineitem
    measures become (metric, value) rows, then aggregate per
    (returnflag, metric). Compiles to ONE scan + Expand (plan-tested),
    not four unioned scans — the wide→long reshape every
    metrics-warehouse export needs, at a single pass's cost."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_returnflag"], _MEASURES, "metric", "value"
    )
    return long.groupBy("l_returnflag", "metric").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count("value").alias("n"),
    )


@query(
    "audit_referential",
    oracle="""
      SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_child,
             (SELECT COUNT(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
      FROM lineitem
      UNION ALL
      SELECT 'orders->customer', COUNT(*),
             (SELECT COUNT(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      FROM orders
      UNION ALL
      SELECT 'customer->nation', COUNT(*),
             (SELECT COUNT(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
      FROM customer
    """,
)
def audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity census (the data-quality companion to
    profile_table): orphan counts per declared FK edge via LEFT ANTI
    joins — the distributed form of 'which children have no parent'.
    Scale shape: each edge is one anti-join on its key — the child
    side ships only the key column, the nation probe broadcasts, and
    a 100 TB fact never materializes matches (anti stops at first
    hit). Zero rows means every edge is clean; the counts are pinned
    by the oracle either way."""
    tables = {
        n: load_table(spark, sf_dir, n)
        for n in ("lineitem", "orders", "customer", "nation")
    }
    edges = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for fk, child, ck, parent, pk in edges:
        c = tables[child].select(ck)
        p = tables[parent].select(pk)
        orphans = c.join(p, c[ck] == p[pk], "left_anti")
        parts.append(
            c.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            ).select(F.lit(fk).alias("fk"), "n_child", "n_orphans")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "profile_histogram",
    oracle="""
      WITH b AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
                 FROM lineitem),
      bucketed AS (
        SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20))
                          AS INTEGER), 19) AS bucket, lo, hi
        FROM lineitem, b WHERE l_extendedprice IS NOT NULL)
      SELECT bucket,
             ROUND(lo + bucket * (hi - lo) / 20, 4) AS lo,
             ROUND(lo + (bucket + 1) * (hi - lo) / 20, 4) AS hi,
             COUNT(*) AS n
      FROM bucketed GROUP BY bucket, lo, hi
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bucket histogram of lineitem prices — the
    distribution census beside profile_table's scalar stats. Bounds
    from one tiny (min,max) agg broadcast back; bucketing is a
    map-local floor + one groupBy on ≤20 keys. Bucket EDGES are
    rounded for display; bucket MEMBERSHIP is computed on raw doubles
    identically in both engines (same IEEE arithmetic), so the counts
    hash-match without a tolerance."""
    from full_docker_etl_spark.operators.profile import histogram_equi_width

    return histogram_equi_width(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice", 20
    )


@query(
    "agg_cube",
    oracle="""
      SELECT o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
             CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations in one pass (the sibling of
    agg_rollup's hierarchy) — one scan + Expand ×4, GROUPING() flags
    disambiguating subtotal NULLs from data NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            "o_orderstatus", "o_orderpriority",
            "g_status", "g_prio", "n", "sum_price",
        )
    )


@query(
    "profile_correlations",
    oracle="""
      SELECT 'l_quantity~l_extendedprice' AS pair,
             ROUND(corr(l_quantity, l_extendedprice), 4) AS r
      FROM lineitem
      UNION ALL
      SELECT 'l_quantity~l_discount', ROUND(corr(l_quantity, l_discount), 4)
      FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice~l_discount',
             ROUND(corr(l_extendedprice, l_discount), 4)
      FROM lineitem
    """,
)
def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations of the lineitem measures in ONE
    aggregation pass (all pairs are aggregate expressions in the same
    agg → one scan, one 1-row result reshaped with inline — the same
    single-pass discipline as profile_table). Rounded to 4 decimals:
    corr's FP accumulation differs across engines below that."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = [
        ("l_quantity", "l_extendedprice"),
        ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"),
    ]
    row = li.agg(
        *[
            F.round(F.corr(a, b), 4).alias(f"__{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    structs = [
        F.struct(
            F.lit(f"{a}~{b}").alias("pair"), F.col(f"__{i}").alias("r")
        )
        for i, (a, b) in enumerate(pairs)
    ]
    return row.select(F.inline(F.array(*structs)))


@query(
    "agg_cohort_retention",
    oracle="""
      WITH firsts AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1),
      cohorted AS (
        SELECT e.user_id,
               strftime(f.first_ts, '%Y-%m') AS cohort,
               (CAST(strftime(e.ts, '%Y') AS INTEGER) * 12
                  + CAST(strftime(e.ts, '%m') AS INTEGER))
               - (CAST(strftime(f.first_ts, '%Y') AS INTEGER) * 12
                  + CAST(strftime(f.first_ts, '%m') AS INTEGER))
                 AS month_offset
        FROM events e JOIN firsts f USING (user_id))
      SELECT cohort, month_offset,
             COUNT(DISTINCT user_id) AS n_active
      FROM cohorted GROUP BY 1, 2
    """,
)
def agg_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-activity month,
    distinct actives counted per (cohort, months-since-first) — the
    standard product-analytics rollup. Two shuffles total: the
    first-event agg on user_id and the final (cohort, offset)
    count-distinct; the cohort join rides the SAME user_id
    partitioning as the first agg, so no third exchange. Month
    arithmetic is integer (year*12+month), immune to the calendar
    pitfalls of day-difference division."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = ev.select("user_id", "ts").join(firsts, "user_id")
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    return (
        joined.select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM").alias("cohort"),
            (months(F.col("ts")) - months(F.col("first_ts"))).alias(
                "month_offset"
            ),
        )
        .groupBy("cohort", "month_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "agg_funnel",
    oracle="""
      WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                  WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
             FROM events e JOIN s1 USING (user_id)
             WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
             FROM events e JOIN s2 USING (user_id)
             WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT (SELECT COUNT(*) FROM s1) AS n_view,
             (SELECT COUNT(*) FROM s2) AS n_view_click,
             (SELECT COUNT(*) FROM s3) AS n_view_click_purchase
    """,
)
def agg_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase, strictly later steps):
    each stage is a keyed min-timestamp aggregate semi-restricted by
    the previous stage — three aggs and two joins ALL partitioned on
    user_id, so after the first shuffle the rest co-locate; no window
    over whole user histories, no event self-join explosion. The
    classic product-analytics progression count, value-checked."""
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None, prev_t: str, t: str):
        e = ev.where(F.col("event_type") == event_type).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").where(F.col("ts") > F.col(prev_t))
        return e.groupBy("user_id").agg(F.min("ts").alias(t))

    s1 = stage("view", None, "", "t1")
    s2 = stage("click", s1, "t1", "t2")
    s3 = stage("purchase", s2, "t2", "t3")
    return (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(
            s3.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
        )
    )


@query(
    "profile_skew",
    oracle="""
      WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
      t AS (SELECT SUM(n) AS total FROM c)
      SELECT user_id, n,
             ROUND(CAST(n AS DOUBLE) / total, 6) AS share,
             CAST(rn AS INTEGER) AS rn
      FROM (SELECT user_id, n, total,
                   row_number() OVER (ORDER BY n DESC, user_id) AS rn
            FROM c CROSS JOIN t)
      WHERE rn <= 10
    """,
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew census: the 10 heaviest join/grouping keys of a column
    with their share of total rows — the diagnostic that tells you
    whether AQE's skew splitting suffices or a key needs salting
    (operators/skew.py). One map-side-combined count, a broadcast
    1-row total, and a top-k that compiles to TakeOrderedAndProject —
    the census itself must not be the expensive part."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    ranked = (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
    )
    return ranked.select(
        "user_id", "n", "share",
        F.row_number()
        .over(
            Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
        )
        .alias("rn"),
    )


@query(
    "agg_salted",
    oracle="""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(ROUND(AVG(CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE)
               AS avg_value,
             MIN(value) AS min_value,
             MAX(value) AS max_value,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY event_type
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation, result-identical to the plain
    GROUP BY the oracle runs (the join_salted pattern applied to A1/A2-
    style aggregates): partials over (key, salt) then a merge over the
    key, so one company dominating the tape spreads over n_salts
    reducers instead of melting one — avg decomposed into sum+count
    partials (averaging partial averages would weight salt buckets
    equally). COUNT(DISTINCT user_id) goes through the dedupe-first
    shape (salted_count_distinct): the value column itself spreads the
    hot key, and no reducer ever holds the full distinct set. profile_
    skew DIAGNOSES heavy keys; this is the operator you reach for once
    it does. Sums ride DECIMAL for engine-portable exactness."""
    from full_docker_etl_spark.operators.skew import (
        salted_agg,
        salted_count_distinct,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    base = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": ("count", "event_id"),
            "sum_value": ("sum", "value_dec"),
            "avg_value": ("avg", "value_dec"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
        salt_src="event_id",
        n_salts=8,
    )
    nd = salted_count_distinct(ev, ["event_type"], "user_id", out="n_users")
    return base.join(nd, "event_type").select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.round("avg_value", 4).cast("double").alias("avg_value"),
        "min_value",
        "max_value",
        F.col("n_users").cast("long").alias("n_users"),
    )


@query(
    "audit_k_anonymity",
    oracle="""
      SELECT lang, source,
             CAST(FLOOR(n_chars / 100.0) AS INTEGER) AS len_bucket,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents
      GROUP BY 1, 2, 3
      HAVING COUNT(*) < 5
    """,
)
def audit_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIVACY release gate, the indirect-identifier side: every
    (lang, source, length-bucket) quasi-identifier combination held by
    fewer than k=5 documents — each such combination re-identifies its
    members to within <5 candidates, so a release would leak through
    attribute linkage even after text_pii_scrub removed the DIRECT
    identifiers. One map-side-combined groupBy over the quasi tuple
    (shuffles (tuple, partial count) pairs, never documents), then a
    count filter; the violating groups themselves are the audit
    output, value-checked by the oracle's HAVING form."""
    from full_docker_etl_spark.operators.profile import (
        k_anonymity_violations,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.floor(F.col("n_chars") / F.lit(100.0)).cast("int").alias(
            "len_bucket"
        ),
    )
    return k_anonymity_violations(docs, ["lang", "source", "len_bucket"], 5)
