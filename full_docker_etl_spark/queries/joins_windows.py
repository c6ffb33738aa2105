"""Registered queries for joins (J1-J4), set ops (U1), and window
functions (§2.5), bound to the testdata tables."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from full_docker_etl_spark.operators.joins import (
    anti_probe,
    broadcast_enrich,
    semi_manifest,
)
from full_docker_etl_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)
from full_docker_etl_spark.operators.windows import (
    latest_per_group,
    moving_agg,
    rank_top_n,
    running_total,
    with_lag,
)
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table

# ---------------------------------------------------------------- joins


@query(
    "join_broadcast",
    oracle="""
      SELECT r_name, n_name,
             COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast hash join of small master dims onto the fact side —
    replaces the reference's per-company literal smuggle
    (``TransForm_Load_Yfinance.py:223-224,395-410``). The plan must
    show BroadcastHashJoin (asserted in tests/test_plans.py)."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    enriched = broadcast_enrich(
        customer,
        nation,
        on=customer["c_nationkey"] == nation["n_nationkey"],
    )
    enriched = broadcast_enrich(
        enriched, region, on=enriched["n_regionkey"] == region["r_regionkey"]
    )
    return enriched.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_acctbal"),
    )


@query(
    "join_anti",
    oracle="""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN
        (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left-anti dedup/insert-if-absent probe
    (``extract_iqplus_news_dag.py:144``) — customers with no pending
    ('P') orders. (Every customer has *some* order in the testdata, so
    the unfiltered form would be an empty — i.e. vacuous — check.)"""
    customer = load_table(spark, sf_dir, "customer")
    pending = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return anti_probe(customer, pending, on="c_custkey").select("c_custkey", "c_name")


@query(
    "join_semi",
    oracle="""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left-semi manifest join (the reference's pickle id-list
    handoff, ``TransForm_Load_Yfinance.py:432-434``) — customers with
    at least one open order."""
    customer = load_table(spark, sf_dir, "customer")
    manifest = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return semi_manifest(customer, manifest, on="c_custkey").select(
        "c_custkey", "c_name"
    )


@query(
    "join_equi",
    oracle="""
      SELECT o_orderstatus,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus
    """,
)
def join_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: fact×fact equi-join + aggregate. Shuffles both sides on the
    join key once; AQE handles skew splitting at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_star_revenue",
    oracle="""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey  = o_orderkey
      JOIN customer ON o_custkey   = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name IN ('ASIA', 'EUROPE')
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema revenue rollup (TPC-H Q5 shape): two chained FACT
    joins under selective dimension and date predicates, revenue per
    nation. The declared plan leaves Catalyst the full optimization
    menu, and the plan test pins what it must choose: the date range
    PUSHED to the orders scan (prunes before any join), dims joined as
    BroadcastHashJoin for the BOUNDED dims (nation/region: 25/5 rows
    at any SF, hinted explicitly), and no Cartesian anywhere. The
    customer join is deliberately NOT hinted — customer scales with
    the corpus, so the optimizer must pick: auto-broadcast under the
    10 MB threshold at test SF, shuffle join at 100 TB where it no
    longer fits. What remains is the unavoidable data motion of a
    star scan — fact-key shuffles plus the final 25-key group — with
    the region filter transitively shrinking the customer side before
    lineitem is ever touched."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    cust_dim = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation["n_regionkey"] == region["r_regionkey"],
                )
            ),
            customer["c_nationkey"] == nation["n_nationkey"],
        )
    ).select("c_custkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "union_by_name",
    oracle="""
      SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of differently-ordered projections
    (``TransForm_Load_Yfinance.py:330-340``)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "event_type", "value"
    )
    # deliberately different column order — unionByName must align it
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "value", "event_id", "event_type"
    )
    return clicks.unionByName(purchases)


# -------------------------------------------------------------- windows


@query(
    "win_latest_per_group",
    oracle="""
      SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
      FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
      ) WHERE rn = 1
    """,
)
def win_latest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: latest order per customer — the distributed form of the
    reference's ``collect()[0][0]`` latest-date
    (``dag_transform_load_yfinance_fixed.py:333``)."""
    orders = load_table(spark, sf_dir, "orders")
    latest = latest_per_group(
        orders, ["o_custkey"], [("o_orderdate", False), ("o_orderkey", False)]
    )
    return latest.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


_DAILY_REV = """
  SELECT l_returnflag AS series,
         strftime(l_shipdate, '%Y-%m-%d') AS day,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)))
              AS DECIMAL(18,4)) AS sum_rev
  FROM lineitem GROUP BY 1, 2
"""


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.groupBy(
            F.col("l_returnflag").alias("series"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
        )
        .agg(F.sum(rev).cast("decimal(18,4)").alias("sum_rev"))
    )


@query(
    "win_lag_change",
    oracle=f"""
      SELECT series, day, CAST(sum_rev AS DOUBLE) AS sum_rev,
             CAST(prev_rev AS DOUBLE) AS prev_rev,
             CAST(sum_rev - prev_rev AS DOUBLE) AS change
      FROM (
        SELECT series, day, sum_rev,
               lag(sum_rev) OVER (PARTITION BY series ORDER BY day) AS prev_rev
        FROM ({_DAILY_REV})
      )
    """,
)
def win_lag_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: lag-based day-over-day change (the daily-return analytic
    the OHLCV table implies). DECIMAL arithmetic internally (exact, so
    the difference has one well-defined value); outputs surfaced as
    DOUBLE for hash portability."""
    daily = _daily_rev(spark, sf_dir)
    lagged = with_lag(daily, "sum_rev", ["series"], [("day", True)], "prev_rev")
    return lagged.select(
        "series",
        "day",
        F.col("sum_rev").cast("double").alias("sum_rev"),
        F.col("prev_rev").cast("double").alias("prev_rev"),
        (F.col("sum_rev") - F.col("prev_rev"))
        .cast("double")
        .alias("change"),
    )


@query(
    "win_moving_avg",
    oracle=f"""
      SELECT series, day, CAST(sum_rev AS DOUBLE) AS sum_rev,
             CAST(SUM(sum_rev) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS ma7
      FROM ({_DAILY_REV})
      WINDOW w AS (PARTITION BY series ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: 7-row moving average of daily revenue per series, as an
    exact decimal moving sum ÷ frame count (ROUND(AVG(...)) over small
    frames lands exactly on round-half boundaries where engines
    disagree — same pitfall as the grain averages). Output columns are
    DOUBLE (DECIMAL reprs don't hash portably)."""
    daily = _daily_rev(spark, sf_dir)
    summed = moving_agg(
        daily,
        F.sum("sum_rev"),
        ["series"],
        [("day", True)],
        preceding=6,
        out_col="ma7_sum",
    )
    counted = moving_agg(
        summed,
        F.count(F.lit(1)),
        ["series"],
        [("day", True)],
        preceding=6,
        out_col="ma7_n",
    )
    return counted.select(
        "series",
        "day",
        F.col("sum_rev").cast("double").alias("sum_rev"),
        (F.col("ma7_sum").cast("double") / F.col("ma7_n")).alias("ma7"),
    )


@query(
    "win_rank_topn",
    oracle="""
      SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
      ) WHERE rn <= 3
    """,
)
def win_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: top-3 orders per customer — per-group top-k without any
    global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return rank_top_n(
        orders,
        ["o_custkey"],
        [("o_totalprice", False), ("o_orderkey", True)],
        3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


@query(
    "win_running_total",
    oracle="""
      SELECT user_id, event_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_value
      FROM events
    """,
)
def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5: per-user running total over event time. DECIMAL running
    sum internally → exact regardless of engine accumulation strategy;
    surfaced as DOUBLE for hash portability."""
    ev = load_table(spark, sf_dir, "events")
    out = running_total(
        ev,
        F.col("value").cast("decimal(18,2)"),
        ["user_id"],
        [("ts", True), ("event_id", True)],
        "running_value",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("running_value").cast("double").alias("running_value"),
    )


@query(
    "win_time_range",
    oracle="""
      SELECT o_orderkey, o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS spend_30d
      FROM orders
    """,
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 extension: VALUE-based time-range window — each order's
    trailing 30-day spend per customer. Unlike the rows-based moving
    frames, the frame is defined on the time axis itself
    (rangeBetween over epoch seconds ≡ RANGE INTERVAL 30 DAY), so
    order-date gaps produce the correct frame rather than a fixed row
    count's guess. DECIMAL inside the frame sum for engine-exactness;
    ties on a same-day pair are frame-PEERS in both engines, so the
    result needs no tie-break to hash identically."""
    from full_docker_etl_spark.operators.windows import time_range_agg

    orders = load_table(spark, sf_dir, "orders")
    out = time_range_agg(
        orders,
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
        ["o_custkey"],
        "o_orderdate",
        days=30,
        out_col="spend_30d",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.col("spend_30d").cast("double").alias("spend_30d"),
    )


# ------------------------------------------------------------- temporal


@query(
    "join_asof",
    oracle="""
      WITH l AS (SELECT user_id, event_id, ts FROM events
                 WHERE event_type = 'click'),
           r AS (SELECT user_id, ts, MAX(value) AS last_purchase
                 FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      SELECT l.user_id, l.event_id, epoch_us(l.ts) AS ts_us, r.last_purchase
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal as-of join (SURVEY.md §2.3 closing note): each click
    event picks up the user's most recent purchase value at or before
    it. Distributed as union + last-ignoring-nulls window — ONE shuffle
    on the key, no inequality join, no per-key explosion; survives
    100 TB because state per key is a single running value. Oracle is
    DuckDB's native ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("last_purchase"))
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_vals=["last_purchase"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "last_purchase",
    )


@query(
    "join_range",
    oracle="""
      SELECT l.user_id, l.event_id,
             COUNT(*) AS n_purch,
             CAST(SUM(CAST(r.value AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_purch
      FROM (SELECT user_id, event_id, epoch_us(ts) AS t
            FROM events WHERE event_type = 'click') l
      JOIN (SELECT user_id, epoch_us(ts) AS t, value
            FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id
       AND r.t <= l.t AND r.t > l.t - 259200000000
      GROUP BY 1, 2
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join: purchases in the trailing 3 days before
    each click, per user, aggregated. Time-bucket blocking (1-day
    buckets) turns the inequality join into an equi-join on
    (key, bucket) with 4 probes per left row — candidates stay
    proportional to the window instead of the whole per-key history,
    which is what makes it survive a 100 TB event log."""
    ev = load_table(spark, sf_dir, "events")
    day_us = 86_400_000_000
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pt"), "value"
    )
    joined = range_join_bucketed(
        clicks,
        purchases,
        key="user_id",
        left_ts="t",
        right_ts="pt",
        window_us=3 * day_us,
        bucket_us=day_us,
    )
    return joined.groupBy("user_id", "event_id").agg(
        F.count(F.lit(1)).alias("n_purch"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_purch"),
    )


@query(
    "join_salted",
    oracle="""
      SELECT e.user_id, e.event_id, e.value, c.c_name
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join, result-identical to the plain join (which is
    exactly what the oracle checks): the hot side's key is widened
    with a deterministic xxhash64 salt and the other side exploded
    ×n_salts, spreading a pathological key over n_salts reducers. For
    skew AQE's runtime splitting can't fix (one key = 30% of a 100 TB
    fact against a non-broadcastable dim), this is the manual tool —
    the oracle proves the rewrite changes the partitioning, never the
    result. Salting is deterministic (never rand()) so retried tasks
    re-derive identical salt values."""
    from full_docker_etl_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value"
    )
    cust = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS user_id", "c_name"
    )
    return salted_join(ev, cust, key="user_id", salt_src="event_id", n_salts=8)


@query(
    "win_rank_family",
    oracle="""
      SELECT o_custkey, o_orderkey,
             rank() OVER w1 AS rnk,
             dense_rank() OVER w1 AS drnk,
             ROUND(percent_rank() OVER w1, 4) AS prnk,
             CAST(ntile(4) OVER w2 AS INTEGER) AS quartile
      FROM orders
      WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
             w2 AS (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family per customer: rank/dense_rank/
    percent_rank over the VALUE alone (tie rows share a rank, so the
    result is deterministic without a tie-break), ntile over value +
    unique key (tile assignment of tied rows depends on row order, so
    ntile's window MUST carry the tie-break — the subtle determinism
    split this query exists to pin)."""
    w1 = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w1).alias("drnk"),
        F.round(F.percent_rank().over(w1), 4).alias("prnk"),
        F.ntile(4).over(w2).alias("quartile"),
    )


@query(
    "join_fuzzy_names",
    oracle="""
      WITH p AS (SELECT DISTINCT p_name FROM part)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
      FROM p a JOIN p b
        ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND a.p_name < b.p_name
       AND abs(length(a.p_name) - length(b.p_name)) <= 3
       AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def join_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy RECORD LINKAGE over the part-name vocabulary: near-
    identical names within edit distance 3, found WITHOUT an all-pairs
    cartesian — first-token blocking key (equi-join, hash-partitioned)
    + the lossless |length-difference| ≤ d band prune, then one
    JVM-side levenshtein per surviving candidate. The oracle runs the
    identical blocked form in SQL (DuckDB's levenshtein), so the
    blocking contract itself is value-checked; dedup to distinct names
    first makes the pair set the vocabulary's, not the row count's."""
    from full_docker_etl_spark.operators.joins import fuzzy_join

    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct()
    )
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return fuzzy_join(a, b, "name_a", "name_b", max_dist=3).where(
        F.col("name_a") < F.col("name_b")
    ).select("name_a", "name_b", "edit_dist")


@query(
    "join_fuzzy_recall",
    oracle="""
      WITH p AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL),
      s AS (SELECT p_name FROM p WHERE
         CAST(('0x' || substr(md5('fzslice:' || p_name), 1, 8)) AS BIGINT)
           % (SELECT GREATEST(2, COUNT(*) // 500) FROM p) = 0),
      pairs AS (SELECT a.p_name pa, b.p_name pb
                FROM s a JOIN s b ON a.p_name < b.p_name
                  AND abs(length(a.p_name) - length(b.p_name)) <= 3
                WHERE levenshtein(a.p_name, b.p_name) <= 3),
      tok AS (SELECT DISTINCT p_name,
                     unnest(regexp_split_to_array(trim(p_name), '\\s+')) t
              FROM s)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
             CAST(COALESCE(SUM(CASE WHEN split_part(pa, ' ', 1) =
                                         split_part(pb, ' ', 1)
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_first_token,
             CAST(COALESCE(SUM(CASE WHEN EXISTS (
                      SELECT 1 FROM tok x JOIN tok y ON x.t = y.t
                      WHERE x.p_name = pa AND y.p_name = pb)
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
               AS n_any_token,
             TRUE AS any_recall_ok, TRUE AS first_recall_ok
      FROM pairs
    """,
)
def join_fuzzy_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL VERDICT for the fuzzy-join blockers (VERDICT r7 #3 — the
    repo's standard: every lossy candidate generator gets an external
    recall row). Exact truth is levenshtein ≤ 3 over ALL pairs of a
    bounded deterministic name slice (~500 names max via the md5
    'fzslice:' bucket, the _judge_slice sizing pattern) — computed
    WITHOUT a cartesian through a LOSSLESS length-bucket expansion:
    levenshtein(a,b) ≥ |len(a)−len(b)|, so with bucket =
    floor(len/(d+1)) a qualifying pair's buckets differ by at most 1;
    exploding one side to {b−1, b, b+1} and equi-joining on the bucket
    reaches every candidate (a plain hash join, plan-gate clean).
    Both blockers then run as the REAL operator and are counted
    against truth; the oracle recomputes all three counts analytically
    in DuckDB (levenshtein + split_part + shared-token EXISTS), so a
    blocking bug shows as a count mismatch, and a recall REGRESSION
    flips a boolean the oracle pins TRUE. Measured on the part-name
    vocabulary: any_token 14/14 = 1.0 (floor 0.9), first_token 2/14 =
    0.14 (floor 0.1 — honest: multi-word names usually differ by a
    whole word, which is why any_token is the production blocker; the
    ≤500-name slice keeps max_token_df=1000 from ever binding, so the
    oracle's uncapped EXISTS mirrors the operator exactly)."""
    from full_docker_etl_spark.operators.joins import fuzzy_join

    d = 3
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .where(F.col("p_name").isNotNull())
        .distinct()
    )
    m = max(2, names.count() // 500)
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("fzslice:"), F.col("p_name"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    s = names.where(bucket % m == 0)
    # exact truth via the lossless length-bucket expansion
    lbuck = (F.length("p_name") / (d + 1)).cast("long")
    a = s.select(
        F.col("p_name").alias("pa"),
        F.explode(
            F.array(lbuck - 1, lbuck, lbuck + 1)
        ).alias("__bk"),
    )
    b = s.select(F.col("p_name").alias("pb"), lbuck.alias("__bk"))
    truth = (
        a.join(b, "__bk")
        .where(F.col("pa") < F.col("pb"))
        .dropDuplicates(["pa", "pb"])
        .where(F.abs(F.length("pa") - F.length("pb")) <= d)
        .where(F.levenshtein(F.col("pa"), F.col("pb")) <= d)
        .select("pa", "pb")
    )
    al = s.select(F.col("p_name").alias("name_a"))
    bl = s.select(F.col("p_name").alias("name_b"))

    def hits(mode: str, flag: str) -> DataFrame:
        return (
            fuzzy_join(al, bl, "name_a", "name_b", d, block=mode)
            .where(F.col("name_a") < F.col("name_b"))
            .select(
                F.col("name_a").alias("pa"),
                F.col("name_b").alias("pb"),
                F.lit(1).alias(flag),
            )
        )

    return (
        truth.join(hits("first_token", "_hf"), ["pa", "pb"], "left")
        .join(hits("any_token", "_ha"), ["pa", "pb"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.count("_hf").alias("n_first_token"),
            F.count("_ha").alias("n_any_token"),
        )
        .select(
            "n_exact",
            "n_first_token",
            "n_any_token",
            (
                F.col("n_any_token") >= F.lit(0.9) * F.col("n_exact")
            ).alias("any_recall_ok"),
            (
                F.col("n_first_token") >= F.lit(0.1) * F.col("n_exact")
            ).alias("first_recall_ok"),
        )
    )


@query(
    "set_except_intersect",
    oracle="""
      WITH buyers AS (SELECT DISTINCT o_custkey AS c FROM orders),
      custs AS (SELECT DISTINCT c_custkey AS c FROM customer),
      never AS (SELECT c FROM custs EXCEPT SELECT c FROM buyers),
      ordered AS (SELECT c FROM custs INTERSECT SELECT c FROM buyers)
      SELECT (SELECT COUNT(*) FROM never) AS n_never_ordered,
             (SELECT COUNT(*) FROM ordered) AS n_ordered,
             (SELECT COUNT(*) FROM custs) AS n_customers
    """,
)
def set_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 beyond the reference's unionByName: EXCEPT and INTERSECT as
    first-class set operations (the reference's de-facto EXCEPT is the
    anti-join probe J2 — these are the declarative forms, which
    Catalyst plans as the same left-anti/left-semi aggregates, so
    there is no new physical shape to pay for). Customers who never
    ordered vs customers who did, plus the partition-count identity
    n_never + n_ordered = n_customers baked into the oracle's three
    counts."""
    custs = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("c")
    ).distinct()
    buyers = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c")
    ).distinct()
    never = custs.exceptAll(buyers)
    both = custs.intersect(buyers)
    return (
        never.agg(F.count(F.lit(1)).alias("n_never_ordered"))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("n_ordered")))
        .crossJoin(custs.agg(F.count(F.lit(1)).alias("n_customers")))
    )
