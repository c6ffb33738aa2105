"""Skew and co-location tools for 100 TB joins.

- :func:`salted_join` — explicit key salting for pathological skew
  that AQE's skew-join splitting can't fix (e.g. one key = 30% of the
  fact table joined to a non-broadcastable dim). The hot side gets a
  deterministic salt from a unique column; the other side is exploded
  across all salt values. Result set is IDENTICAL to the plain join —
  proven by oracle/test — only the partitioning changes.
- :func:`write_bucketed` / co-located joins — bucketing pre-shuffles
  data at write time; two tables bucketed by the same key join with
  ZERO exchanges (asserted on the physical plan in
  tests/test_scale.py). At 100 TB this converts every recurring
  fact-fact join from a full shuffle into a local zip.

First line of defense is still AQE (`session.py` enables skew-join
splitting); these are for the cases AQE can't re-plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join on ``key`` with the skewed side salted into ``n_salts``
    sub-keys. ``salt_src`` is any column of the skewed side with
    per-row variation (a unique id is ideal) — the salt must be
    deterministic, NOT rand(), or retried tasks see different rows.

    other is exploded ×n_salts: use for mid-size dims too big to
    broadcast but far smaller than the fact side."""
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    exploded = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(exploded, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int,
    sort_key: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: rows are
    hash-partitioned by ``bucket_key`` into ``n_buckets`` files at
    write time, so every future join/agg on that key skips its
    exchange (and its sort, if sorted)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_key:
        writer = writer.sortBy(sort_key)
    writer.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a SALTED key: phase 1 groups by
    (keys…, salt) and computes partial states, phase 2 groups by the
    real keys and merges them. The result is IDENTICAL to a plain
    ``groupBy(keys).agg(...)`` (oracle-proven); only the shuffle
    distribution changes — a key owning 30% of a 100 TB tape spreads
    over ``n_salts`` reducers instead of melting one.

    When to reach for it: Spark's hash aggregate already partial-
    aggregates map-side, so a *small-state* agg (sum/count) on a hot
    key usually survives without help — each map task emits one row
    per key. The salt matters when the per-group STATE is what's hot:
    the merge of many wide partials on one reducer (dozens of agg
    columns × a key that every map task emits, the A1/A2 21-aggregate
    shape), sort-aggregate fallbacks, or an AQE misestimate. Like
    :func:`salted_join`, the salt is deterministic (xxhash64 of
    ``salt_src``, never rand()) so retried tasks re-derive identical
    rows.

    ``aggs`` maps output column → (fn, input column), fn ∈ {sum,
    count, min, max, avg}. avg is decomposed into (sum, count)
    partials and finished at the merge — the only algebraic form that
    re-aggregates correctly; averaging partial averages would weight
    every salt bucket equally no matter how many rows it holds.
    """
    supported = {"sum", "count", "min", "max", "avg"}
    bad = {fn for fn, _ in aggs.values()} - supported
    if bad:
        raise ValueError(
            f"salted_agg supports {sorted(supported)}; got {sorted(bad)}. "
            "Holistic aggregates (exact percentiles, collect_*) don't "
            "decompose into mergeable partials by salting the key — use "
            "approx sketches or salted_count_distinct's dedupe shape."
        )
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    partials, finals = [], []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn == "sum":
            partials.append(F.sum(col).alias(f"__p_{out}"))
            finals.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            partials.append(F.count(col).alias(f"__p_{out}"))
            finals.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partials.append(F.min(col).alias(f"__p_{out}"))
            finals.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partials.append(F.max(col).alias(f"__p_{out}"))
            finals.append(F.max(f"__p_{out}").alias(out))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_count_distinct(
    df: DataFrame, keys: list[str], value_col: str, out: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key for SKEWED keys, as the
    classic two-job rewrite: dedupe on (keys…, value) first — the
    value column itself is the salt, spreading a hot key's rows across
    reducers by what is being counted — then count rows per key. A
    single-pass countDistinct holds the hot key's entire distinct SET
    in one reducer's hash state; this shape never materializes a set
    anywhere. The final count is ``count(value_col)`` — NOT
    ``count(*)`` — so the one (key, NULL) row a null-bearing corpus
    leaves after the dedupe is ignored exactly as SQL COUNT(DISTINCT
    col) ignores NULLs, while a key whose values are ALL null still
    surfaces with count 0 (as GROUP BY emits it). Proven identical to
    COUNT(DISTINCT ...) by oracle, including on a null-bearing corpus
    (tests/test_scale.py)."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(value_col).alias(out))
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
) -> None:
    """DATA CLUSTERING for scan pruning (OPTIMIZE ... ZORDER's
    single-dimension core): range-partition the rows by the cluster
    keys and sort within each partition, so every output file covers a
    NARROW, NON-OVERLAPPING key range. Parquet footers then carry
    tight min/max stats per file and row group, and any range or point
    predicate on the cluster keys skips whole files at planning time
    and whole row groups at read time — on a 100 TB fact table scanned
    by date, the difference between touching every file and touching
    the week you asked for. Rows with equal keys land in the same
    partition (range partitioner contract), so file ranges are
    disjoint by construction — pinned in tests via pyarrow footer
    stats. ``n_files`` bounds the output fan-out (default: the
    session's shuffle parallelism)."""
    cols = [F.col(c) for c in cluster_by]
    ranged = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)


def write_clustered_zorder(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    bits: int = 4,
) -> None:
    """MULTI-COLUMN interleaved clustering (OPTIMIZE ... ZORDER BY): map
    each cluster column to a ``2^bits``-level QUANTILE bucket, bit-
    interleave the bucket ids into one Morton (Z-curve) value, then
    range-partition + sort by it. Contiguous Z ranges are small
    axis-aligned boxes, so EVERY clustered column's footer min/max
    stays narrow per file and a predicate on ANY ONE of them skips
    most files — where single-key clustering (:func:`write_clustered`)
    gives one column perfect pruning and the others none. The quantile
    bucketing (approxQuantile — a distributed sample, the same shape a
    range partitioner uses) makes the curve robust to skewed value
    distributions where min/max linear scaling would collapse most
    rows into a few cells.

    With ``n_files`` ≈ ``2^(m·top_bits)`` the file split uses roughly
    ``top_bits`` high bits per dimension: at 16 files × 2 columns a
    point predicate on either column touches ~1/4 of the files —
    pinned in tests via pyarrow footer stats on BOTH columns. More
    dimensions dilute per-column pruning (each gets bits/m of the
    prefix) — the standard Z-order trade; keep it to the 2-3 dominant
    predicates. Numeric, date and timestamp columns supported. Rows
    with NULL cluster values sort to bucket 0 (the range partitioner
    puts them first either way); their files simply carry no stats to
    prune on — same contract as single-key clustering."""
    if len(cluster_by) < 2:
        raise ValueError(
            "write_clustered_zorder needs >= 2 columns; use "
            "write_clustered for single-key clustering"
        )
    if len(cluster_by) * bits > 63:
        # the Morton value is built in ONE bigint; past 63 interleaved
        # bits the shifts wrap and the curve silently scrambles
        raise ValueError(
            f"{len(cluster_by)} columns x {bits} bits = "
            f"{len(cluster_by) * bits} interleaved bits exceeds the "
            "63-bit Morton budget; lower bits or cluster fewer columns"
        )
    levels = 1 << bits
    numeric = ("tinyint", "smallint", "int", "bigint", "float", "double")
    dtypes = dict(df.dtypes)
    nums = []
    for c in cluster_by:
        dt = dtypes[c]
        if dt == "date":
            nums.append(
                F.datediff(F.col(c), F.lit("1970-01-01").cast("date"))
                .cast("double")
            )
        elif dt.startswith(("timestamp", "decimal")) or dt in numeric:
            nums.append(F.col(c).cast("double"))
        else:
            # string/boolean/complex would cast('double') to NULL for
            # every row — all rows in bucket 0, clustering a silent
            # no-op; refuse loudly instead
            raise ValueError(
                f"cluster column {c!r} has unsupported type {dt}; "
                "z-order clustering supports numeric, date and "
                "timestamp columns"
            )
    probe = df.select(
        *[n.alias(f"__zq_{i}") for i, n in enumerate(nums)]
    )
    probs = [i / levels for i in range(1, levels)]
    bounds = probe.approxQuantile(
        [f"__zq_{i}" for i in range(len(nums))], probs, 0.001
    )
    m = len(cluster_by)
    z = F.lit(0).cast("bigint")
    for j, (num, bnds) in enumerate(zip(nums, bounds)):
        bucket = F.size(
            F.filter(
                F.array(*[F.lit(float(b)) for b in bnds]),
                lambda b: b <= num,
            )
        ).cast("bigint")
        for i in range(bits):
            bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1).cast("bigint"))
            z = z + F.shiftleft(bit, i * m + (m - 1 - j))
    ranged = (
        df.withColumn("__z", z).repartitionByRange(n_files, "__z")
        if n_files is not None
        else df.withColumn("__z", z).repartitionByRange("__z")
    )
    ranged.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)
