"""Single-pass table profiling (the ANALYZE/data-quality census every
engine needs before curation decisions): per-column null counts,
cardinality, bounds, and string length stats — over ANY DataFrame, in
exactly ONE scan.

Scale shape: every statistic is an ordinary aggregate, so the whole
profile is one map-side-combined aggregation producing a SINGLE row;
the per-column reshape is `inline(array(struct(...)))` over that one
row — no union of re-computed branches (a naive `union` of per-column
projections would re-run the aggregation once per column), no second
pass, no shuffle beyond the one 1-row agg exchange. Cardinality is
computed BOTH ways: HyperLogLog++ (the fixed-memory 100 TB tool) and
exact COUNT(DISTINCT) beside it with a within-3·rsd verdict boolean —
at real scale drop the exact side and keep the sketch (the exact
count-distincts are what make this single pass expand k-fold; the
sketch-only profile stays a plain one-pass agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` in one scan.

    Returns one row per column:
    ``col_name, col_type, n_rows, n_nulls, n_distinct, approx_ok,
    min_num, max_num, min_str, max_str, avg_len`` — numeric bounds as
    doubles (null for non-numerics), lexical bounds and rounded mean
    length for strings (null otherwise), ``approx_ok`` = the HLL
    estimate landed within 3·rsd of the exact cardinality.
    """
    types = dict(df.dtypes)
    cols = columns or df.columns
    unknown = [c for c in cols if c not in types]
    if unknown:
        raise ValueError(f"profile_columns: no such columns {unknown}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.isnull(c).cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__nd"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__nda"),
        ]
        if types[c] in _NUMERIC:
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min_num"),
                F.max(c).cast("double").alias(f"{c}__max_num"),
            ]
        elif types[c] == "string":
            aggs += [
                F.min(c).alias(f"{c}__min_str"),
                F.max(c).alias(f"{c}__max_str"),
                F.round(F.avg(F.length(c)), 4).alias(f"{c}__avg_len"),
            ]
    row = df.agg(*aggs)

    def _field(c: str, suffix: str, dtype: str, alias: str):
        name = f"{c}__{suffix}"
        if f"{c}__{suffix}" in row.columns:
            return F.col(name).cast(dtype).alias(alias)
        return F.lit(None).cast(dtype).alias(alias)

    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(types[c]).alias("col_type"),
            F.col("__n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (
                F.abs(F.col(f"{c}__nda") - F.col(f"{c}__nd"))
                <= F.lit(3.0 * rsd) * F.col(f"{c}__nd")
            ).alias("approx_ok"),
            _field(c, "min_num", "double", "min_num"),
            _field(c, "max_num", "double", "max_num"),
            _field(c, "min_str", "string", "min_str"),
            _field(c, "max_str", "string", "max_str"),
            _field(c, "avg_len", "double", "avg_len"),
        )
        for c in cols
    ]
    return row.select(F.inline(F.array(*structs)))


def histogram_equi_width(
    df: DataFrame,
    col: str,
    n_buckets: int = 20,
) -> DataFrame:
    """Equi-width histogram of a numeric column: bucket index
    floor((x - min) / width) with the max value clamped into the last
    bucket. Two aggregations total: one tiny (min, max) pass whose
    single row broadcasts back, then the bucketing groupBy — the
    standard ANALYZE shape (at 100 TB you run it once per ingest and
    persist the result, you don't re-derive bounds per query).
    Returns (bucket, lo, hi, n) with deterministic double bounds.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # NaN would poison both sides: it sorts GREATEST in max() (an
    # all-NaN-free max corrupted by one bad row) and floor(NaN) buckets
    # to null. Exclude NaN rows like nulls, before the bounds pass.
    df = df.where(
        F.col(col).isNotNull() & ~F.isnan(F.col(col).cast("double"))
    )
    bounds = df.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets))
    # constant column → width 0 → x/0 is Inf/NaN under IEEE doubles;
    # everything belongs in bucket 0 by definition
    bucket = (
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col(col).cast("double") - F.col("__lo")) / width),
                F.lit(n_buckets - 1),
            )
        )
        .cast("int")
    )
    return (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("__lo").alias("__lo2"),
            F.first("__hi").alias("__hi2"),
        )
        .select(
            "bucket",
            F.round(
                F.col("__lo2")
                + F.col("bucket") * (F.col("__hi2") - F.col("__lo2")) / n_buckets,
                4,
            ).alias("lo"),
            F.round(
                F.col("__lo2")
                + (F.col("bucket") + 1)
                * (F.col("__hi2") - F.col("__lo2"))
                / n_buckets,
                4,
            ).alias("hi"),
            "n",
        )
    )


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """PRIVACY AUDIT: the quasi-identifier combinations whose group
    size falls below ``k`` — each such combination re-identifies its
    members to within fewer than k candidates, the k-anonymity
    failure a training-data release gate checks before publishing
    (alongside PII scrubbing, which removes direct identifiers; this
    catches the INDIRECT ones). One groupBy over the quasi columns
    (map-side combined), then a count filter — the violating groups
    are the output, ordered nothing (caller sorts), NULL quasi values
    participate as their own group (a null combination can still
    re-identify). At 100 TB this is one shuffle of (quasi-tuple,
    partial-count) pairs, never rows."""
    if k < 2:
        raise ValueError("k-anonymity needs k >= 2 (k=1 is always satisfied)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .where(F.col("group_size") < k)
    )


def grouped_percentiles_exact(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: dict[str, float],
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """EXACT type-7 (linear-interpolation) percentiles per group —
    the same definition as Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` — computed from VALUE COUNTS instead of
    buffering every group member.

    Spark's exact ``percentile`` aggregate holds every value of a
    group in one ObjectHashAggregate buffer: at 100 TB one hot group
    is an executor OOM. This operator exploits that analytics values
    are usually discretized (the repo rounds scores to 4 dp): state is
    O(distinct values per group), not O(rows per group) —
    one map-side-combined count shuffle, one per-group cumulative
    window over the (small) distinct-value frame, one final agg.
    ``approx_percentile`` is the alternative when values are truly
    continuous; this form keeps EXACT cross-engine parity.

    PRECONDITION (enforced): the value column must be a bounded grid —
    rounded scores, integer counts, fixed-point cents. A continuous
    double column would silently rebuild the O(rows-per-group) state
    this operator exists to avoid, so any group exceeding
    ``max_distinct`` distinct values raises at execution time with a
    pointer to the approx path (pass ``max_distinct=None`` only when
    the grid bound is proven elsewhere).

    ``ps`` maps output column name → fraction, e.g.
    ``{"p50": 0.5}``. For fraction p over n values sorted ascending
    (0-indexed), h = (n-1)·p, and the result is
    ``v[floor(h)] + (h - floor(h)) · (v[floor(h)+1] - v[floor(h)])``
    — value at 0-indexed position j is the distinct value whose
    cumulative count first reaches j+1. Returns one row per group:
    (group_col, n = group row count, <one column per ps entry>)."""
    # percentile()/quantile_cont ignore NULL values — match that here
    # (a NULL (group, value) row would otherwise enter the counts and
    # shift every position)
    vc = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return grouped_percentiles_from_counts(
        vc, group_col, value_col, "_c", ps, max_distinct=max_distinct
    )


def grouped_percentiles_from_counts(
    vc: DataFrame,
    group_col: str,
    value_col: str,
    count_col: str,
    ps: dict[str, float],
    discrete: bool = False,
    max_distinct: int | None = 1_000_000,
) -> DataFrame:
    """:func:`grouped_percentiles_exact`'s primitive: ``vc`` is an
    already-counted frame with EXACTLY one row per (group, distinct
    non-null value) and ``count_col`` occurrences (duplicate
    (group, value) rows or null values would corrupt the cumulative
    positions). Pass this directly when the caller needs the
    value-count frame for other statistics too (shares, modes) — one
    scoring pass feeds everything.

    ``discrete=True`` switches every ``ps`` entry from type-7
    interpolation to the NEAREST-RANK definition (DuckDB's
    ``quantile_disc``): the attained value at 1-indexed position
    ceil(p·n). Use it when the result feeds a THRESHOLD comparison:
    interpolation can land exactly on a rounding-grid midpoint where a
    1-ulp cross-engine difference flips the rounded digit (observed at
    sf0.1 — a p25 of 4-dp scores interpolated to x.xxxx5), while a
    nearest-rank cutoff is a member of the value set and exact in any
    engine."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    vc = vc.withColumn(
        "_cum", F.sum(count_col).over(w)
    ).withColumn("_n", F.sum(count_col).over(wg))
    v = F.col(value_col).cast("double")
    if max_distinct is not None:
        # bounded-grid precondition, enforced IN the plan: the distinct
        # count rides the existing per-group window pass (same
        # partition key, no extra shuffle), and the raise is folded
        # into the value expression so every percentile evaluation
        # trips it — a continuous-double caller fails loudly instead of
        # silently rebuilding the O(rows-per-group) buffer this
        # operator replaces.
        vc = vc.withColumn("_nd", F.count(F.lit(1)).over(wg))
        v = F.when(
            F.col("_nd") > F.lit(int(max_distinct)),
            F.raise_error(
                F.concat(
                    F.lit("grouped_percentiles: group "),
                    F.col(group_col).cast("string"),
                    F.lit(
                        f" exceeds max_distinct={max_distinct} distinct"
                        " values — the value column is not a bounded"
                        " grid; use approx_percentile (see"
                        " agg_approx_percentiles) or raise/disable"
                        " max_distinct if the state size is acceptable"
                    ),
                )
            ).cast("double"),
        ).otherwise(v)
    aggs = [F.first("_n").alias("n")]
    # h/k are constant within a group (they depend only on _n): inside
    # the min() arguments they ride each row; in the outer interpolation
    # they are rebuilt from first(_n) so the projection stays aggregate.
    for name, p in ps.items():
        if discrete:
            # nearest-rank (quantile_disc): 1-indexed position
            # ceil(p*n), identical double arithmetic in both engines
            k1 = F.greatest(
                F.lit(1),
                F.ceil(F.col("_n").cast("double") * F.lit(float(p))),
            )
            aggs.append(
                F.min(F.when(F.col("_cum") >= k1, v)).alias(name)
            )
            continue
        h = (F.col("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        k = F.floor(h)
        lower = F.min(F.when(F.col("_cum") >= k + 1, v))
        upper = F.min(F.when(F.col("_cum") >= k + 2, v))
        h_g = (F.first("_n") - F.lit(1)).cast("double") * F.lit(float(p))
        frac = h_g - F.floor(h_g)
        aggs.append(
            (lower + frac * (F.coalesce(upper, lower) - lower))
            .alias(name)
        )
    return vc.groupBy(group_col).agg(*aggs)


def corpus_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """CORPUS census — the know-your-data statistics every pretraining
    report tabulates (token totals, vocabulary size, hapax share —
    Heaps'/Zipf's-law checkpoints): one row with

      n_docs      docs contributing ≥ 1 token (NULL/empty-text docs
                  do not count),
      n_tokens    total whitespace tokens (lowercased),
      vocab       distinct token types,
      n_hapax     types occurring exactly once (the Zipf tail whose
                  share predicts vocabulary growth),
      ttr         type-token ratio, 6 dp,
      top_term / top_term_n   the modal token (count DESC, term ASC
                  tie-break — deterministic cross-engine).

    One token explode feeds a per-type count (map-side combined) and a
    one-row corpus total; the three one-row frames meet in broadcast
    cross-joins. At 100 TB: one shuffle of (token, partial count)
    pairs — the canonical wordcount — plus scalars; nothing collects,
    nothing is quadratic."""
    toks = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .where(F.length("w") > 0)
    )
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = toks.agg(
        F.count_distinct("_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    types = wc.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    top = (
        wc.orderBy(F.desc("c"), "w")
        .limit(1)
        .select(F.col("w").alias("top_term"), F.col("c").alias("top_term_n"))
    )
    return (
        totals.crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(top))
        .select(
            "n_docs",
            "n_tokens",
            "vocab",
            F.col("n_hapax").cast("long").alias("n_hapax"),
            F.round(
                F.col("vocab").cast("double") / F.col("n_tokens"), 6
            ).alias("ttr"),
            "top_term",
            "top_term_n",
        )
    )
