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
