"""Deterministic sampling / split assignment for training-data
pipelines.

Both operators are pure row-local or single-window transforms chosen
for reproducibility ACROSS ENGINES and across retries — no RNG state,
no `rand()` (which breaks task retry determinism):

- :func:`hash_split` — stable train/val/test assignment from the hex
  prefix of md5(key). A document's split never changes as the corpus
  grows (property of hashing the key, not the position), which is the
  invariant training pipelines need for leak-free evaluation sets.
- :func:`quota_per_group` — cap rows per group (per-source /
  per-domain quotas, the standard pretraining rebalance) with a
  deterministic keep-order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hex-prefix bands: 12/16 = 75% train, 2/16 = 12.5% val, 2/16 test
_TRAIN_MAX = "b"
_VAL_SET = ("c", "d")


def hash_split(df: DataFrame, key_col: str, out_col: str = "split") -> DataFrame:
    """Assign train (75%) / val (12.5%) / test (12.5%) from the first
    hex digit of md5(key): '0'-'b' → train, 'c'-'d' → val, 'e'-'f' →
    test. String-range logic only, so any engine that can md5 agrees
    bit-for-bit — no hex→int conversion, no RNG."""
    h1 = F.substring(F.md5(F.col(key_col).cast("string")), 1, 1)
    split = (
        F.when(h1 <= F.lit(_TRAIN_MAX), F.lit("train"))
        .when(h1.isin(*_VAL_SET), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def quota_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[tuple[str, bool]],
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` rows per group, deterministically (the
    explicit ``order`` + unique tie-break the caller supplies). One
    shuffle on the group key; per-group state is the quota counter —
    skew-safe because a hot group still emits only ``quota`` rows."""
    w = Window.partitionBy(*group_cols).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= quota)
        .drop("__rn")
    )


def pack_chunks(
    chunks: DataFrame,
    shard_col,
    order: list[tuple[str, bool]],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Pack chunks into training sequences of ~``budget`` tokens,
    in-order within shards (first-fit-in-order: a chunk joins the
    sequence its running token count falls into, so a sequence can
    overflow by at most one chunk — the standard streaming-packing
    approximation).

    Scale shape: packing is inherently sequential, so it is SHARDED —
    the running sum windows over ``shard_col``, never globally; each
    shard packs independently and in parallel. Returns the input plus
    (seq_id) = (shard, bin)."""
    w = Window.partitionBy(shard_col).orderBy(
        *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order]
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col(token_col)).over(w)
    bin_ = F.floor((cum - F.col(token_col)) / F.lit(budget))
    return chunks.withColumn("seq_bin", bin_.cast("long"))
