"""Schema-conform operator: the reference's defensive schema repair,
implemented once, declaratively.

Reference semantics reproduced (SURVEY.md §1.3 / §2.2 P2-P5):

- rename map (``"Stock Splits"`` → ``Stock_Splits``,
  ``TransForm_Load_Yfinance.py:194-195``)
- add missing expected columns with typed defaults (``:198-202``)
- NaN/null → default repair with cast (``:204-208``)
- required-column validation with hard failure
  (``idx_transformation_load_script.py:346-350``)
- not-null filter on key columns after cast
  (``dag_transform_load_yfinance_fixed.py:201-205``)

Everything is a column expression — no UDFs — so Catalyst keeps
whole-stage codegen and column pruning across the repair.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FLOATING = (T.DoubleType, T.FloatType)


@dataclass(frozen=True)
class ConformSpec:
    """Declarative description of a conforming repair."""

    renames: dict[str, str] = field(default_factory=dict)
    # column -> (spark type, default). Missing columns are added with the
    # default; present columns are null/NaN-repaired and cast.
    columns: dict[str, tuple[T.DataType, object]] = field(default_factory=dict)
    required: tuple[str, ...] = ()
    drop_null_keys: tuple[str, ...] = ()


class MissingRequiredColumns(ValueError):
    pass


def _repaired(
    col: Column, src_type: T.DataType, dtype: T.DataType, default: object
) -> Column:
    """Cast first, then repair, so values that *fail* the cast (e.g. the
    string ``"abc"`` headed for DoubleType) also receive the typed
    default — the reference guarantees missing/NaN/null → default
    (``TransForm_Load_Yfinance.py:204-208``) and a cast-induced null is
    exactly the "missing" case.

    NaN handling is gated on where a NaN can actually exist:

    - floating *target*: the casted value can be NaN (including a
      string ``"NaN"`` cast to double) → check ``isnan(casted)``;
    - floating *source* with a non-floating target (the reference's
      Volume: double→long): NaN must be caught on the source column,
      because Spark silently casts NaN to 0 for integral targets.
    """
    # try_cast, not cast: under ANSI mode (Spark 4 default) a failed
    # cast throws; the conform contract is "unparseable → default".
    casted = col.try_cast(dtype)
    cond = F.isnull(casted)
    if isinstance(dtype, _FLOATING):
        cond = cond | F.isnan(casted.cast("double"))
    elif isinstance(src_type, _FLOATING):
        cond = cond | F.isnan(col)
    return F.when(cond, F.lit(default)).otherwise(casted).cast(dtype)


def conform_schema(df: DataFrame, spec: ConformSpec) -> DataFrame:
    """Apply renames, defaults, null/NaN repair, casts and key filters."""
    for old, new in spec.renames.items():
        if old in df.columns:
            if new in df.columns and new != old:
                # Rename target already present (e.g. input carries both
                # "Stock Splits" and "Stock_Splits"): keep the existing
                # target, drop the source, instead of creating duplicate
                # column names that poison later selects.
                df = df.drop(old)
            else:
                df = df.withColumnRenamed(old, new)

    missing_required = [c for c in spec.required if c not in df.columns]
    if missing_required:
        raise MissingRequiredColumns(
            f"missing required columns: {missing_required}; have {df.columns}"
        )

    src_types = {f.name: f.dataType for f in df.schema.fields}
    exprs: list[Column] = []
    seen = set()
    for name in df.columns:
        if name in spec.columns:
            dtype, default = spec.columns[name]
            exprs.append(
                _repaired(F.col(name), src_types[name], dtype, default).alias(name)
            )
        else:
            exprs.append(F.col(name))
        seen.add(name)
    for name, (dtype, default) in spec.columns.items():
        if name not in seen:
            exprs.append(F.lit(default).cast(dtype).alias(name))
    out = df.select(*exprs)

    for key in spec.drop_null_keys:
        # drop_null_keys is not `required`: a key column absent from the
        # input is legal, and there is nothing to filter on.
        if key in out.columns:
            out = out.filter(F.col(key).isNotNull())
    return out
