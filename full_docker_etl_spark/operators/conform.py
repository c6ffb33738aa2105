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


def _repaired(col: Column, dtype: T.DataType, default: object) -> Column:
    cond = F.isnull(col)
    if isinstance(dtype, _FLOATING):
        cond = cond | F.isnan(col.cast("double"))
    return F.when(cond, F.lit(default)).otherwise(col).cast(dtype)


def conform_schema(df: DataFrame, spec: ConformSpec) -> DataFrame:
    """Apply renames, defaults, null/NaN repair, casts and key filters."""
    for old, new in spec.renames.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)

    missing_required = [c for c in spec.required if c not in df.columns]
    if missing_required:
        raise MissingRequiredColumns(
            f"missing required columns: {missing_required}; have {df.columns}"
        )

    exprs: list[Column] = []
    seen = set()
    for name in df.columns:
        if name in spec.columns:
            dtype, default = spec.columns[name]
            exprs.append(_repaired(F.col(name), dtype, default).alias(name))
        else:
            exprs.append(F.col(name))
        seen.add(name)
    for name, (dtype, default) in spec.columns.items():
        if name not in seen:
            exprs.append(F.lit(default).cast(dtype).alias(name))
    out = df.select(*exprs)

    for key in spec.drop_null_keys:
        out = out.filter(F.col(key).isNotNull())
    return out
