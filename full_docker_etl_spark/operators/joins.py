"""Join operators (SURVEY.md §2.3 J1-J4).

The reference has NO explicit joins — it smuggles master-data in as
literals while looping over per-company collections
(``TransForm_Load_Yfinance.py:223-224,395-410``), probes existence row
by row (``extract_iqplus_news_dag.py:144``), and hands off id-lists in
pickle files (``TransForm_Load_Yfinance.py:432-434``). Each of those
becomes a real distributed join here:

- J1 → :func:`broadcast_enrich`: broadcast hash join of small master
  dims onto the fact table. At 100 TB the fact side never shuffles —
  the dim ships to every executor instead.
- J2 → :func:`anti_probe`: left-anti join (insert-if-absent dedup
  probe) — one pass, no per-row find_one.
- J3 → :func:`semi_manifest`: left-semi join against a manifest of
  processed keys.
- J4 → plain equi-join; Catalyst/AQE picks broadcast vs sort-merge and
  splits skewed partitions (skew-join handling is on in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """J1: enrich a fact table with a small dimension via an explicit
    broadcast hint. Replaces the reference's per-entity literal smuggle:
    the dim rides to executors, the fact table stays put (no shuffle)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def anti_probe(new: DataFrame, existing: DataFrame, on) -> DataFrame:
    """J2: rows of ``new`` whose key is NOT in ``existing`` — the
    insert-if-absent probe (``find_one`` per row in the reference) as a
    single left-anti join."""
    return new.join(existing, on=on, how="left_anti")


def semi_manifest(df: DataFrame, manifest: DataFrame, on) -> DataFrame:
    """J3: keep rows whose key appears in the manifest (the reference's
    pickle-file id-list handoff) as a left-semi join — the manifest is
    typically tiny, so hint broadcast."""
    return df.join(F.broadcast(manifest), on=on, how="left_semi")
