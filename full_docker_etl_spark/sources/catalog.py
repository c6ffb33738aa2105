"""Table catalog over partitioned Parquet.

The reference encodes keys into Mongo namespaces (collection per
company / per (year, period), database per pipeline stage —
``extractyfinance.py:139-141``, ``idx_extraction_script.py:330``).
Here the storage model is *tables*: one Parquet dataset per logical
entity, registered as Spark SQL temp views; what used to be a
collection name becomes a partition/filter column, so Catalyst can
partition-prune instead of the driver looping over namespaces.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# Driver-generated synthetic tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one Parquet table. Columnar scan → Catalyst gets predicate
    pushdown + column pruning for free (SURVEY.md §4.1)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TESTDATA_TABLES,
    suffix: str = "",
) -> dict[str, DataFrame]:
    """Register each table as a temp view (``SELECT ... FROM lineitem``).

    Replaces the reference's ``db.list_collection_names()`` catalog
    surface (``api/app.py:19,30``) with ``spark.catalog.listTables()``.
    """
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(f"{n}{suffix}")
    return dfs


def list_tables(spark: SparkSession) -> list[str]:
    """S15: collection/namespace listing → catalog listing."""
    return [t.name for t in spark.catalog.listTables()]
