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

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


_NANO_CACHE: dict[str, list[str]] = {}


def _nano_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL). Detected from the footer of
    one file so the fix is generic, not a per-table hardcode. Cached per
    path — footers are immutable for the testdata and re-probing costs
    a pyarrow read per load."""
    if path in _NANO_CACHE:
        return _NANO_CACHE[path]
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq
    except ImportError:  # engine still works for non-nanos data
        return []
    candidates = [path] if os.path.isfile(path) else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    if not candidates:
        return []
    schema = pq.read_schema(candidates[0])
    out = [
        name
        for name, typ in zip(schema.names, schema.types)
        if typ == pa.timestamp("ns")
    ]
    _NANO_CACHE[path] = out
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one Parquet table. Columnar scan → Catalyst gets predicate
    pushdown + column pruning for free (SURVEY.md §4.1).

    TIMESTAMP(NANOS) columns (e.g. the testdata ``events.ts``) are
    illegal to Spark's parquet reader; we read them as raw nanos longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild proper
    timestamps at microsecond precision — the same truncation DuckDB's
    ``epoch_us`` applies, so oracle comparisons agree.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos = _nano_timestamp_columns(path)
    if not nanos:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


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
    """S15: collection/namespace listing → catalog listing. SHOW TABLES
    is one JVM round trip; ``spark.catalog.listTables()`` resolves each
    view's schema individually (a py4j call per table)."""
    return [r.tableName for r in spark.sql("SHOW TABLES").collect()]
