"""File-based sources (SURVEY.md §2.1 S1-S5): CSV master tables,
binary landing directories, ZIP→XML extraction.

Reference → here:

- S1/S2: stock-master CSV/XLSX (``extractyfinance.py:99-104``,
  ``YFinanceController.php:17-54``) → :func:`read_csv` with an
  EXPLICIT schema — schema inference is a second full scan at 100 TB
  and type drift is silent; the XLSX variant is the same table, so one
  schema serves both.
- S4: scrape landing directory → :func:`read_binary_dir`
  (``binaryFile`` source: path, modificationTime, length, content).
- S5: ZIP→XML extraction (``idx_extraction_script.py:234-302``) →
  :func:`extract_zip_xml` as mapInPandas over the binary content:
  path-traversal guard, ``instance*.xml|.xbrl`` selection
  (largest first), utf-8 → latin-1 fallback decode. Distributed: each
  executor unzips its own partition of files; the driver never touches
  payload bytes.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# FIXTURES.md §1 — the stock-master shape shared by the CSV (2 cols)
# and XLSX (5 cols) variants; extra columns simply stay null.
STOCK_MASTER_SCHEMA = T.StructType(
    [
        T.StructField("kode", T.StringType(), False),
        T.StructField("nama_perusahaan", T.StringType()),
        T.StructField("tanggal_pencatatan", T.DateType()),
        T.StructField("saham", T.LongType()),
        T.StructField("papan_pencatatan", T.StringType()),
    ]
)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """S1: CSV scan with explicit schema (never inferred) — malformed
    rows go to NULL columns (PERMISSIVE), matching the reference's
    defensive posture."""
    return (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .schema(schema)
        .csv(path)
    )


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.zip",
    files_per_partition: int | None = 16,
) -> DataFrame:
    """S4: a landing directory of scraped artifacts as (path, length,
    content) rows.

    Partitioning: Spark's file source splits the listing up to
    ``defaultParallelism`` even when the bytes fit one partition, so a
    64-file fixture lands on 32 partitions — and every downstream
    Python stage then forks a worker per partition (two per partition
    when stages chain), which dominates wall time for small landings.
    Bounding partitions to ``ceil(n_files / files_per_partition)``
    amortizes worker startup over a meaningful batch of archives while
    still yielding thousands of tasks at real scrape scale (100k+
    archives). Pass ``None`` to keep Spark's own splitting."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    if files_per_partition:
        n_files = len(df.inputFiles())
        n_parts = max(1, -(-n_files // files_per_partition))
        df = df.coalesce(n_parts)
    return df


ZIP_XML_SCHEMA = T.StructType(
    [
        T.StructField("source_path", T.StringType()),
        T.StructField("entry_name", T.StringType()),
        T.StructField("xml", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def _pick_instance(names: list[str]) -> str | None:
    """instance*.xml/.xbrl preferred; '.. '-style traversal names are
    refused outright (``idx_extraction_script.py:244-252`` guard)."""
    safe = [
        n
        for n in names
        if not n.startswith("/") and ".." not in n.split("/")
    ]
    instances = [
        n
        for n in safe
        if n.lower().endswith((".xml", ".xbrl"))
        and n.split("/")[-1].lower().startswith("instance")
    ]
    if instances:
        return instances[0]
    xmls = [n for n in safe if n.lower().endswith((".xml", ".xbrl"))]
    return xmls[0] if xmls else None


def _decode(raw: bytes) -> str:
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_zip_xml(binaries: DataFrame) -> DataFrame:
    """S5: per-file in-memory unzip → one XML string row per archive.
    Input: a binaryFile frame (``path``, ``content``). Bad archives
    yield an ``error`` row instead of failing the job (the reference
    logs and skips, ``idx_extraction_script.py:296-302``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source_path": [], "entry_name": [], "xml": [], "error": []}
            for path, content in zip(pdf["path"], pdf["content"]):
                name = xml = err = None
                try:
                    with zipfile.ZipFile(io.BytesIO(content)) as zf:
                        names = zf.namelist()
                        # largest instance candidate first, like the
                        # reference's size-sorted pick (:269-275)
                        infos = {i.filename: i.file_size for i in zf.infolist()}
                        cands = sorted(
                            [n for n in names if _pick_instance([n])],
                            key=lambda n: -infos.get(n, 0),
                        )
                        name = _pick_instance(cands) if cands else None
                        if name:
                            xml = _decode(zf.read(name))
                        else:
                            err = "no xml entry"
                except Exception as exc:  # corrupt zip → error row
                    err = f"{type(exc).__name__}: {exc}"
                out["source_path"].append(path)
                out["entry_name"].append(name)
                out["xml"].append(xml)
                out["error"].append(err)
            yield pd.DataFrame(out)

    return binaries.select("path", "content").mapInPandas(run, ZIP_XML_SCHEMA)
