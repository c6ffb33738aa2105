"""File-based sources (SURVEY.md §2.1 S1-S5): CSV master tables,
binary landing directories, ZIP→XML extraction.

Reference → here:

- S1/S2: stock-master CSV/XLSX (``extractyfinance.py:99-104``,
  ``YFinanceController.php:17-54``) → :func:`read_csv` with an
  EXPLICIT schema — schema inference is a second full scan at 100 TB
  and type drift is silent — and :func:`read_xlsx` +
  :func:`emiten_from_xlsx`, a real distributed SpreadsheetML parse
  (stdlib zip+XML inside mapInPandas; no external codec needed).
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


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """JSONL (one JSON object per line) scan with an EXPLICIT schema —
    the standard landing format for crawl dumps and LLM training
    corpora. Never schema-inferred: inference is a full extra pass
    over the data (at 100 TB, a second 100 TB read before the first
    useful byte). JSON lines split cleanly on newlines, so the scan
    parallelizes per HDFS block exactly like CSV.

    PERMISSIVE mode with a named corrupt-record column: a malformed
    line lands intact in ``corrupt_col`` (its other fields NULL)
    instead of killing the job or silently vanishing — at crawl scale
    some fraction of lines is ALWAYS broken, and dropping them
    silently biases the corpus while failing hard wastes the whole
    pass. Callers split on ``corrupt_col IS NULL`` and route the bad
    lines to a quarantine sink."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .json(path)
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


# ------------------------------------------------------------- XLSX (S2)
#
# The container ships no xlsx codec, but XLSX is just a zip of
# SpreadsheetML parts — stdlib zipfile + ElementTree cover the
# reference's whole usage (one master sheet of strings and numbers,
# ``YFinanceController.php:17-54``). The parse runs INSIDE mapInPandas
# over a binaryFile scan, so a directory of workbooks distributes
# per-file across executors; the driver never touches payload bytes.

XLSX_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("row_num", T.IntegerType()),
        T.StructField("cells", T.ArrayType(T.StringType())),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int | None:
    """'BC23' → 54 (0-based). None when the cell carries no ref."""
    letters = "".join(ch for ch in ref if ch.isalpha())
    if not letters:
        return None
    i = 0
    for ch in letters.upper():
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def _xlsx_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    from xml.etree import ElementTree as ET

    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root:
        if _local(si.tag) != "si":
            continue
        # plain <t> or rich-text runs <r><t> — concatenate all <t>
        out.append(
            "".join(t.text or "" for t in si.iter() if _local(t.tag) == "t")
        )
    return out


def _xlsx_first_sheet(zf: zipfile.ZipFile) -> str | None:
    """The workbook's first sheet BY TAB ORDER: workbook.xml's first
    <sheet> r:id resolved through workbook.xml.rels. Sheet FILES keep
    their original names when tabs are deleted/reordered, so
    'lowest-numbered sheetN.xml' can silently pick a stale leftover —
    that numeric sort is only the fallback for workbooks missing the
    metadata parts."""
    import re as _re
    from xml.etree import ElementTree as ET

    names = zf.namelist()
    try:
        rels_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        targets = {
            r.get("Id"): r.get("Target")
            for r in rels_root
            if _local(r.tag) == "Relationship"
            # only WORKSHEET relationships: the first tab can be a
            # chartsheet, whose part holds no rows — resolving it
            # would silently yield an empty scan
            and (r.get("Type") or "").endswith("/worksheet")
        }
        wb_root = ET.fromstring(zf.read("xl/workbook.xml"))
        for el in wb_root.iter():
            if _local(el.tag) != "sheet":
                continue
            rid = next(
                (v for k, v in el.attrib.items() if k.rsplit("}", 1)[-1] == "id"),
                None,
            )
            target = targets.get(rid)
            if target:
                target = target.lstrip("/")
                cand = target if target.startswith("xl/") else f"xl/{target}"
                if cand in names and "/worksheets/" in cand:
                    return cand
            # keep scanning: a chartsheet first tab falls through to
            # the first WORKSHEET tab instead of returning None
    except (KeyError, ET.ParseError):
        pass
    sheets = sorted(
        (n for n in names if _re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(_re.search(r"(\d+)", n).group(1)),
    )
    return sheets[0] if sheets else None


def _xlsx_parse_rows(blob: bytes) -> list[tuple[int, list[str]]]:
    """All rows of the workbook's first sheet (tab order — see
    :func:`_xlsx_first_sheet`) as (row_num, cells); cells are trimmed
    strings (reference trims every cell), gaps read as ''. Cell types:
    shared strings (t=s), inline strings (t=inlineStr), booleans
    (t=b), raw numeric/str otherwise."""
    from xml.etree import ElementTree as ET

    zf = zipfile.ZipFile(io.BytesIO(blob))
    sheet = _xlsx_first_sheet(zf)
    if sheet is None:
        return []
    shared = _xlsx_shared_strings(zf)
    root = ET.fromstring(zf.read(sheet))
    rows: list[tuple[int, list[str]]] = []
    for row in root.iter():
        if _local(row.tag) != "row":
            continue
        rnum = int(row.get("r", str(len(rows) + 1)))
        cells: dict[int, str] = {}
        pos = -1
        for c in row:
            if _local(c.tag) != "c":
                continue
            ci = _col_index(c.get("r", ""))
            pos = pos + 1 if ci is None else ci
            t = c.get("t", "n")
            if t == "inlineStr":
                val = "".join(
                    tt.text or "" for tt in c.iter() if _local(tt.tag) == "t"
                )
            else:
                v = next((ch for ch in c if _local(ch.tag) == "v"), None)
                raw = (v.text or "") if v is not None else ""
                if t == "s":
                    try:
                        idx = int(raw)
                        # a malformed negative index must NOT wrap to
                        # the end of the shared-string table (Python
                        # negative indexing) — that is a silently wrong
                        # cell value, not a recoverable one
                        val = shared[idx] if idx >= 0 else ""
                    except (ValueError, IndexError):
                        val = ""
                elif t == "b":
                    val = "TRUE" if raw.strip() == "1" else "FALSE"
                else:
                    val = raw
            cells[pos] = val.strip()
        # width from the last NON-EMPTY cell: a formatting-artifact
        # empty cell at Excel's far right (XFD — whole-row styling
        # leaves these) would otherwise pad the row to 16384 ''-entries
        # shipped through Arrow for every such row
        width = max((i for i, v in cells.items() if v != ""), default=-1) + 1
        rows.append((rnum, [cells.get(i, "") for i in range(width)]))
    return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    glob: str = "*.xlsx",
    files_per_partition: int | None = 16,
) -> DataFrame:
    """S2: distributed XLSX scan → (path, row_num, cells array<string>)
    — one row per sheet row of each workbook's first sheet. Built on
    the binaryFile source + an Arrow mapInPandas stdlib parse (master
    workbooks are small; what scales is the NUMBER of files, and the
    file list is what Spark partitions). Corrupt workbooks raise —
    master-table ingestion must be loud, unlike the scrape landing
    path where bad archives are expected."""
    bins = read_binary_dir(spark, path, glob=glob,
                           files_per_partition=files_per_partition)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "row_num": [], "cells": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                for rnum, cells in _xlsx_parse_rows(bytes(content)):
                    out["path"].append(p)
                    out["row_num"].append(rnum)
                    out["cells"].append(cells)
            yield pd.DataFrame(out)

    return bins.select("path", "content").mapInPandas(run, XLSX_ROWS_SCHEMA)


def emiten_from_xlsx(rows: DataFrame) -> DataFrame:
    """The reference's emiten-master row semantics
    (``YFinanceController.php:17-54``) over :func:`read_xlsx` output:
    skip the header row, positional columns B..F → the
    STOCK_MASTER_SCHEMA columns, every cell trimmed (done at parse),
    keep only rows with ≥3 cells and non-empty Kode + Nama. Cells are
    read with ``get`` (0-based, NULL past the end — rows with only 3-5
    cells are legal; ``element_at`` would THROW under ANSI), and share
    counts arrive as display strings so try_cast keeps bad cells NULL
    instead of failing the scan.

    Dates handle BOTH storage forms real workbooks use: a date-styled
    cell is stored as a bare NUMERIC SERIAL (1900-epoch days: anchor
    1899-12-30 for serials >= 61, 1899-12-31 for serials < 60 —
    Excel's phantom 1900-02-29 occupies serial 60, which maps to NULL
    like any other unparseable cell), which try_cast('date') would
    silently null; a text-formatted cell arrives as a display string.
    A bare-integer cell is therefore read as a serial, anything else
    falls through to the string date parse."""
    from pyspark.sql import functions as F

    def cell(i: int):
        return F.get("cells", i)

    def nonempty(col):
        return col.isNotNull() & (col != F.lit(""))

    def excel_date(col):
        # Excel's maximum valid serial is 2958465 (9999-12-31); larger
        # bare integers are garbage and must NULL like any other
        # unparseable cell, not map to a far-future date beyond Spark's
        # own DateType range.
        serial = F.when(col.rlike(r"^\d{1,7}$"), col).try_cast("int")
        serial = F.when(serial <= 2958465, serial)
        # The 1899-12-30 anchor bakes in Excel's phantom 1900-02-29
        # (serial 60), which is only correct for serials >= 61.
        # Serials 1-59 (dates before 1900-03-01) anchor at 1899-12-31,
        # and serial 60 itself names a nonexistent date — NULL, the
        # same treatment try_cast gives any other unparseable cell.
        return (
            F.when(
                serial >= 61,
                F.date_add(F.to_date(F.lit("1899-12-30")), serial),
            )
            .when(
                (serial >= 1) & (serial != 60),
                F.date_add(F.to_date(F.lit("1899-12-31")), serial),
            )
            # serials 60 (phantom 1900-02-29) and 0 (Excel's '1900-01-00',
            # an empty date coerced to a number) name nonexistent dates
            .when(serial.isNotNull(), F.lit(None).cast("date"))
            .otherwise(col.try_cast("date"))
        )

    return (
        rows.where(F.col("row_num") > 1)
        .where(F.size("cells") >= 3)
        .where(nonempty(cell(1)) & nonempty(cell(2)))
        .select(
            cell(1).alias("kode"),
            cell(2).alias("nama_perusahaan"),
            excel_date(cell(3)).alias("tanggal_pencatatan"),
            cell(4).try_cast("bigint").alias("saham"),
            F.when(nonempty(cell(5)), cell(5)).alias("papan_pencatatan"),
        )
    )
