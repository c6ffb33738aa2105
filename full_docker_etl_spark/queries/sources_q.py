"""Registered queries for file/REST sources (S1-S5): CSV round trip
with explicit schema, binary landing dir + ZIP→XML extraction feeding
the XBRL parser, and the distributed rate-limited fetch."""

from __future__ import annotations

import io
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from full_docker_etl_spark.operators.xbrl import financial_metrics, with_parsed_xbrl
from full_docker_etl_spark.registry import query
from full_docker_etl_spark.sources.catalog import load_table
from full_docker_etl_spark.sources.files import (
    STOCK_MASTER_SCHEMA,
    extract_zip_xml,
    read_binary_dir,
    read_csv,
    read_jsonl,
)
from full_docker_etl_spark.sources.rest import SyntheticFetcher, fetch_ohlcv


@query(
    "csv_scan",
    oracle="""
      SELECT 'C' || CAST(c_custkey AS VARCHAR) AS kode,
             c_name AS nama_perusahaan,
             c_mktsegment AS papan_pencatatan
      FROM customer WHERE c_custkey < 200
    """,
)
def csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2: stock-master CSV scan with an EXPLICIT schema (no
    inference pass), via a write→read round trip (the testdata ships no
    CSV). Missing schema columns surface as NULL, reference posture."""
    # NB: an explicit CSV schema binds by POSITION, not header name —
    # the file must carry every schema column in order (absent middle
    # columns are written empty, read back as NULL).
    master = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(
            F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("kode"),
            F.col("c_name").alias("nama_perusahaan"),
            F.lit(None).cast("date").alias("tanggal_pencatatan"),
            F.lit(None).cast("long").alias("saham"),
            F.col("c_mktsegment").alias("papan_pencatatan"),
        )
    )
    path = tempfile.mkdtemp(prefix="fde_csv_") + "/master"
    master.write.mode("overwrite").option("header", True).csv(path)
    back = read_csv(spark, path, STOCK_MASTER_SCHEMA)
    return back.select("kode", "nama_perusahaan", "papan_pencatatan")


_JSONL_BAD_LINES = ('{"doc_id": oops}', "not json at all")


@query(
    "jsonl_scan",
    oracle=f"""
      SELECT doc_id, lang, source,
             CAST(length(text) AS INTEGER) AS n_chars,
             FALSE AS is_corrupt,
             CAST(NULL AS VARCHAR) AS corrupt_payload
      FROM documents WHERE doc_id < 2000
      UNION ALL
      SELECT NULL, NULL, NULL, NULL, TRUE, '{_JSONL_BAD_LINES[0].replace("'", "''")}'
      UNION ALL
      SELECT NULL, NULL, NULL, NULL, TRUE, '{_JSONL_BAD_LINES[1]}'
    """,
)
def jsonl_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL crawl-dump ingestion (sources/files.py read_jsonl): a
    write→read round trip of the documents table as JSON lines (the
    testdata ships no JSONL) PLUS two planted malformed lines. The
    scan uses an explicit schema (no inference pass) and PERMISSIVE
    corrupt-record capture, so every broken line surfaces as a
    quarantine row (``is_corrupt``, original payload preserved) while
    good lines parse fully — both routes value-checked by the oracle.
    The fixture write and the scan are both distributed; the corrupt
    lines ride a 2-row text append, not a driver loop. Like every
    ingestion fixture the written volume is CAPPED (doc_id < 2000 —
    the full sf0.01 driver corpus): the parse/quarantine semantics
    under test don't get more interesting with more identical lines,
    the round trip just gets slower."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 2000)
        .select("doc_id", "text", "lang", "source")
    )
    path = tempfile.mkdtemp(prefix="fde_jsonl_") + "/dump"
    docs.write.mode("overwrite").json(path)
    # JVM-side VALUES, not createDataFrame: a Python local-collection
    # scan spawns a Python worker for its first action (~seconds of
    # fixed cost for 2 rows)
    bad_values = ", ".join(
        "('" + line.replace("'", "''") + "')" for line in _JSONL_BAD_LINES
    )
    spark.sql(f"SELECT value FROM VALUES {bad_values} AS t(value)").coalesce(
        1
    ).write.mode("append").text(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
        ]
    )
    back = read_jsonl(spark, path, schema)
    return back.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars"),
        F.col("_corrupt").isNotNull().alias("is_corrupt"),
        F.col("_corrupt").alias("corrupt_payload"),
    )


def _make_zip_landing(spark: SparkSession, sf_dir: str) -> str:
    """Build a landing dir of XBRL instance zips from supplier rows.
    Driver-side file creation is an ingestion FIXTURE, so it is capped:
    the distributed part under test (binaryFile scan → per-executor
    unzip → parse) doesn't get more interesting with more tiny files,
    it just serializes the driver."""
    rows = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_acctbal")
        .orderBy("s_suppkey")
        .limit(64)
        .collect()
    )
    d = tempfile.mkdtemp(prefix="fde_zips_")
    for r in rows:
        xml = (
            '<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance" '
            'xmlns:idx-cor="http://www.idx.co.id/xbrl/taxonomy/2014-04-30/cor">'
            f'<idx-cor:Equity contextRef="CurrentYearInstant">{r.s_acctbal}'
            "</idx-cor:Equity>"
            f'<idx-cor:Liabilities contextRef="CurrentYearInstant">{r.s_acctbal * 2}'
            "</idx-cor:Liabilities></xbrli:xbrl>"
        )
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("readme.txt", "ignore me")
            zf.writestr("instance_report.xml", xml)
        with open(os.path.join(d, f"report_{r.s_suppkey}.zip"), "wb") as f:
            f.write(buf.getvalue())
    return d


@query(
    "zip_xml_ingest",
    oracle="""
      WITH s AS (SELECT s_suppkey, s_acctbal FROM supplier
                 ORDER BY s_suppkey LIMIT 64),
      m AS (
        SELECT CAST(s_suppkey AS VARCHAR) AS company_code,
               '2024' AS year, 'audit' AS period,
               CAST(NULL AS VARCHAR) AS sector,
               CAST(0.0 AS DOUBLE) AS revenue,
               CAST(0.0 AS DOUBLE) AS cost_of_revenue,
               CAST(0.0 AS DOUBLE) AS gross_profit,
               CAST(0.0 AS DOUBLE) AS net_profit_loss,
               CAST(0.0 AS DOUBLE) AS total_assets,
               s_acctbal * 2 AS total_liabilities,
               s_acctbal AS total_equity
        FROM s
      )
      SELECT company_code, year, period, sector,
             revenue, cost_of_revenue, gross_profit, net_profit_loss,
             total_assets, total_liabilities, total_equity,
             CASE WHEN total_equity <> 0
                  THEN total_liabilities / total_equity END
               AS debt_to_equity_ratio,
             (CASE WHEN revenue < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(revenue) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(revenue) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS revenue_rupiah,
             (CASE WHEN cost_of_revenue < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(cost_of_revenue) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(cost_of_revenue) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS cost_of_revenue_rupiah,
             (CASE WHEN gross_profit < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(gross_profit) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(gross_profit) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS gross_profit_rupiah,
             (CASE WHEN net_profit_loss < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(net_profit_loss) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(net_profit_loss) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS net_profit_loss_rupiah,
             (CASE WHEN total_assets < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_assets) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_assets) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_assets_rupiah,
             (CASE WHEN total_liabilities < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_liabilities) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_liabilities) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_liabilities_rupiah,
             (CASE WHEN total_equity < 0 THEN 'Rp -' ELSE 'Rp ' END)
               || replace(format('{:,}', CAST(round(abs(total_equity) * 100) AS BIGINT) // 100), ',', '.')
               || ',' || lpad(CAST(CAST(round(abs(total_equity) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0') AS total_equity_rupiah
      FROM m
    """,
)
def zip_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5+D1: binaryFile landing dir → distributed in-memory unzip
    (instance*.xml selection, traversal guard, encoding fallback) →
    XBRL parse → metrics. The reference's Selenium download loop ends
    at the same landing-dir boundary. ORACLE-checked: the fixture
    derives every metric from supplier rows in closed form, so DuckDB
    re-derives the full output — binary scan, in-executor unzip, XML
    parse, metrics, and Rupiah strings are all value-verified; unzip
    edge cases additionally pinned in tests/test_sources.py."""
    landing = _make_zip_landing(spark, sf_dir)
    binaries = read_binary_dir(spark, landing, glob="*.zip")
    xmls = extract_zip_xml(binaries)
    reports = xmls.where(F.col("xml").isNotNull()).select(
        F.regexp_extract(F.col("source_path"), r"report_(\d+)\.zip", 1).alias(
            "company_code"
        ),
        F.lit("2024").alias("year"),
        F.lit("audit").alias("period"),
        F.col("xml").alias("data"),
    )
    return financial_metrics(with_parsed_xbrl(reports, "data"))


@query(
    "rest_batch_fetch",
    oracle="""
      WITH syms AS (SELECT 'SYM' || CAST(s_suppkey AS VARCHAR) AS symbol
                    FROM supplier),
      seeds AS (SELECT symbol,
                       list_sum(list_transform(range(1, length(symbol) + 1),
                                i -> ascii(symbol[i]) * i)) % 997 AS seed
                FROM syms),
      days AS (SELECT symbol, seed, unnest(range(0, 30)) AS d FROM seeds)
      SELECT symbol,
             COUNT(*) AS n_days,
             CAST('2024-01-01' AS DATE) AS first_day,
             CAST('2024-01-30' AS DATE) AS last_day,
             CAST(SUM(10000 + (seed * 31 + d * 17) % 5000) AS BIGINT)
               AS total_volume
      FROM days GROUP BY symbol
    """,
)
def rest_batch_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the per-ticker REST fetch as a DISTRIBUTED mapInPandas over
    the symbol table (deterministic synthetic fetcher in-container; a
    real yfinance callable drops in unchanged). The reference fetches
    951 tickers sequentially at ~10 s each — here lanes run in
    parallel with the politeness pause kept per lane. ORACLE-checked:
    the synthetic fetcher is pure integer arithmetic, so DuckDB
    re-derives every row's volume/date from the symbol alone — the
    whole Python source stage is value-verified, not just counted."""
    symbols = (
        load_table(spark, sf_dir, "supplier")
        .select(F.concat(F.lit("SYM"), F.col("s_suppkey").cast("string")).alias("symbol"))
    )
    ohlcv = fetch_ohlcv(symbols, fetcher_factory=SyntheticFetcher, parallelism=8)
    return ohlcv.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min("trade_date").alias("first_day"),
        F.max("trade_date").alias("last_day"),
        F.sum("volume").alias("total_volume"),
    )


def _xlsx_col_letters(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _xlsx_bytes(rows: list[list[object]]) -> bytes:
    """A minimal real SpreadsheetML workbook: strings go through
    sharedStrings (t="s"), ints inline as numbers, ``None`` cells are
    OMITTED from the row (readers must gap-fill) — the three cell
    shapes the emiten master exercises."""
    from xml.sax.saxutils import escape

    shared: list[str] = []
    sidx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in sidx:
            sidx[s] = len(shared)
            shared.append(s)
        return sidx[s]

    srows = []
    for rn, row in enumerate(rows, start=1):
        cs = []
        for ci, v in enumerate(row):
            if v is None:
                continue
            ref = f"{_xlsx_col_letters(ci)}{rn}"
            if isinstance(v, str):
                cs.append(f'<c r="{ref}" t="s"><v>{sref(v)}</v></c>')
            else:
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
        srows.append(f'<row r="{rn}">{"".join(cs)}</row>')
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8"?><worksheet {ns}>'
        f'<sheetData>{"".join(srows)}</sheetData></worksheet>'
    )
    sst = (
        f'<?xml version="1.0" encoding="UTF-8"?>'
        f'<sst {ns} count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    ct = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<workbook {ns} xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ct)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


_XLSX_HEADER = [
    "No", "Kode", "Nama Perusahaan", "Tanggal Pencatatan", "Saham",
    "Papan Pencatatan",
]


def _make_xlsx_landing(spark: SparkSession, sf_dir: str) -> str:
    """Two emiten-master workbooks from customer rows (bounded fixture,
    same posture as the zip landing): Kode/Nama/Papan as shared
    strings, Saham numeric, Tanggal omitted (gap cell), plus one
    header-shaped junk row per file that the reader must drop."""
    rows = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 150)
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .collect()
    )
    d = tempfile.mkdtemp(prefix="fde_xlsx_")
    half = (len(rows) + 1) // 2
    for fi, chunk in enumerate((rows[:half], rows[half:])):
        data: list[list[object]] = [list(_XLSX_HEADER)]
        for i, r in enumerate(chunk, start=1):
            data.append(
                [i, f"C{r.c_custkey}", r.c_name, None,
                 int(r.c_custkey) * 1000, r.c_mktsegment]
            )
        # a row with an empty Kode — reference drops it (:41-43)
        data.append([len(chunk) + 1, "", "GHOST CORP", None, 1, "Utama"])
        with open(os.path.join(d, f"Daftar_Saham_{fi}.xlsx"), "wb") as f:
            f.write(_xlsx_bytes(data))
    return d


@query(
    "xlsx_scan",
    oracle="""
      SELECT 'C' || CAST(c_custkey AS VARCHAR) AS kode,
             c_name AS nama_perusahaan,
             CAST(NULL AS DATE) AS tanggal_pencatatan,
             c_custkey * 1000 AS saham,
             c_mktsegment AS papan_pencatatan
      FROM customer WHERE c_custkey < 150
    """,
)
def xlsx_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: the emiten-master XLSX path, end to end — binaryFile scan →
    per-executor stdlib SpreadsheetML parse (shared strings, inline
    numbers, gap cells) → the reference's row semantics (header skip,
    positional columns, trim, non-empty Kode+Nama;
    ``YFinanceController.php:17-54``)."""
    from full_docker_etl_spark.sources.files import emiten_from_xlsx, read_xlsx

    landing = _make_xlsx_landing(spark, sf_dir)
    return emiten_from_xlsx(read_xlsx(spark, landing))
