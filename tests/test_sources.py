"""Edge-case tests for the file/REST sources: zip traversal guard,
instance-entry selection, encoding fallback, corrupt archives, CSV
explicit-schema behavior, and fetch determinism."""

from __future__ import annotations

import io
import os
import tempfile
import zipfile

from full_docker_etl_spark.sources.files import (
    STOCK_MASTER_SCHEMA,
    _decode,
    _pick_instance,
    extract_zip_xml,
    read_binary_dir,
    read_csv,
)
from full_docker_etl_spark.sources.rest import SyntheticFetcher, fetch_ohlcv


def test_pick_instance_rules():
    assert _pick_instance(["a.txt", "instance_x.xml", "other.xml"]) == "instance_x.xml"
    assert _pick_instance(["report.XBRL"]) == "report.XBRL"
    assert _pick_instance(["../evil.xml", "/abs.xml"]) is None  # traversal guard
    assert _pick_instance(["sub/../x.xml"]) is None
    assert _pick_instance(["notes.txt"]) is None


def test_decode_fallback():
    assert _decode("héllo".encode("utf-8")) == "héllo"
    assert _decode("caf\xe9".encode("latin-1")) == "café"


def _zip_bytes(entries: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in entries.items():
            zf.writestr(name, content)
    return buf.getvalue()


def test_extract_zip_xml_edges(spark):
    d = tempfile.mkdtemp(prefix="zips_")
    cases = {
        "good.zip": _zip_bytes({"instance_a.xml": "<x>1</x>", "junk.txt": "no"}),
        "latin.zip": None,  # built below with latin-1 bytes
        "noxml.zip": _zip_bytes({"only.txt": "t"}),
        "corrupt.zip": b"this is not a zip",
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("instance_l.xml", "caf\xe9 <x>2</x>".encode("latin-1"))
    cases["latin.zip"] = buf.getvalue()
    for name, data in cases.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)

    out = {
        os.path.basename(r.source_path): r
        for r in extract_zip_xml(read_binary_dir(spark, d)).collect()
    }
    assert out["good.zip"].xml == "<x>1</x>"
    assert out["good.zip"].entry_name == "instance_a.xml"
    assert "café" in out["latin.zip"].xml
    assert out["noxml.zip"].error == "no xml entry"
    assert out["noxml.zip"].xml is None
    assert out["corrupt.zip"].error and "zip" in out["corrupt.zip"].error.lower()


def test_csv_explicit_schema_missing_columns(spark):
    d = tempfile.mkdtemp(prefix="csv_") + "/m.csv"
    with open(d, "w") as f:
        f.write("kode,nama_perusahaan\nAALI,Astra Agro\nBBCA,Bank BCA\n")
    df = read_csv(spark, d, STOCK_MASTER_SCHEMA)
    rows = {r.kode: r for r in df.collect()}
    assert rows["AALI"].nama_perusahaan == "Astra Agro"
    assert rows["AALI"].saham is None  # absent column -> NULL, no error
    assert df.schema["saham"].dataType.typeName() == "long"


def test_fetch_is_deterministic_and_distributed(spark):
    symbols = spark.createDataFrame([("AAA",), ("BBB",)], "symbol string")
    a = fetch_ohlcv(symbols, parallelism=2).collect()
    b = fetch_ohlcv(symbols, parallelism=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_sym = {}
    for r in a:
        per_sym.setdefault(r.symbol, []).append(r)
    assert len(per_sym["AAA"]) == 30
    assert {r.symbol for r in a} == {"AAA", "BBB"}
    one = SyntheticFetcher()("AAA")
    got = sorted(
        [(r.trade_date, r.close) for r in per_sym["AAA"]]
    )
    want = sorted(zip(one["trade_date"], one["close"]))
    assert got == want


def test_xlsx_parser_cell_shapes():
    """The stdlib SpreadsheetML parse must handle shared strings,
    rich-text runs, inline strings, booleans, gap cells (omitted refs),
    ref-less cells (positional), and trim every value."""
    from full_docker_etl_spark.sources.files import _xlsx_parse_rows

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    sst = (
        f'<sst {ns}><si><t> padded </t></si>'
        "<si><r><t>rich</t></r><r><t> text</t></r></si></sst>"
    )
    sheet = (
        f'<worksheet {ns}><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="C1" t="s"><v>1</v></c></row>'          # B1 omitted (gap)
        '<row r="2"><c t="inlineStr"><is><t>inline</t></is></c>'
        '<c><v>42</v></c><c t="b"><v>1</v></c></row>'  # no refs: positional
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    rows = dict(_xlsx_parse_rows(buf.getvalue()))
    assert rows[1] == ["padded", "", "rich text"]
    assert rows[2] == ["inline", "42", "TRUE"]


def test_xlsx_emiten_row_semantics(spark):
    """Reference semantics over parsed rows: header skipped, <3 cells
    dropped, empty Kode/Nama dropped, try_cast keeps bad numerics
    NULL."""
    from full_docker_etl_spark.sources.files import emiten_from_xlsx

    rows = spark.createDataFrame(
        [
            ("f", 1, ["No", "Kode", "Nama"]),                      # header
            ("f", 2, ["1", "AALI", "Astra Agro", "2020-01-02", "190", "Utama"]),
            ("f", 3, ["2", "", "No Code", "", "1", "Utama"]),      # empty Kode
            ("f", 4, ["3", "BBCA"]),                               # <3 cells
            ("f", 5, ["4", "TLKM", "Telkom", "not-a-date", "x", ""]),
            # exactly 3 cells: legal (reference checks >=3) — reading
            # columns 4-6 must yield NULL, never throw (ANSI element_at
            # would abort the whole scan here)
            ("f", 6, ["5", "BMRI", "Bank Mandiri"]),
            # date-styled cell: Excel stores a NUMERIC SERIAL (days
            # since 1899-12-30) — 43832 = 2020-01-02
            ("f", 7, ["6", "ASII", "Astra Intl", "43832", "100", "Utama"]),
            # pre-1900-03-01 serials anchor differently (Excel's
            # phantom 1900-02-29 sits at serial 60): 59 = 1900-02-28,
            # 61 = 1900-03-01, 60 itself = nonexistent date → NULL
            ("f", 8, ["7", "OLD1", "Pre-Leap", "59", "1", "Utama"]),
            ("f", 9, ["8", "OLD2", "Phantom", "60", "1", "Utama"]),
            ("f", 10, ["9", "OLD3", "Post-Leap", "61", "1", "Utama"]),
            # serial 0 = Excel's '1900-01-00' (empty date coerced to a
            # number) — a nonexistent date, NULL like serial 60
            ("f", 11, ["10", "OLD0", "Zero", "0", "1", "Utama"]),
        ],
        "path string, row_num int, cells array<string>",
    )
    got = {r.kode: r for r in emiten_from_xlsx(rows).collect()}
    assert set(got) == {
        "AALI", "TLKM", "BMRI", "ASII", "OLD1", "OLD2", "OLD3", "OLD0",
    }
    import datetime as _dt
    assert got["OLD1"].tanggal_pencatatan == _dt.date(1900, 2, 28)
    assert got["OLD2"].tanggal_pencatatan is None
    assert got["OLD3"].tanggal_pencatatan == _dt.date(1900, 3, 1)
    assert got["OLD0"].tanggal_pencatatan is None
    assert got["BMRI"].tanggal_pencatatan is None
    assert got["BMRI"].saham is None
    assert got["BMRI"].papan_pencatatan is None
    import datetime
    assert got["AALI"].tanggal_pencatatan == datetime.date(2020, 1, 2)
    assert got["ASII"].tanggal_pencatatan == datetime.date(2020, 1, 2)
    assert got["AALI"].saham == 190
    assert got["TLKM"].tanggal_pencatatan is None    # try_cast, not throw
    assert got["TLKM"].saham is None
    assert got["TLKM"].papan_pencatatan is None      # empty → NULL


def test_bart_summarizer_import_guard():
    """Without the transformers package the adapter must raise a clear
    ImportError at construction (never mid-pipeline), and the default
    Lead summarizer path must be unaffected."""
    import pytest

    from full_docker_etl_spark.operators.news import BartSummarizer, LeadSummarizer

    try:
        import transformers  # noqa: F401
        has_transformers = True
    except ImportError:
        has_transformers = False
    if not has_transformers:
        with pytest.raises(ImportError, match="transformers"):
            BartSummarizer()
    assert LeadSummarizer(3)(["a b c d e"]) == ["a b c ..."]


def test_xlsx_first_sheet_by_tab_order():
    """When workbook.xml's first tab points at sheet2.xml (sheet1.xml
    is a stale leftover), the parser must read sheet2."""
    from full_docker_etl_spark.sources.files import _xlsx_parse_rows

    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'

    def sheet_xml(text):
        return (
            f'<worksheet {ns}><sheetData><row r="1">'
            f'<c r="A1" t="inlineStr"><is><t>{text}</t></is></c>'
            "</row></sheetData></worksheet>"
        )

    wb = (
        f'<workbook {ns} {rns}><sheets>'
        '<sheet name="Live" sheetId="7" r:id="rId9"/></sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml("stale"))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml("live"))
    assert _xlsx_parse_rows(buf.getvalue()) == [(1, ["live"])]

    # first tab is a CHARTSHEET (no rows): the parser must fall through
    # to the first WORKSHEET tab instead of returning an empty scan
    wb2 = (
        f'<workbook {ns} {rns}><sheets>'
        '<sheet name="Chart" sheetId="1" r:id="rC"/>'
        '<sheet name="Data" sheetId="2" r:id="rW"/></sheets></workbook>'
    )
    rels2 = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rC" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/chartsheet" Target="chartsheets/sheet1.xml"/>'
        '<Relationship Id="rW" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as zf:
        zf.writestr("xl/workbook.xml", wb2)
        zf.writestr("xl/_rels/workbook.xml.rels", rels2)
        zf.writestr("xl/chartsheets/sheet1.xml", f"<chartsheet {ns}/>")
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml("stale"))
        zf.writestr("xl/worksheets/sheet2.xml", sheet_xml("data"))
    assert _xlsx_parse_rows(buf2.getvalue()) == [(1, ["data"])]


def test_bart_summarizer_real_model_smoke(spark):
    """Conditional evidence for the real-model path: runs only when
    the environment opts in (FDE_BART_SMOKE=1) AND transformers is
    importable — the adapter then must produce non-empty summaries
    through the same mapInPandas stage the stub uses. Skips cleanly
    everywhere else (this container ships no transformers/torch)."""
    import os

    import pytest

    if os.environ.get("FDE_BART_SMOKE") != "1":
        pytest.skip(
            "permanent environment constraint (COVERAGE.md D4 caveat): "
            "no transformers/torch in this container and installs are "
            "prohibited; opt in with FDE_BART_SMOKE=1 where the model "
            "exists"
        )
    pytest.importorskip("transformers")

    from full_docker_etl_spark.operators.news import BartSummarizer, summarize

    df = spark.createDataFrame(
        [(1, " ".join(["spark distributes the summarization batches"] * 30))],
        "doc_id long, text string",
    )
    out = summarize(df, "text", "doc_id", summarizer_factory=BartSummarizer)
    rows = out.collect()
    assert len(rows) == 1 and rows[0].summary.strip()


def test_read_jsonl_quarantines_corrupt_lines(spark, tmp_path):
    """Good lines parse fully; malformed lines land intact in the
    corrupt column with all schema fields NULL — never dropped, never
    a job failure."""
    from pyspark.sql import types as T

    from full_docker_etl_spark.sources.files import read_jsonl

    p = tmp_path / "dump"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "name": "ok"}\n'
        "garbage line\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": 3, "name": broken}\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    rows = read_jsonl(spark, str(p), schema).collect()
    good = {r.id: r.name for r in rows if r._corrupt is None}
    bad = sorted(r._corrupt for r in rows if r._corrupt is not None)
    assert good == {1: "ok", 2: "also ok"}
    assert bad == ["garbage line", '{"id": 3, "name": broken}']
    assert all(r.id is None and r.name is None
               for r in rows if r._corrupt is not None)
