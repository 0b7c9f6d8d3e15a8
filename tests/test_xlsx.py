"""S4 Excel ingestion via the dependency-free OOXML reader.

The fixture writes a REAL .xlsx (zip of OOXML parts, shared + inline
strings, numbers, two sheets) with stdlib zipfile, so the read path is
exercised end-to-end without openpyxl.
"""

from __future__ import annotations

import zipfile

import pytest

from ondine_spark.sources.xlsx import read_xlsx

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="reviews" sheetId="1" r:id="rId1"/><sheet name="extra" sheetId="2" r:id="rId2"/></sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>id</t></si><si><t>review</t></si><si><t>this is great</t></si><si><t>terrible quality</t></si>
</sst>"""

_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>
<row r="3"><c r="A3"><v>2</v></c><c r="B3" t="s"><v>3</v></c></row>
<row r="4"><c r="A4"><v>3</v></c><c r="B4" t="inlineStr"><is><t>just okay</t></is></c></row>
</sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c><c r="B1" t="inlineStr"><is><t>flag</t></is></c></row>
<row r="2"><c r="A2"><v>2.5</v></c><c r="B2" t="b"><v>1</v></c></row>
</sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "reviews.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SS)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_read_xlsx_values_and_types(xlsx_path):
    cols, rows = read_xlsx(xlsx_path)
    assert cols == ["id", "review"]
    assert rows == [
        [1, "this is great"], [2, "terrible quality"], [3, "just okay"],
    ]


def test_read_xlsx_sheet_by_name_and_bool(xlsx_path):
    cols, rows = read_xlsx(xlsx_path, sheet_name="extra")
    assert cols == ["k", "flag"]
    assert rows == [[2.5, True]]


def test_read_xlsx_missing_sheet(xlsx_path):
    with pytest.raises(ValueError, match="no sheet named"):
        read_xlsx(xlsx_path, sheet_name="nope")


def test_excel_pipeline_end_to_end(spark, xlsx_path):
    """S4: .xlsx -> enrich pipeline -> sentiments (reference:
    tests/verification/test_verify_data_formats.py)."""
    from ondine_spark import PipelineBuilder, mock_client_factory

    res = (
        PipelineBuilder(spark)
        .from_excel(xlsx_path, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .build()
        .execute()
    )
    rows = {r["id"]: r["sentiment"] for r in res.data.collect()}
    assert rows == {"1": "positive", "2": "negative", "3": "neutral"}


# --------------------------------------------------------------- writer


def test_write_xlsx_roundtrip(tmp_path):
    """S8 excel sink: the stdlib writer's output parses back exactly with
    the stdlib reader (types preserved: str/int/float/bool/None)."""
    from ondine_spark.sources.xlsx import write_xlsx

    p = str(tmp_path / "out.xlsx")
    cols = ["id", "text", "score", "ok"]
    rows = [
        [1, "plain", 0.5, True],
        [2, "a&b <c> \"d\"", -3.25, False],
        [3, "  leading and trailing  ", 7, None],
        [4, None, 1e300, True],
        [5, "unicode: héllo — 世界", 0.0, False],
        [6, "multi\nline\ttabbed", 42, True],
    ]
    write_xlsx(p, cols, rows)
    rcols, rrows = read_xlsx(p)
    assert rcols == cols
    assert rrows == rows


def test_write_xlsx_row_cap(tmp_path):
    from ondine_spark.sources.xlsx import XLSX_MAX_DATA_ROWS, write_xlsx

    class _FakeRows(list):
        def __len__(self):
            return XLSX_MAX_DATA_ROWS + 1

    with pytest.raises(ValueError, match="sheet cap"):
        write_xlsx(str(tmp_path / "big.xlsx"), ["a"], _FakeRows())


def test_pipeline_to_excel_sink(spark, tmp_path, xlsx_path):
    """End-to-end S8: builder .to_excel writes a real workbook the reader
    (and pandas+openpyxl, when present) can load back."""
    from ondine_spark import PipelineBuilder, mock_client_factory

    out = str(tmp_path / "result.xlsx")
    (
        PipelineBuilder(spark)
        .from_excel(xlsx_path, ["review"], id_column="id")
        .with_prompt("Classify: {review}", ["sentiment"])
        .with_custom_llm_client(mock_client_factory())
        .to_excel(out)
        .build()
        .execute()
    )
    cols, rows = read_xlsx(out)
    assert "sentiment" in cols
    si, ii = cols.index("sentiment"), cols.index("id")
    got = {r[ii]: r[si] for r in rows}
    assert got == {"1": "positive", "2": "negative", "3": "neutral"}


def test_excel_sink_mode_error_and_append(spark, tmp_path):
    from ondine_spark.core.specs import OutputSpec
    from ondine_spark.plans.pipeline import write_output

    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    p = str(tmp_path / "m.xlsx")
    write_output(df, OutputSpec(path=p, format="excel", mode="overwrite"))
    with pytest.raises(FileExistsError):
        write_output(df, OutputSpec(path=p, format="excel", mode="error"))
    with pytest.raises(ValueError, match="append"):
        write_output(df, OutputSpec(path=p, format="excel", mode="append"))
    # overwrite replaces cleanly
    write_output(df, OutputSpec(path=p, format="excel", mode="overwrite"))
    cols, rows = read_xlsx(p)
    assert cols == ["id", "text"] and rows == [[1, "a"]]
