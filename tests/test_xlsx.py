"""Raw .xlsx container path (S1 byte level): stdlib zip+XML reader/writer.

Round-trips the reference's golden counts
(tests/unit/test_spreadsheet_loader.py:81-93: 2 parts → 6 triples, +1 BOM
edge → 7) through a workbook WRITTEN by the same zip/XML primitives, and
smoke-parses a real reference workbook's sheet structure.
"""

from __future__ import annotations

import pandas as pd
import pytest

from xlsx_to_graphdb_ray.sources import xlsx

REF_WB = "/root/reference/data/Snowmobile.xlsx"


@pytest.fixture()
def parts_wb(tmp_path):
    # the reference fixture writes the header as a DATA row (ref test
    # :59-68, header=False) — the duplicated-header promotion path
    df = pd.DataFrame([["Number", "Name"], [111, "Frame"], [222, "Ski"]])
    p = str(tmp_path / "parts.xlsx")
    xlsx.write_xlsx(p, {"Sheet1": df}, header=False)
    return p


def test_roundtrip_golden_counts(ray_session, parts_wb):
    ds, stats = xlsx.import_xlsx(parts_wb)
    assert stats["n_triples"] == 6          # 2 parts × (type, name, label)
    assert ds.count() == 6

    bom = pd.DataFrame({"Number": [111], "Component Id": [222]})
    ds2, stats2 = xlsx.import_xlsx(parts_wb, bom)
    assert stats2["n_triples"] == 7         # + 1 hasComponent edge
    comp = ds2.to_pandas()
    comp = comp[comp["pred"].str.endswith("hasComponent")]
    assert comp["subj"].tolist() == ["urn:part:111"]
    assert comp["obj"].tolist() == ["urn:part:222"]


def test_skiprows_semantics_and_fallback(tmp_path):
    # 4 junk rows, then header, then data → skiprows=4 finds the header;
    # the short fixture sheet is empty at skiprows=4 → read_workbook falls
    # back to a from-the-top read (ref parse_parts :56-60)
    rows = [["ImportSheetType=PART"], [], [], [],
            ["Number", "Name"], [333, "Track"]]
    grid = pd.DataFrame(rows).reindex(columns=range(2))
    p = str(tmp_path / "deep.xlsx")
    xlsx.write_xlsx(p, {"Deep": grid, "Shallow": pd.DataFrame(
        [["Number", "Name"], [444, "Belt"]])}, header=False)
    deep = xlsx.read_sheet(p, "Deep", skiprows=4)
    assert list(deep.columns) == ["Number", "Name"]
    assert deep["Number"].tolist() == [333]
    wb = xlsx.read_workbook(p)
    assert wb["Deep"]["Number"].tolist() == [333]
    # Shallow has <5 rows: direct skiprows=4 is empty, fallback reads it
    assert xlsx.read_sheet(p, "Shallow", skiprows=4).empty
    assert wb["Shallow"].iloc[0].tolist() == [444, "Belt"]


def test_cell_types_roundtrip(tmp_path):
    df = pd.DataFrame({
        "Number": [111, 2.5],
        "Name": ["Frame <&> \"quoted\"", "多语言 ünïcode"],
        "Flag": [True, False],
    })
    p = str(tmp_path / "types.xlsx")
    xlsx.write_xlsx(p, {"S": df})
    back = xlsx.read_sheet(p, "S")
    assert back["Number"].tolist() == [111, 2.5]      # int stays int
    assert back["Name"].tolist() == df["Name"].tolist()
    assert back["Flag"].tolist() == [True, False]


def test_real_workbook_structure():
    """Smoke-parse a real reference workbook: sheet enumeration, shared
    strings, 55-column part sheet with the duplicated-header row the
    downstream promotion expects."""
    names = xlsx.sheet_names(REF_WB)
    assert "MechanicalPart-Sheet" in names and "BOMSheet1" in names
    df = xlsx.read_sheet(REF_WB, "MechanicalPart-Sheet", skiprows=4)
    assert {"Number", "Name", "Type"} <= set(df.columns)
    assert len(df) > 800
    # first data row is the in-data duplicated header (promotion fodder)
    assert df.iloc[0]["Number"] == "Number"
    assert df.iloc[1]["Number"] == "3514445"          # real shared string


def test_real_workbook_import_parses_parts(ray_session):
    """End-to-end byte path on a real workbook: container → sheets →
    part table → triples (no BOM side input here; edge goldens are the
    synthetic-fixture tests above)."""
    from xlsx_to_graphdb_ray.pipelines.tabular_kg import build_part_table
    wb = xlsx.read_workbook(REF_WB, sheets=["MechanicalPart-Sheet"])
    parts = build_part_table(wb)
    assert len(parts) > 800
    assert (parts["part_type"] == "MechanicalPart").all()
    assert "3514445" in set(parts["number"])


def test_missing_sheet_raises(parts_wb):
    with pytest.raises(KeyError):
        xlsx.read_sheet(parts_wb, "NoSuchSheet")
