"""Tests for the fetch actor retry policy (S1/S2), CSS extraction (M3,
F6-F8), workbook sniff/unpivot (S4), and report sinks (K1-K3)."""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from web_crawler_ray.output.report import (
    COMMODITY_COLUMNS,
    write_commodity_csv,
    write_multi_sheet_report,
    write_raw_json,
)
from web_crawler_ray.sources.http_fetch import FakeTransport, FetcherActor
from web_crawler_ray.sources.tabular import WorkbookExtract, sniff_header, unpivot_last_value
from web_crawler_ray.stages.css_extract import CssExtract, extract_fields, select, parse_dom, validate_value


def test_fetcher_retry_and_isolation():
    pages = {
        "https://a/ok": (200, b"hello"),
        "https://a/gone": (404, b""),
        "https://a/flaky": (200, b"finally"),
        "https://a/dead": (200, b"never"),
    }
    sleeps = []
    fetcher = FetcherActor(
        transport_factory=lambda: FakeTransport(pages, flaky={"https://a/flaky": 2, "https://a/dead": 99}),
        max_attempts=3,
        backoff_factor=1.0,
        sleep_fn=sleeps.append,
    )
    batch = pa.table({"url": pa.array(list(pages), pa.string())})
    out = fetcher(batch).to_pydict()
    by_url = {u: (s, b, a, e) for u, s, b, a, e in zip(
        out["url"], out["status"], out["body"], out["attempts"], out["fetch_error"])}
    assert by_url["https://a/ok"] == (200, b"hello", 1, "")
    assert by_url["https://a/gone"][0] == 404  # non-retryable, 1 attempt
    assert by_url["https://a/gone"][2] == 1
    # flaky: 2 failures then success on 3rd attempt
    assert by_url["https://a/flaky"] == (200, b"finally", 3, "")
    # dead: exhausts retries, error as data not exception
    assert by_url["https://a/dead"][0] == 503
    assert "retryable" in by_url["https://a/dead"][3]
    # urllib3 backoff schedule 1, 2 per retried URL
    assert sleeps.count(1.0) >= 2 and sleeps.count(2.0) >= 2


HTML = """
<html><body>
<div id="main">
 <table class="prices">
  <tr class="row"><td class="name">Gold</td><td class="price">$1,234.56</td>
      <td class="chg">+1.2%</td><td><a href="/gold">more</a></td></tr>
 </table>
 <table class="prices">
  <tr class="row"><td class="name">Oil</td><td class="price">70.25</td>
      <td class="chg">-0.5%</td><td><a href="/oil">more</a></td></tr>
 </table>
</div>
</body></html>
"""


def test_css_extract_fields():
    config = {
        "container": "table.prices",
        "fields": {
            "name": {"selector": "td.name"},
            "price": {"selector": "td.price", "transform": "float"},
            "pct": {"selector": "td.chg", "regex": r"([\d.]+)%"},
            "link": {"selector": "a", "attribute": "href", "validate": "non_empty"},
        },
    }
    recs = extract_fields(HTML, config)
    assert recs == [
        {"name": "Gold", "price": 1234.56, "pct": "1.2", "link": "/gold"},
        {"name": "Oil", "price": 70.25, "pct": "0.5", "link": "/oil"},
    ]
    # id selector + descendant combinator
    dom = parse_dom(HTML)
    assert len(select(dom, "#main td.name")) == 2
    assert validate_value("1.5", "number") and not validate_value("x", "number")
    assert validate_value("https://a/b", "url") and not validate_value("/rel", "url")

    batch = pa.table({"body": pa.array([HTML.encode()], pa.binary()),
                      "url": pa.array(["https://h/x"], pa.string())})
    out = CssExtract(config)(batch)
    assert out.num_rows == 2
    assert out["source_url"].to_pylist() == ["https://h/x", "https://h/x"]


CSV_SHEET = b"""junk line 1,,
junk line 2,,
Commodity,2021,2022,2023
Gold,1700,1800,
Oil,70,75,80
Bad,-5,,
,100,100,100
"""


def test_workbook_sniff_and_unpivot():
    df, header = sniff_header(CSV_SHEET)
    assert header == 2 and df.shape[1] == 4
    long = unpivot_last_value(df)
    # Gold: last non-null = 1800 (2022); Oil: 80 (2023); Bad dropped (negative)
    rows = {r["name"]: (r["price"], r["period"]) for _, r in long.iterrows()}
    assert rows["Gold"] == (1800.0, "2022")
    assert rows["Oil"] == (80.0, "2023")
    assert "Bad" not in rows
    batch = pa.table({"bytes": pa.array([CSV_SHEET], pa.binary()),
                      "path": pa.array(["wb.csv"], pa.string())})
    out = WorkbookExtract()(batch)
    assert out.num_rows == 2 and out["header_row"].to_pylist() == [2, 2]


def test_report_sinks(tmp_path):
    df = pd.DataFrame(
        {
            "name": ["Gold", "Oil", "Corn"],
            "category": ["贵金属", "能源", "农产品"],
            "current_price": [1800.0, 75.0, 5.0],
            "change_percent": [1.0, -2.0, 0.5],
            "source": ["s1", "s2", "s1"],
        }
    )
    csv_path = str(tmp_path / "commodity.csv")
    write_commodity_csv(df, csv_path)
    raw = open(csv_path, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM like the reference
    back = pd.read_csv(csv_path)
    assert list(back.columns) == COMMODITY_COLUMNS
    assert len(back) == 3

    summary = write_multi_sheet_report(df, str(tmp_path / "report"))
    assert summary["total_rows"] == 3
    assert sorted(summary["categories"]) == ["农产品", "能源", "贵金属"]
    assert os.path.exists(tmp_path / "report" / "by_category" / "能源.csv")

    p = write_raw_json([{"a": 1}], str(tmp_path / "raw.json"))
    assert json.load(open(p)) == [{"a": 1}]


def test_xlsx_roundtrip(tmp_path):
    """write_xlsx → read_xlsx → frame equality (strings, ints, floats,
    unicode, None), multi-sheet, deterministic bytes."""
    from web_crawler_ray.io.xlsx_lite import grid_to_frame, read_xlsx, write_xlsx

    a = pd.DataFrame({
        "name": ["Gold", "原油", "a,b\"q\"<&>"],
        "price": [1800.5, 75.0, 3.25],
        "n": [1, 2, 3],
    })
    b = pd.DataFrame({"x": ["only", None], "y": [0.5, -2.0]})
    path = str(tmp_path / "wb.xlsx")
    data1 = write_xlsx({"SheetA": a, "B": b}, path)
    data2 = write_xlsx({"SheetA": a, "B": b})
    assert data1 == data2  # deterministic bytes
    back = read_xlsx(path)
    assert list(back) == ["SheetA", "B"]
    fa = grid_to_frame(back["SheetA"], 0)
    assert fa["name"].tolist() == a["name"].tolist()
    assert fa["price"].tolist() == a["price"].tolist()
    assert fa["n"].tolist() == [1, 2, 3]
    fb = grid_to_frame(back["B"], 0)
    assert fb["x"].tolist()[0] == "only" and fb["x"].tolist()[1] is None
    assert fb["y"].tolist() == [0.5, -2.0]


def test_xlsx_shared_strings_compat():
    """read_xlsx parses workbooks that use a sharedStrings table (the
    layout other writers emit) — not just our inline-string form."""
    import io
    import zipfile

    from web_crawler_ray.io.xlsx_lite import read_xlsx

    buf = io.BytesIO()
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml",
                   '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
                   '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
                   '<Default Extension="xml" ContentType="application/xml"/></Types>')
        z.writestr("_rels/.rels",
                   '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>')
        z.writestr("xl/workbook.xml",
                   f'<?xml version="1.0"?><workbook {ns} xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
                   '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>')
        z.writestr("xl/_rels/workbook.xml.rels",
                   '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                   '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>')
        z.writestr("xl/sharedStrings.xml",
                   f'<?xml version="1.0"?><sst {ns}><si><t>hdr</t></si><si><t>va</t></si></sst>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<?xml version="1.0"?><worksheet {ns}><sheetData>'
                   '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>7</v></c></row>'
                   '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="C2"><v>1.5</v></c></row>'
                   '</sheetData></worksheet>')
    grids = read_xlsx(buf.getvalue())
    g = grids["S"]
    assert g.iloc[0].tolist() == ["hdr", 7, None]
    assert g.iloc[1].tolist() == ["va", None, 1.5]  # sparse row C col


def test_workbook_extract_real_xlsx():
    """S4 end-to-end on a REAL .xlsx: junk rows above the header are
    sniffed past, wide→long unpivot matches the CSV path."""
    from web_crawler_ray.io.xlsx_lite import write_xlsx
    from web_crawler_ray.sources.tabular import WorkbookExtract, sniff_header

    grid = pd.DataFrame(
        [["", "junk", "", ""],
         ["", "junk", "", ""],
         ["Commodity", "2021", "2022", "2023"],
         ["Gold", "1700", "1800", ""],
         ["Oil", "70", "75", "80"],
         ["Bad", "-5", "", ""]])
    sheet = pd.DataFrame(grid.to_numpy()[1:],
                         columns=[str(c) for c in grid.iloc[0]])
    data = write_xlsx({"Sheet1": sheet})
    df, header = sniff_header(data)
    assert header == 2 and df.shape[1] == 4
    batch = pa.table({"bytes": pa.array([data], pa.binary()),
                      "path": pa.array(["wb.xlsx"], pa.string())})
    out = WorkbookExtract()(batch)
    rows = {n: (p, l) for n, p, l in zip(out["name"].to_pylist(),
                                         out["price"].to_pylist(),
                                         out["period"].to_pylist())}
    assert rows == {"Gold": (1800.0, "2022"), "Oil": (80.0, "2023")}


def test_multi_sheet_xlsx_report(tmp_path):
    """K2 real-.xlsx sink: all-rows + per-category (sorted desc by
    price) + summary sheets, read back with the stdlib reader."""
    from web_crawler_ray.io.xlsx_lite import grid_to_frame, read_xlsx
    from web_crawler_ray.output.report import write_multi_sheet_xlsx

    df = pd.DataFrame({
        "name": ["Gold", "Silver", "Oil"],
        "category": ["贵金属", "贵金属", "能源"],
        "current_price": [1800.0, 22.0, 75.0],
        "change_percent": [1.0, -2.0, 0.5],
        "source": ["s1", "s1", "s2"],
    })
    path = str(tmp_path / "report.xlsx")
    summary = write_multi_sheet_xlsx(df, path)
    assert summary["total_rows"] == 3
    back = read_xlsx(path)
    assert list(back) == ["All Data", "能源", "贵金属", "Summary"]
    gm = grid_to_frame(back["贵金属"], 0)
    assert gm["name"].tolist() == ["Gold", "Silver"]  # desc by price
    assert gm["current_price"].tolist() == [1800.0, 22.0]
    alld = grid_to_frame(back["All Data"], 0)
    assert list(alld.columns) == COMMODITY_COLUMNS


def test_wds_shard_roundtrip(tmp_path):
    """WebDataset tar sink: lossless roundtrip, shard size bound,
    deterministic content-addressed shard bytes across rewrites."""
    import ray.data as rd

    from web_crawler_ray.io.wds import (
        read_wds_manifest, read_wds_shards, write_wds_shards,
    )

    rows = [{"key": f"{i:06d}", "payload": bytes([i % 251]) * (300 + i % 57),
             "label": f"c{i % 3}"} for i in range(40)]
    ds = rd.from_items(rows)
    root = str(tmp_path / "wds")
    man = write_wds_shards(ds, root, "key", "payload", ext="img",
                           meta_cols=["label"], max_shard_bytes=2048)
    assert sum(s["rows"] for s in man["shards"].values()) == 40
    assert len(man["shards"]) > 1  # size bound actually cut shards
    # every shard's payload stays under the bound (single oversize rows
    # aside): rows are 300-357 B, so a 2048-B bound admits at most 7
    for s in man["shards"].values():
        assert s["rows"] <= 7

    back = {r["key"]: r for r in read_wds_shards(root).take_all()}
    assert len(back) == 40
    for r in rows:
        got = back[r["key"]]
        assert got["payload"] == r["payload"]
        assert got["label"] == r["label"]

    # determinism: rewriting the same input reproduces the same shard
    # names and bytes (content-addressed → idempotent resume)
    import hashlib
    import os as _os

    def tree_digest(d):
        h = hashlib.sha256()
        for f in sorted(_os.listdir(d)):
            if f.endswith(".tar"):
                h.update(f.encode())
                h.update(open(_os.path.join(d, f), "rb").read())
        return h.hexdigest()

    d1 = tree_digest(root)
    write_wds_shards(rd.from_items(rows), root, "key", "payload", ext="img",
                     meta_cols=["label"], max_shard_bytes=2048)
    assert tree_digest(root) == d1
    assert read_wds_manifest(root)["shards"].keys() == man["shards"].keys()


def test_wds_oversize_row_gets_own_shard(tmp_path):
    import ray.data as rd

    from web_crawler_ray.io.wds import read_wds_shards, write_wds_shards

    rows = [{"key": "a", "payload": b"x" * 10_000},
            {"key": "b", "payload": b"y" * 10}]
    root = str(tmp_path / "wds2")
    man = write_wds_shards(rd.from_items(rows), root, "key", "payload",
                           max_shard_bytes=1024)
    assert len(man["shards"]) == 2
    got = sorted(read_wds_shards(root).take_all(), key=lambda r: r["key"])
    assert [len(r["payload"]) for r in got] == [10_000, 10]


def test_wds_reader_errors_on_corrupt_shard(tmp_path):
    """A truncated shard must fail loudly, never silently drop rows —
    tarfile treats a truncated archive as a short one, so the reader
    checks member counts against the manifest."""
    import tarfile

    import pytest
    import ray
    import ray.data as rd

    from web_crawler_ray.io.wds import read_wds_shards, write_wds_shards

    rows = [{"key": f"{i:04d}", "payload": b"z" * 500} for i in range(20)]
    root = str(tmp_path / "wds3")
    man = write_wds_shards(rd.from_items(rows), root, "key", "payload",
                           max_shard_bytes=2000)
    victim = sorted(man["shards"])[0]
    p = f"{root}/{victim}"
    blob = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(blob[:1100])  # one member + change — rest of the rows gone
    with pytest.raises((ray.exceptions.RayTaskError, tarfile.ReadError,
                        ValueError), match="corrupt|truncated|tar"):
        read_wds_shards(root).take_all()


def test_wds_manifest_missing_is_loud(tmp_path):
    import pytest

    from web_crawler_ray.io.wds import read_wds_manifest

    with pytest.raises(FileNotFoundError):
        read_wds_manifest(str(tmp_path / "nope"))


def test_fwf_roundtrip_and_guards(ray_session, tmp_path):
    """Fixed-width sink/source: values round-trip through pad + slice;
    a value wider than its column raises instead of truncating; one
    part file per block."""
    import ray.data as rd

    from web_crawler_ray.io.fwf import read_fwf, write_fwf

    df = pd.DataFrame({"id": [1, 22, 333], "name": ["a", "bb c", "d"],
                       "grp": [9, 8, 7]})
    widths = {"id": 5, "name": 8, "grp": 3}
    path = str(tmp_path / "fwf")
    files = write_fwf(rd.from_pandas(df).repartition(2), path, widths)
    assert len(files) == 2
    back = (read_fwf(path, widths, {"id": "int64", "name": "str",
                                    "grp": "int64"})
            .to_pandas().sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df.sort_values("id")
                                  .reset_index(drop=True))

    # the ValueError surfaces wrapped in RayTaskError — match the message
    with pytest.raises(Exception, match="exceeds width"):
        write_fwf(rd.from_pandas(pd.DataFrame({"id": [123456], "name": ["x"],
                                               "grp": [1]})), path, widths)


def test_columnar_orc_ipc_roundtrip(ray_session, tmp_path):
    """ORC and Arrow-IPC sinks/sources: schema (incl. int32 and
    timestamp) and values survive the roundtrip bit-exactly; one part
    file per non-empty block; a directory written with N blocks reads
    back as a distributed Dataset, not a driver frame."""
    import pyarrow as pa
    import ray.data as rd

    from web_crawler_ray.io.columnar import (read_ipc, read_orc,
                                             write_ipc, write_orc)

    df = pd.DataFrame({
        "k": pd.array([3, 1, 2, 4], dtype="int32"),
        "x": [1.5, -2.25, 0.0, 3.125],
        "s": ["a", "b", None, "d"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02",
                              "2024-01-03", "2024-01-04"]),
    })
    src = rd.from_pandas(df).repartition(2)

    for write, read, ext in ((write_orc, read_orc, "orc"),
                             (write_ipc, read_ipc, "arrow")):
        path = str(tmp_path / ext)
        write(src, path)
        parts = [f for f in os.listdir(path) if f.endswith(ext)]
        assert len(parts) == 2, parts
        ds = read(path)
        assert isinstance(ds, rd.Dataset)
        back = ds.to_pandas().sort_values("k").reset_index(drop=True)
        want = df.sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(back, want)
        # schema fidelity: int32 stays int32 through the format
        sch = pa.schema([(f.name, f.type) for f in ds.schema().base_schema])
        assert sch.field("k").type == pa.int32()
