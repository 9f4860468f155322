"""Report sinks (SURVEY.md §2.1 K1-K3).

- K1 pinned-schema CSV: the reference's 16-column commodity schema
  (pacong/output/csv_writer.py:36-41) and 11-column forex schema
  (csv_writer.py:94-99), ``utf-8-sig`` encoded, missing fields filled
  null. Large datasets go through ``ds.write_csv`` (distributed, one
  file per block, no BOM); the reference-compatible single-file BOM
  variant is a driver-side sink for the (tiny) final report, matching
  the reference's report sizes (~36 rows).
- K2 multi-sheet Excel report (all-rows sheet + one sheet per category
  sorted desc by price + summary sheet; pacong/output/excel_writer.py:
  20-87): ``write_multi_sheet_xlsx`` emits a REAL .xlsx via the stdlib
  writer in ``io/xlsx_lite.py``; ``write_multi_sheet_report`` keeps the
  CSV-directory layout for diff-friendly output.
- K3 raw JSON dump (base_scraper.py:164-178).
"""

from __future__ import annotations

import json
import os

import pandas as pd

from ..io.xlsx_lite import write_xlsx

COMMODITY_COLUMNS = [
    "name", "chinese_name", "symbol", "category", "currency",
    "current_price", "change_amount", "change_percent",
    "open_price", "high_price", "low_price", "previous_close",
    "volume", "market_cap", "source", "timestamp",
]
FOREX_COLUMNS = [
    "pair", "base_currency", "quote_currency",
    "bid_price", "ask_price", "mid_price", "spread",
    "change_amount", "change_percent", "source", "timestamp",
]


def project_to_schema(df: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """M7 projection (csv_writer.py:52-70): drop extras, fill missing
    with null, fixed column order."""
    out = pd.DataFrame(index=df.index)
    for col in columns:
        out[col] = df[col] if col in df.columns else None
    return out


def write_commodity_csv(df: pd.DataFrame, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    project_to_schema(df, COMMODITY_COLUMNS).to_csv(path, index=False, encoding="utf-8-sig")
    return path


def write_forex_csv(df: pd.DataFrame, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    project_to_schema(df, FOREX_COLUMNS).to_csv(path, index=False, encoding="utf-8-sig")
    return path


def write_multi_sheet_report(
    df: pd.DataFrame, out_dir: str, category_col: str = "category",
    price_col: str = "current_price",
) -> dict:
    """K2 layout (excel_writer.py:20-87) as a CSV directory: all.csv,
    by_category/<cat>.csv (sorted desc by price), summary.json."""
    os.makedirs(os.path.join(out_dir, "by_category"), exist_ok=True)
    write_commodity_csv(df, os.path.join(out_dir, "all.csv"))
    sheet_index = {}
    for cat, group in df.groupby(category_col, dropna=False, sort=True):
        name = str(cat) if pd.notna(cat) else "uncategorized"
        g = group.sort_values(price_col, ascending=False, kind="mergesort")
        path = os.path.join(out_dir, "by_category", f"{name}.csv")
        write_commodity_csv(g, path)
        sheet_index[name] = len(g)
    summary = {
        "total_rows": int(len(df)),
        "categories": sheet_index,
        "avg_change_percent": (
            round(float(df["change_percent"].dropna().mean()), 4)
            if "change_percent" in df and df["change_percent"].notna().any()
            else None
        ),
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, ensure_ascii=False)
    return summary


def write_multi_sheet_xlsx(
    df: pd.DataFrame, path: str, category_col: str = "category",
    price_col: str = "current_price",
) -> dict:
    """K2 as a REAL .xlsx workbook (excel_writer.py:20-87 layout) via
    the stdlib writer in ``io/xlsx_lite.py``: an all-rows sheet, one
    sheet per category sorted desc by price, and a summary sheet.
    Returns the same summary dict as the CSV-dir variant."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sheets: dict[str, pd.DataFrame] = {
        "All Data": project_to_schema(df, COMMODITY_COLUMNS)
    }
    sheet_index = {}
    for cat, group in df.groupby(category_col, dropna=False, sort=True):
        name = str(cat) if pd.notna(cat) else "uncategorized"
        g = group.sort_values(price_col, ascending=False, kind="mergesort")
        sheets[name[:31]] = project_to_schema(g, COMMODITY_COLUMNS)
        sheet_index[name] = len(g)
    summary = {
        "total_rows": int(len(df)),
        "categories": sheet_index,
        "avg_change_percent": (
            round(float(df["change_percent"].dropna().mean()), 4)
            if "change_percent" in df and df["change_percent"].notna().any()
            else None
        ),
    }
    sheets["Summary"] = pd.DataFrame(
        {"metric": ["total_rows"] + [f"n_{c}" for c in sheet_index]
         + ["avg_change_percent"],
         "value": [summary["total_rows"]] + list(sheet_index.values())
         + [summary["avg_change_percent"]]}
    )
    write_xlsx(sheets, path)
    return summary


def write_raw_json(records: list[dict], path: str) -> str:
    """K3 raw dump (base_scraper.py:164-178) — deterministic name is the
    caller's job (the reference timestamps filenames; the engine passes
    an explicit path so runs are reproducible)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(records, f, ensure_ascii=False, indent=1, default=str)
    return path
