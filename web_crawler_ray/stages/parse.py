"""Parsers / extractors (SURVEY.md §2.2 M1-M5), as map_batches flat-maps.

The reference parses HTML with BeautifulSoup (not available here); the
HTML-table semantics are reimplemented with a compiled-regex scanner —
sufficient for well-formed ``<table><tr><td>`` markup, which is all the
reference's extractors consume (cells text-stripped, tags ignored).

Each stage: Arrow batch in → exploded Arrow batch out (rows-per-page ≥
0), stateless (plain-function tasks), regexes compiled at module import
(amortized per worker process).
"""

from __future__ import annotations

import json
import re
from typing import Any

import pyarrow as pa

from ..functions.cleaning import (
    clean_percentage_string,
    clean_price_string,
    parse_jsonp_quote,
)

_ROW_RE = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S | re.I)
_CELL_RE = re.compile(r"<t[dh][^>]*>(.*?)</t[dh]>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")
_NUMERIC_RE = re.compile(r"\d")
_CHANGE_RE = re.compile(r"[%+\-]")

_HEADER_TOKENS = ("commodity", "price")


def _cell_text(cell_html: str) -> str:
    return _TAG_RE.sub("", cell_html).strip()


def parse_html_tables(html: str, min_cells: int = 3) -> list[dict[str, Any]]:
    """M1 — HTML-table row extractor (business_insider.py:83-158 semantics).

    For every table row with ≥ ``min_cells`` cells: name = cell 0, price
    = first numeric-parseable cell, change = first cell containing
    ``%``/``+``/``-``. Header-ish rows are skipped: name length ≤ 2,
    all-digits, or containing "commodity"/"price" (case-insensitive).
    """
    out = []
    for row_html in _ROW_RE.findall(html):
        cells = [_cell_text(c) for c in _CELL_RE.findall(row_html)]
        if len(cells) < min_cells:
            continue
        name = cells[0]
        low = name.lower()
        if len(name) <= 2 or name.isdigit() or any(t in low for t in _HEADER_TOKENS):
            continue
        price = None
        price_raw = ""
        change_raw = ""
        for cell in cells[1:]:
            if price is None and _NUMERIC_RE.search(cell):
                parsed = clean_price_string(cell)
                if parsed is not None:
                    price, price_raw = parsed, cell
                    continue
            if not change_raw and _CHANGE_RE.search(cell):
                change_raw = cell
        if price is None:
            continue
        out.append(
            {
                "name": name,
                "price": price,
                "price_raw": price_raw,
                "change_raw": change_raw,
                "change_percent": clean_percentage_string(change_raw),
            }
        )
    return out


def walk_json_path(obj: Any, path: str) -> Any:
    """M4 — dotted json-path walk (generic_scraper.py:248-312 semantics)."""
    cur = obj
    for part in path.split("."):
        if not part:
            continue
        if isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
    return cur


def parse_json_records(
    body: str, json_path: str = "", field_mapping: dict[str, str] | None = None
) -> list[dict[str, Any]]:
    """M4 — JSON decode + path walk + field-mapping rename; a dict of
    dicts ({coin: {usd: ...}}) explodes to one row per key."""
    try:
        obj = json.loads(body)
    except (ValueError, TypeError):
        return []
    data = walk_json_path(obj, json_path) if json_path else obj
    if data is None:
        return []
    if isinstance(data, dict):
        if all(isinstance(v, dict) for v in data.values()) and data:
            data = [{"name": k, **v} for k, v in sorted(data.items())]
        else:
            data = [data]
    if not isinstance(data, list):
        return []
    rows = []
    for item in data:
        if not isinstance(item, dict):
            continue
        if field_mapping:
            rows.append({target: item.get(src) for target, src in field_mapping.items()})
        else:
            rows.append(dict(item))
    return rows


def parse_regex_records(body: str, pattern: str, fields: list[str]) -> list[dict[str, Any]]:
    """M5 — multi-pattern regex parser: ``finditer`` with positional
    field names (generic_scraper.py:314-341 semantics)."""
    out = []
    for m in re.finditer(pattern, body or ""):
        groups = m.groups() if m.groups() else (m.group(0),)
        out.append({f: (groups[i] if i < len(groups) else None) for i, f in enumerate(fields)})
    return out


class ExtractRecords:
    """map_batches stage: fetched pages → exploded record rows.

    Dispatches on ``content_type`` (M1 for text/html, M4 for
    application/json, F11 JSONP for application/jsonp), mirroring the
    per-scraper parse dispatch of the reference's scrape_single_source
    implementations (base_scraper.py:51-62 contract).
    """

    def __init__(self, body_col: str = "body", url_col: str = "url"):
        self.body_col = body_col
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bodies = batch[self.body_col].to_pylist()
        ctypes = batch["content_type"].to_pylist()
        urls = batch[self.url_col].to_pylist()
        names, prices, changes, sources = [], [], [], []
        for body, ctype, url in zip(bodies, ctypes, urls):
            text = body.decode("utf-8", "replace") if isinstance(body, (bytes, bytearray)) else (body or "")
            if ctype == "text/html":
                recs = parse_html_tables(text)
                for r in recs:
                    names.append(r["name"])
                    prices.append(r["price"])
                    changes.append(r["change_percent"])
                    sources.append(url)
            elif ctype == "application/json":
                for r in parse_json_records(text, "data.commodities"):
                    price = clean_price_string(r.get("price"))
                    if r.get("name") and price is not None:
                        names.append(str(r["name"]))
                        prices.append(price)
                        changes.append(None)
                        sources.append(url)
            elif ctype == "application/jsonp":
                for r in parse_jsonp_quote(text):
                    names.append(r["name"])
                    prices.append(r["current_price"])
                    changes.append(None)
                    sources.append(url)
        return pa.table(
            {
                "name": pa.array(names, pa.string()),
                "price": pa.array(prices, pa.float64()),
                "change_percent": pa.array(changes, pa.float64()),
                "source": pa.array(sources, pa.string()),
            }
        )
