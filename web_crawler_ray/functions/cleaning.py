"""Scalar cleaning/standardization functions (SURVEY.md §2.8 F1–F5, F9, F11).

Reimplemented from the *semantics* of the reference (citations below),
not its code. Each scalar function has a vectorized batch wrapper used
inside ``map_batches`` — the scalar form is the spec (and the oracle
used in unit tests), the batch form is the hot path.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pandas as pd

_NON_PRICE = re.compile(r"[^\d.,\-]")

# F4 alias table — behavior data from the reference
# (pacong/data/processor.py:159-171).
NAME_ALIASES = {
    "Oil (WTI)": "WTI原油",
    "Oil (Brent)": "布伦特原油",
    "Natural Gas": "天然气",
    "Natural Gas (Henry Hub)": "天然气",
    "RBOB Gasoline": "RBOB汽油",
    "Heating Oil": "取暖油",
    "Live Cattle": "活牛",
    "Lean Hog": "瘦肉猪",
    "Feeder Cattle": "饲料牛",
}

# F5 keyword classes (pacong/data/processor.py:173-214). Order matters:
# first matching class wins.
_CATEGORY_KEYWORDS = [
    ("能源", ["oil", "gas", "gasoline", "原油", "天然气", "汽油", "取暖油", "heating", "brent", "wti"]),
    ("贵金属", ["gold", "silver", "platinum", "palladium", "黄金", "白银", "铂金", "钯金"]),
    ("工业金属", ["copper", "aluminum", "zinc", "nickel", "lead", "tin", "铜", "铝", "锌", "镍", "铅", "锡"]),
    ("农产品", ["corn", "wheat", "soybean", "cotton", "sugar", "coffee", "cocoa", "cattle", "hog",
             "玉米", "小麦", "大豆", "棉花", "糖", "咖啡", "可可", "牛", "猪"]),
]

# F3 symbol regex ladder (pacong/data/processor.py:128-133); first hit wins.
_SYMBOL_PATTERNS = [
    re.compile(r"([A-Z]+\d*:COM)"),
    re.compile(r"([A-Z]+USD:CUR)"),
    re.compile(r"([A-Z]+\d+)"),
    re.compile(r"([A-Z]{2,4})"),
]


def clean_price_string(value) -> Optional[float]:
    """F1 — locale-aware price-string → float (processor.py:22-73).

    Strip everything but ``[\\d.,-]``; with both ``,`` and ``.`` the
    rightmost is the decimal separator; a lone comma is a decimal
    separator iff it splits the string in two with ≤2 trailing digits,
    else thousands. Unparseable → None.
    """
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return None
    s = str(value).strip()
    if not s:
        return None
    s = _NON_PRICE.sub("", s)
    if "," in s and "." in s:
        if s.rfind(".") > s.rfind(","):
            s = s.replace(",", "")
        else:
            s = s.replace(".", "").replace(",", ".")
    elif "," in s:
        parts = s.split(",")
        if len(parts) == 2 and len(parts[1]) <= 2:
            s = s.replace(",", ".")
        else:
            s = s.replace(",", "")
    try:
        return float(s)
    except (ValueError, TypeError):
        return None


def clean_percentage_string(value) -> Optional[float]:
    """F2 — percent-string → float (processor.py:75-112).

    Strip to ``[\\d.,-]``, commas become dots; values with abs>100 are
    assumed pre-scaled and divided by 100 (``"250%"`` → 2.5).
    """
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return None
    s = str(value).strip()
    if not s:
        return None
    s = _NON_PRICE.sub("", s).replace(",", ".")
    try:
        v = float(s)
    except (ValueError, TypeError):
        return None
    return v if abs(v) <= 100 else v / 100


def extract_commodity_symbol(text) -> str:
    """F3 — first match of the symbol regex ladder (processor.py:114-140)."""
    if not text:
        return ""
    s = str(text)
    for pat in _SYMBOL_PATTERNS:
        m = pat.search(s)
        if m:
            return m.group(1)
    return ""


def standardize_commodity_name(name) -> str:
    """F4 — whitespace collapse + alias map (processor.py:142-171)."""
    if not name:
        return ""
    collapsed = re.sub(r"\s+", " ", str(name).strip())
    return NAME_ALIASES.get(collapsed, collapsed)


def categorize_commodity(name, symbol: str = "") -> str:
    """F5 — keyword classifier (processor.py:173-214).

    Keyword classes in order; fallback on the symbol: contains ``com``
    → 商品, ``cur`` → 货币; else 其他.
    """
    name_l = str(name or "").lower()
    for category, keywords in _CATEGORY_KEYWORDS:
        if any(k in name_l for k in keywords):
            return category
    symbol_l = str(symbol or "").lower()
    if "com" in symbol_l:
        return "商品"
    if "cur" in symbol_l:
        return "货币"
    return "其他"


def derive_change_percent(change_amount, previous_close) -> Optional[float]:
    """F9 — change% = amount/prev_close*100 (pacong/data/models.py:80-84)."""
    if change_amount is None or not previous_close:
        return None
    return change_amount / previous_close * 100.0


def derive_forex_fields(base: str, quote: str, bid, ask) -> dict:
    """F9 — pair/mid/spread derivation (pacong/data/models.py:159-179)."""
    out = {"pair": f"{base}/{quote}"}
    if bid is not None and ask is not None:
        out["mid_price"] = (bid + ask) / 2.0
        out["spread"] = ask - bid
    return out


_HQ_VAR = re.compile(r'var\s+hq_str_([^=\s]+)\s*=\s*"([^"]*)"')


def parse_jsonp_quote(body: str) -> list[dict]:
    """F11 — quote-API JSONP parser (pacong/scrapers/sina_finance.py:171-196).

    Each ``var hq_str_<key>="f0,f1,..."`` line becomes a record; fields
    split on commas; numeric fields default to 0.0 when empty; lines
    with <6 fields are skipped.
    """
    records = []
    for key, payload in _HQ_VAR.findall(body or ""):
        fields = payload.split(",")
        if len(fields) < 6:
            continue

        def num(i: int) -> float:
            try:
                return float(fields[i]) if fields[i] else 0.0
            except ValueError:
                return 0.0

        records.append(
            {
                "quote_key": key,
                "name": fields[0],
                "bid_price": num(1),
                "ask_price": num(2),
                "current_price": num(3),
                "quote_date": fields[4],
                "quote_time": fields[5],
            }
        )
    return records


# ---------------------------------------------------------------- batch forms

def _to_float(s: pd.Series) -> pd.Series:
    """to_numeric via object dtype → always float64. Direct to_numeric on
    a StringDtype series picks nullable Int dtypes for integer-looking
    inputs and RAISES (despite errors="coerce") on mixed valid/invalid
    batches during its safe int cast."""
    return pd.to_numeric(s.astype(object), errors="coerce").astype("float64")


def clean_price_batch(values: pd.Series) -> pd.Series:
    """Vectorized F1 (pandas str kernels; falls back to scalar only for
    the ambiguous lone-comma case)."""
    s = values.astype("string").str.strip().str.replace(_NON_PRICE, "", regex=True)
    has_c = s.str.contains(",", na=False)
    has_d = s.str.contains(".", regex=False, na=False)
    both = has_c & has_d
    if both.any():
        dot_last = s.str.rfind(".") > s.str.rfind(",")
        s = s.mask(both & dot_last, s.str.replace(",", ""))
        s = s.mask(both & ~dot_last, s.str.replace(".", "", regex=False).str.replace(",", "."))
    only_c = has_c & ~has_d
    if only_c.any():
        # reference rule (processor.py:59-61): EXACTLY one comma whose
        # tail is ≤2 CHARS (not necessarily digits) → decimal separator
        decimal_like = only_c & s.str.match(r"^[^,]*,[^,]{0,2}$", na=False)
        s = s.mask(decimal_like, s.str.replace(",", "."))
        s = s.mask(only_c & ~decimal_like, s.str.replace(",", ""))
    return _to_float(s)


def clean_percentage_batch(values: pd.Series) -> pd.Series:
    s = values.astype("string").str.strip().str.replace(_NON_PRICE, "", regex=True).str.replace(",", ".")
    v = _to_float(s)
    return v.mask(v.abs() > 100, v / 100)


def categorize_batch(names: pd.Series, symbols: pd.Series | None = None) -> pd.Series:
    nl = names.fillna("").astype(str).str.lower()
    out = pd.Series("其他", index=names.index, dtype="object")
    if symbols is not None:
        sl = symbols.fillna("").astype(str).str.lower()
        out = out.mask(sl.str.contains("cur"), "货币")
        out = out.mask(sl.str.contains("com"), "商品")
    for category, keywords in reversed(_CATEGORY_KEYWORDS):
        pat = "|".join(re.escape(k) for k in keywords)
        out = out.mask(nl.str.contains(pat, regex=True), category)
    return out
