"""Timestamp parse/format helpers (SURVEY.md §2.8 F10).

Reference formats: ISO parse via ``datetime.fromisoformat``
(pacong/data/models.py:35-39), ``%Y%m%d_%H%M%S`` output filenames
(core/base_scraper.py:169), ``%Y-%m-%d %H:%M:%S`` report timestamps
(scrapers/generic_scraper.py:417-420). The engine never reads the wall
clock inside operators — run timestamps are passed in explicitly so
every pipeline is replayable (SURVEY §2.2 M8).
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd

FILENAME_FMT = "%Y%m%d_%H%M%S"
REPORT_FMT = "%Y-%m-%d %H:%M:%S"


def parse_iso(value) -> datetime | None:
    """ISO-8601 parse, None on failure (models.py:35-39 semantics)."""
    if isinstance(value, datetime):
        return value
    try:
        return datetime.fromisoformat(str(value))
    except (ValueError, TypeError):
        return None


def filename_stamp(ts: datetime) -> str:
    return ts.strftime(FILENAME_FMT)


def report_stamp(ts: datetime) -> str:
    return ts.strftime(REPORT_FMT)


def parse_iso_batch(values: pd.Series) -> pd.Series:
    """Vectorized ISO parse → datetime64, NaT on failure."""
    return pd.to_datetime(values, errors="coerce", format="ISO8601")
