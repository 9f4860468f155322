"""Workbook/spreadsheet source (SURVEY.md §2.1 S4).

Reference semantics (pacong/scrapers/worldbank.py):
- download a workbook (``:60-96``);
- header sniffing: try ``header=0..6`` until a parse yields a frame
  whose first column looks like names and which has ≥2 columns
  (``:98-119``);
- wide→long unpivot: for each data row, emit (name, last non-null
  numeric value, the column label it came from) (``:121-172``);
- drop rows with negative/unparseable prices (``:174-189``).

Engine form: ``ray.data.read_binary_files`` over workbook files →
per-file ``map_batches`` UDF. ``.xlsx`` decoding uses openpyxl when
present and falls back to the stdlib reader in ``io/xlsx_lite.py``
(zip + sheet XML, ECMA-376 subset) otherwise; CSV sheet bytes run the
same sniff/unpivot path.
"""

from __future__ import annotations

import io

import pandas as pd
import pyarrow as pa

from ..functions.cleaning import clean_price_batch
from ..io.xlsx_lite import grid_to_frame, read_xlsx

try:
    import openpyxl  # noqa: F401

    HAVE_XLSX = True
except ImportError:
    HAVE_XLSX = False


def _try_parse(data: bytes, header_row: int) -> pd.DataFrame | None:
    try:
        if data[:4] == b"PK\x03\x04":  # xlsx zip magic
            if HAVE_XLSX:
                return pd.read_excel(io.BytesIO(data), header=header_row)
            # stdlib fallback: first sheet of the workbook, same
            # header=N semantics as read_csv/read_excel
            sheets = read_xlsx(data)
            first = next(iter(sheets.values()))
            return grid_to_frame(first, header_row)
        return pd.read_csv(io.BytesIO(data), header=header_row)
    except Exception:
        return None


def sniff_header(data: bytes, max_header: int = 6) -> tuple[pd.DataFrame | None, int]:
    """Header sniffing (worldbank.py:98-119): first header offset whose
    parse gives ≥2 columns and a mostly-non-numeric first column."""
    for h in range(max_header + 1):
        df = _try_parse(data, h)
        if df is None or df.shape[1] < 2 or df.empty:
            continue
        # reject junk header rows: mostly empty / pandas-"Unnamed"
        # labels (read_csv rejects these via ragged-row ParserErrors;
        # rectangular xlsx grids need the explicit check)
        labels = [str(c) for c in df.columns]
        junk = sum(1 for c in labels
                   if not c.strip() or c.startswith("Unnamed"))
        if junk / len(labels) > 0.5:
            continue
        first = df.iloc[:, 0].astype(str)
        numericish = first.str.fullmatch(r"[\d.,\-]+").mean()
        if numericish < 0.5:
            return df, h
    return None, -1


def unpivot_last_value(df: pd.DataFrame) -> pd.DataFrame:
    """Wide→long (worldbank.py:121-172): per row, the LAST non-null
    parseable value across the value columns + that column's label;
    negative prices dropped. Vectorized: one ``clean_price_batch``
    pass per COLUMN (columns are few, rows many), then an argmax over
    the parsed matrix picks each row's last valid column — no
    ``iterrows``."""
    import numpy as np

    value_cols = list(df.columns[1:])
    if not value_cols or df.empty:
        return pd.DataFrame({"name": pd.Series([], dtype=object),
                             "price": pd.Series([], dtype="float64"),
                             "period": pd.Series([], dtype=object)})
    names = df.iloc[:, 0].astype(str).str.strip()
    name_ok = (names.str.len() > 0) & (names.str.lower() != "nan")

    # parsed values matrix: n_rows × n_value_cols, NaN = unparseable
    parsed = np.column_stack([
        clean_price_batch(df[c]).to_numpy(dtype="float64")
        for c in value_cols
    ])
    valid = ~np.isnan(parsed)
    # index of the LAST valid column per row (max of col-index masked
    # to valid cells; rows with none get -1 and are filtered below)
    col_idx = np.where(valid, np.arange(parsed.shape[1]), -1).max(axis=1)
    safe_idx = np.clip(col_idx, 0, None)
    picked = parsed[np.arange(len(df)), safe_idx]

    keep = name_ok.to_numpy() & (col_idx >= 0) & (picked >= 0)
    labels = np.array([str(c) for c in value_cols], dtype=object)
    return pd.DataFrame({
        "name": names.to_numpy()[keep],
        "price": picked[keep],
        "period": labels[safe_idx[keep]],
    })


class WorkbookExtract:
    """map_batches stage over read_binary_files output
    (columns: ``bytes``, optional ``path``): sniff + unpivot per file."""

    def __init__(self, bytes_col: str = "bytes", path_col: str = "path"):
        self.bytes_col = bytes_col
        self.path_col = path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames = []
        paths = (
            batch[self.path_col].to_pylist()
            if self.path_col in batch.schema.names
            else [""] * batch.num_rows
        )
        for data, path in zip(batch[self.bytes_col].to_pylist(), paths):
            df, header = sniff_header(data)
            if df is None:
                continue
            long = unpivot_last_value(df)
            long["source_file"] = path
            long["header_row"] = header
            frames.append(long)
        if not frames:
            return pa.table(
                {
                    "name": pa.array([], pa.string()),
                    "price": pa.array([], pa.float64()),
                    "period": pa.array([], pa.string()),
                    "source_file": pa.array([], pa.string()),
                    "header_row": pa.array([], pa.int64()),
                }
            )
        return pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False)
