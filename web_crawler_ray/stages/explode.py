"""Vectorized explode/unnest of a list column (the general form of the
crawl's outlink explode, SURVEY §2.12: one parent row → one row per
list element, other columns repeated).

Zero Python per row: ``pyarrow.ListArray`` offsets drive a ``np.repeat``
of the parent columns and a ``flatten()`` of the values — both C
kernels — so the stage streams batch-by-batch at Arrow speed and never
changes the partitioning (each output row stays in its parent's block).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def explode_column(ds, list_col: str, out_col: str | None = None,
                   index_col: str | None = None):
    """Unnest ``list_col``: emit one row per element with the remaining
    columns repeated. ``index_col`` adds the 1-based position within the
    parent list (SQL ``unnest ... WITH ORDINALITY``). Parents with empty
    or null lists produce no rows (SQL unnest semantics)."""
    out_name = out_col or list_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[list_col]
        if col.num_chunks != 1:
            col = col.combine_chunks()
        arr = col.chunk(0) if isinstance(col, pa.ChunkedArray) else col
        if isinstance(arr, pa.LargeListArray):
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
        else:
            arr = arr.cast(pa.list_(arr.type.value_type))
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
        # null lists have garbage offsets spans — zero them via the mask
        lengths = offsets[1:] - offsets[:-1]
        if arr.null_count:
            valid = ~np.asarray(arr.is_null())
            lengths = np.where(valid, lengths, 0)
        values = arr.flatten()  # drops null/empty parents' contribution
        parents = {
            name: batch[name].take(pa.array(np.repeat(np.arange(batch.num_rows), lengths)))
            for name in batch.column_names if name != list_col
        }
        out = pa.table({**parents, out_name: values})
        if index_col is not None:
            total = int(lengths.sum())
            starts = np.concatenate([[0], np.cumsum(lengths[:-1])]) if len(lengths) else lengths
            idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lengths) + 1
            out = out.append_column(index_col, pa.array(idx, pa.int64()))
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_col: str = "variable", val_col: str = "value"):
    """Unpivot (SQL UNPIVOT / pandas melt): one output row per
    (input row × value column), with the column name in ``var_col``.
    Pure map-side reshape — zero shuffle, batch-local ``pd.melt``
    (C-level tile/repeat), output rows = input rows × len(value_cols).
    The generic form of the workbook unpivot in ``sources/tabular``."""
    import pandas as pd

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.melt(batch[id_cols + value_cols], id_vars=id_cols,
                       value_vars=value_cols, var_name=var_col,
                       value_name=val_col)

    return ds.map_batches(fn, batch_format="pandas")
