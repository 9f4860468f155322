"""Windowed aggregates and as-of joins (custom operators per the
engine blueprint — the reference is batch-only, SURVEY.md §2.10, so
these are target-side additions built from map_batches + groupby
compositions; the events table is treated as an ordered, partitioned
log: partition by key, sort by ts within partition).
"""

from __future__ import annotations

import pandas as pd

from .aggregate import partial_grouped_agg
from .grouped import grouped_apply


def tumbling_window_agg(ds, ts_col: str, key_cols: list[str], freq: str,
                        aggs: dict[str, tuple[str, str | None]]):
    """Tumbling windows as a derived window column + partial grouped
    aggregation (no event-time machinery needed for a batch log: the
    window id is a pure function of ts). ``freq`` is a pandas floor
    frequency ('D', 'H', ...); the window label is emitted as a string
    so SQL oracles (date_trunc) compare exactly."""

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["window"] = pd.to_datetime(batch[ts_col]).dt.floor(freq).dt.strftime(
            "%Y-%m-%d" if freq == "D" else "%Y-%m-%d %H:%M:%S"
        )
        return batch

    return partial_grouped_agg(
        ds.map_batches(add_window, batch_format="pandas"), [*key_cols, "window"], aggs
    )


def asof_join_latest(ds, key_col: str, ts_col: str, right_filter, right_cols: dict[str, str],
                     tie_col: str):
    """Per-key as-of join against a filtered subset of the SAME log:
    for each row, attach the most recent earlier-or-equal row matching
    ``right_filter`` (pandas mask fn) for the same key. Inner semantics
    (rows with no match are dropped) to mirror DuckDB's ASOF JOIN.

    Shape: one shuffle on the key (coarse-partitioned), then
    ``pd.merge_asof`` per key group over ts-sorted frames. Right-side
    ties on ts break toward max ``tie_col`` (sorted last)."""

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        left = group.sort_values([ts_col, tie_col], kind="mergesort")
        right = group[right_filter(group)].sort_values([ts_col, tie_col], kind="mergesort")
        out_schema = {new: pd.Series(dtype=group[src].dtype) for new, src in right_cols.items()}
        if right.empty:
            return pd.DataFrame({**{c: pd.Series(dtype=left[c].dtype) for c in left.columns},
                                 **out_schema})
        right_view = pd.DataFrame({ts_col: right[ts_col].values})
        for new, src in right_cols.items():
            right_view[new] = right[src].values
        merged = pd.merge_asof(
            left, right_view, on=ts_col, direction="backward", allow_exact_matches=True,
        )
        first_out = next(iter(right_cols))
        return merged[merged[first_out].notna()]

    return grouped_apply(ds, [key_col], per_key)
