"""Time-series decomposition operators over the events log (target-side
additions — the reference is batch-only, SURVEY.md §2.10; these serve
the monitoring/forecasting side of a long-running crawl: 'is Tuesday
always slow, or is this drift?').

Everything here is the moments pattern: per-batch partial sums keyed by
(key, calendar bucket), ONE tiny combine, closed-form finish — raw rows
never shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .aggregate import partial_grouped_agg
from .grouped import partitioned_apply


def seasonal_index(ds, key: str, ts_col: str, val_col: str,
                   ndigits: int = 6):
    """Day-of-week seasonal index per key: mean(value | key, dow) /
    mean(value | key), ISO day numbering (Mon=1 … Sun=7, matching
    DuckDB's isodow). Index > 1 ⇒ that weekday runs hot for the key.

    Shape: per-batch (key, dow) partial (n, Σv) — at most 7·keys rows
    per batch — one combine exchange, then a key-sized fold computes
    the per-key base rate and the ratios. Returns
    (key, dow:int64, n:int64, seasonal_idx:float64-rounded)."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        dow = pd.to_datetime(b[ts_col]).dt.dayofweek.to_numpy() + 1
        return (pd.DataFrame({key: b[key].to_numpy(), "dow": dow,
                              "n": np.ones(len(b), dtype=np.int64),
                              "s": b[val_col].to_numpy(np.float64)})
                .groupby([key, "dow"], sort=False)
                .agg(n=("n", "sum"), s=("s", "sum")).reset_index())

    g = partial_grouped_agg(
        ds.map_batches(partials, batch_format="pandas"), [key, "dow"],
        {"n": ("sum", "n"), "s": ("sum", "s")})

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        # one task per key partition; ≤ 7 rows per key
        tot = p.groupby(key, sort=False).agg(tn=("n", "sum"),
                                             ts=("s", "sum"))
        oavg = (tot["ts"] / tot["tn"]).rename("oavg")
        p = p.merge(oavg, left_on=key, right_index=True)
        return pd.DataFrame({
            key: p[key], "dow": p["dow"].astype("int64"),
            "n": p["n"].astype("int64"),
            "seasonal_idx": sql_round(
                (p["s"] / p["n"]) / p["oavg"], ndigits)})

    return partitioned_apply(g, [key], finish)
