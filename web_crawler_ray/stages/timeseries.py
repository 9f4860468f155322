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


def _daily_partials(ds, ts_col: str, val_col: str):
    """(day_index, n, Σv) partials combined with one tiny exchange.
    day_index = days since 1970-01-01 of the timestamp's DATE."""

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        day = (pd.to_datetime(b[ts_col]).to_numpy()
               .astype("datetime64[D]").astype("int64"))
        return (pd.DataFrame({"day": day, "n": np.ones(len(b), np.int64),
                              "s": b[val_col].to_numpy(np.float64)})
                .groupby("day", sort=False)
                .agg(n=("n", "sum"), s=("s", "sum")).reset_index())

    return partial_grouped_agg(
        ds.map_batches(partials, batch_format="pandas"), ["day"],
        {"n": ("sum", "n"), "s": ("sum", "s")})


def autocorrelation(ds, ts_col: str, val_col: str, max_lag: int = 7,
                    ndigits: int = 6) -> pd.DataFrame:
    """Lag-k autocorrelation of the DAILY-SUM series of ``val_col``
    (Box–Jenkins sample ACF — 'does today predict next Tuesday?').
    Pairing is by CALENDAR day arithmetic (day, day+k both present),
    so gaps in the series drop pairs instead of misaligning them; the
    mean and the denominator Σ(x−x̄)² run over all present days.

    Shape: raw rows collapse to (day, Σv) partials map-side, ONE tiny
    combine exchange, and the ACF itself folds over the CALENDAR-
    BOUNDED day series on the driver (a century of days is 36,525
    rows — never corpus-sized). Returns
    (lag:int64, n_pairs:int64, acf:float64-rounded)."""
    days = _daily_partials(ds, ts_col, val_col).to_pandas()  # calendar-bounded
    days = days.sort_values("day", kind="mergesort")
    idx = days["day"].to_numpy(np.int64)
    x = days["s"].to_numpy(np.float64)
    mu = x.sum() / len(x)
    c = x - mu
    den = float((c * c).sum())
    pos = {int(d): i for i, d in enumerate(idx)}
    lags, pairs, acf = [], [], []
    for k in range(1, max_lag + 1):
        ia = np.array([i for i, d in enumerate(idx) if int(d) + k in pos],
                      dtype=np.int64)
        ib = np.array([pos[int(idx[i]) + k] for i in ia], dtype=np.int64)
        lags.append(k)
        pairs.append(len(ia))
        acf.append(float((c[ia] * c[ib]).sum()) / den if den else np.nan)
    return pd.DataFrame({"lag": pd.Series(lags, dtype="int64"),
                         "n_pairs": pd.Series(pairs, dtype="int64"),
                         "acf": sql_round(np.asarray(acf), ndigits)})


def gap_fill_daily(ds, key: str, ts_col: str, val_col: str,
                   ndigits: int = 2) -> pd.DataFrame:
    """Densify the per-key daily-sum series over the GLOBAL
    [min_day, max_day] range — every key gets every day, missing days
    filled with n=0 / value 0.0 (the 'no orders is a data point'
    prerequisite for any rolling/seasonal model downstream).

    Shape: the only exchange carries (key, day) partials; the dense
    frame is built in one fold over the keys×calendar-bounded grid
    (3 statuses × a decade = ~11k rows — never corpus-sized). Returns
    (key, day:int64, n:int64, total:float64-rounded)."""

    from .grouped import partitioned_apply

    def partials(b: pd.DataFrame) -> pd.DataFrame:
        day = (pd.to_datetime(b[ts_col]).to_numpy()
               .astype("datetime64[D]").astype("int64"))
        return (pd.DataFrame({key: b[key].to_numpy(), "day": day,
                              "n": np.ones(len(b), np.int64),
                              "s": b[val_col].to_numpy(np.float64)})
                .groupby([key, "day"], sort=False)
                .agg(n=("n", "sum"), s=("s", "sum")).reset_index())

    def combine(p: pd.DataFrame) -> pd.DataFrame:
        # (key, day) cardinality is keys×calendar (~10⁴) — past the
        # native-groupby comfort zone, so the combine is a coarse-hash
        # partition fold of the per-batch partials
        return (p.groupby([key, "day"], sort=False)[["n", "s"]].sum()
                .reset_index())

    g = partitioned_apply(
        ds.map_batches(partials, batch_format="pandas"), [key, "day"],
        combine).to_pandas()
    lo, hi = int(g["day"].min()), int(g["day"].max())
    keys = np.sort(g[key].unique())
    grid = pd.MultiIndex.from_product([keys, np.arange(lo, hi + 1)],
                                      names=[key, "day"])
    dense = (g.set_index([key, "day"]).reindex(grid).reset_index())
    return pd.DataFrame({
        key: dense[key], "day": dense["day"].astype("int64"),
        "n": dense["n"].fillna(0).astype("int64"),
        "total": sql_round(dense["s"].fillna(0.0), ndigits)})


def seasonal_decompose_daily(ds, ts_col: str, val_col: str,
                             ndigits: int = 6) -> pd.DataFrame:
    """Classical additive decomposition of the daily-sum series:
    trend = centered 7-row moving average (SQL partial-window
    convention at the edges), seasonal = per-ISO-dow mean of the
    detrended series, resid = the rest — the 'is Tuesday slow or is
    this drift?' readout with the drift separated out (the
    decomposition whose seasonal factor `seasonal_index` reports in
    ratio form).

    Shape: raw rows fold to (day, Σv) partials map-side, ONE tiny
    combine, and the decomposition is a vectorized fold over the
    CALENDAR-BOUNDED day series (cumsum-difference moving average —
    no per-day loop). The ROWS-based window runs over the PRESENT
    days (the dense-calendar contract; run gap_fill_daily first for
    gapped series). Returns
    (day:int64, x, trend, seasonal, resid — rounded)."""
    days = _daily_partials(ds, ts_col, val_col).to_pandas()
    days = days.sort_values("day", kind="mergesort").reset_index(drop=True)
    d = days["day"].to_numpy(np.int64)
    x = days["s"].to_numpy(np.float64)
    n = len(x)
    c = np.concatenate(([0.0], np.cumsum(x)))
    i = np.arange(n)
    lo = np.maximum(0, i - 3)
    hi = np.minimum(n - 1, i + 3)
    trend = (c[hi + 1] - c[lo]) / (hi - lo + 1)
    detr = x - trend
    dow = (d + 3) % 7 + 1  # 1970-01-01 is a Thursday -> isodow 4
    f = pd.DataFrame({"dow": dow, "detr": detr})
    seas_map = f.groupby("dow")["detr"].mean()
    seas = seas_map.reindex(dow).to_numpy(np.float64)
    return pd.DataFrame({
        "day": d, "x": sql_round(x, 2),
        "trend": sql_round(trend, ndigits),
        "seasonal": sql_round(seas, ndigits),
        "resid": sql_round(detr - seas, ndigits)})
