"""SQL-compatible rounding.

numpy/pandas ``round`` is banker's rounding (half-to-even); DuckDB's
``round(x, n)`` on DOUBLE rounds half AWAY from zero
(std::round(x*10^n)/10^n). Any oracle-compared rounded column must use
this helper on the engine side or halfway cases flip the value hash
(observed: sum=84870194.505 → pandas 84870194.50, DuckDB 84870194.51).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sql_round(values, ndigits: int):
    """Round half away from zero, mirroring DuckDB's double rounding."""
    power = 10.0 ** ndigits
    if isinstance(values, pd.Series):
        arr = values.to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.copysign(np.floor(np.abs(arr) * power + 0.5), arr) / power
        return pd.Series(out, index=values.index)
    arr = np.asarray(values, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(arr) * power + 0.5), arr) / power
    return float(out) if np.isscalar(values) or out.ndim == 0 else out


def money_cents(values) -> np.ndarray:
    """Exact int64 cents of a 2-decimal money column (prices, balances,
    discounts-as-hundredths). Sums of these are ORDER-EXACT, unlike
    float sums — use for any aggregate whose rounded value feeds an
    equality compare or a value hash. Bound: int64 holds ±9.2e18
    cents ≈ ±$92 quadrillion per aggregate group."""
    arr = np.asarray(values, dtype=np.float64)
    return np.rint(arr * 100.0).astype(np.int64)


def revenue_e4(price, discount) -> np.ndarray:
    """Exact int64 revenue `price*(1-discount)` in 1e-4-dollar units:
    cents(price) × (100 − hundredths(discount)). The float product has
    4 decimals, so its sums can land EXACTLY on a half-cent rounding
    boundary (observed: a 378060.515 group hashing as .51 or .52 by
    summation order); the integer form can't. Divide the summed result
    by 1e4 (then round 2) — the SQL replay is
    `sum(CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100) AS
    BIGINT))) / 10000.0`. Bound: ±$9.2e14 per group."""
    return money_cents(price) * (100 - money_cents(discount))


def discount_e4(price, discount) -> np.ndarray:
    """Exact int64 `price*discount` in 1e-4-dollar units (TPC-H Q6's
    forgone-discount form); same contract as :func:`revenue_e4`."""
    return money_cents(price) * money_cents(discount)
