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
