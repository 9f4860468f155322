"""Sketch-based approximate aggregates — the 100-TB scale path where
the exact operators' one-shuffle cost is still too much.

``stages/aggregate.distinct_count`` is exact but must move one row per
distinct (key, value) pair through a shuffle; at 10^10 distinct pairs
that is terabytes of exchange. The HyperLogLog path here moves a fixed
``m``-byte register block per (key, input block) — shuffle volume is
O(keys × blocks), independent of cardinality — at a ~1.04/sqrt(m)
relative error (~1.6% at p=12). Standard HLL per Flajolet et al. 2007
(public algorithm); hashing is ``pandas.util.hash_pandas_object``
(process-stable, deterministic), so results are bit-reproducible
across runs and parallelism levels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .grouped import partitioned_apply

_U64 = np.uint64


def _leading_zeros64(w: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros over uint64 (bisection — exact,
    no float log2 round-off at the 2^53 mantissa edge)."""
    n = np.zeros(w.shape, dtype=np.int64)
    w = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = w >= (_U64(1) << _U64(64 - shift))
        n = np.where(mask, n, n + shift)
        w = np.where(mask, w, w << _U64(shift))
    return np.where(w == 0, 64, n)


def hll_partial(df: pd.DataFrame, key: str, col: str, p: int) -> pd.DataFrame:
    """One HLL register block per distinct key in this batch:
    (key, regs: bytes of length 2^p). rho uses the low 64-p bits,
    register index the top p bits of the 64-bit row hash."""
    m = 1 << p
    if not len(df):
        return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                             "regs": pd.Series([], dtype=object)})
    h = pd.util.hash_pandas_object(df[col], index=False).to_numpy(dtype=_U64)
    idx = (h >> _U64(64 - p)).astype(np.int64)
    w = h << _U64(p)  # remaining 64-p bits, top-aligned
    rho = np.minimum(_leading_zeros64(w), 64 - p).astype(np.uint8) + 1
    codes, keys = pd.factorize(df[key], sort=True)
    regs = np.zeros((len(keys), m), dtype=np.uint8)
    np.maximum.at(regs, (codes, idx), rho)
    return pd.DataFrame({key: keys, "regs": [r.tobytes() for r in regs]})


def _hll_estimate(regs: np.ndarray) -> int:
    m = regs.shape[0]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


def hll_distinct(ds, key: str, col: str, p: int = 12,
                 num_partitions: int = 32, n_rows_hint: int | None = None):
    """Approximate COUNT(DISTINCT col) per key via HyperLogLog.

    Shape: per-batch register blocks (map side, one row per key per
    batch) → one tiny shuffle on the key → per-partition register max
    + estimate. The only data crossing the wire is keys × blocks × 2^p
    bytes — cardinality-independent, the property that makes this the
    scale path past :func:`..aggregate.distinct_count`'s exact
    one-row-per-distinct-pair shuffle."""
    partials = ds.map_batches(
        lambda b: hll_partial(b, key, col, p), batch_format="pandas"
    )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_est = [], []
        for k, g in part.groupby(key, sort=True, dropna=False):
            stacked = np.frombuffer(b"".join(g["regs"]), dtype=np.uint8).reshape(
                len(g), -1
            )
            out_keys.append(k)
            out_est.append(_hll_estimate(stacked.max(axis=0)))
        return pd.DataFrame({key: out_keys,
                             "n_distinct_approx": pd.Series(out_est, dtype="int64")})

    return partitioned_apply(partials, [key], merge, num_partitions,
                             n_rows_hint=n_rows_hint)
