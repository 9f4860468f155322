"""Batch-vectorized Jaro / Jaro–Winkler similarity, pinned to DuckDB's
conventions so SQL replays are value-exact:

* BYTE-based (not codepoint): 'café' vs 'cafe' compares utf-8 bytes.
* Jaro: match window = max(len)/2 - 1 (floor, min 0); greedy
  first-unmatched assignment left-to-right; transpositions = half the
  positional mismatches between the two matched-char sequences.
* Both-empty and one-empty pairs score 0.0 (DuckDB convention — some
  libraries return 1.0 for empty-empty).
* Winkler boost: + min(4, common_byte_prefix) · 0.1 · (1 − jaro),
  applied ONLY when jaro > 0.7 (verified against DuckDB 1.x).

The whole batch is computed with numpy matrix passes — one loop over
CHARACTER POSITIONS (bounded by the longest string), never over pairs;
`tests/test_properties.py` pins equality with DuckDB's scalar
`jaro_winkler_similarity` on randomized inputs.
"""

from __future__ import annotations

import numpy as np


def _pad_bytes(strs) -> tuple[np.ndarray, np.ndarray]:
    """utf-8 encode + pad a string sequence to a (n, Lmax) uint8 matrix
    (pad 0) and a length vector."""
    bs = [s.encode("utf-8") for s in strs]
    ln = np.fromiter((len(b) for b in bs), dtype=np.int64, count=len(bs))
    lmax = int(ln.max()) if len(ln) else 0
    mat = np.zeros((len(bs), max(lmax, 1)), dtype=np.uint8)
    for i, b in enumerate(bs):  # one pass to lay out bytes; O(total bytes)
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return mat, ln


def jaro_winkler_batch(a_strs, b_strs) -> np.ndarray:
    """Jaro–Winkler similarity for aligned pairs (a_strs[i], b_strs[i]),
    DuckDB-exact (see module docstring). Returns float64 scores."""
    A, la = _pad_bytes(a_strs)
    B, lb = _pad_bytes(b_strs)
    n = len(la)
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    L1, L2 = A.shape[1], B.shape[1]

    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    used = np.zeros((n, L2), dtype=bool)
    match_b = np.full((n, L1), -1, dtype=np.int64)
    j_idx = np.arange(L2)

    for i in range(L1):
        act = i < la
        if not act.any():
            break
        lo = np.maximum(i - w, 0)
        hi = np.minimum(i + w + 1, lb)
        cand = ((B == A[:, i: i + 1]) & ~used
                & (j_idx[None, :] >= lo[:, None])
                & (j_idx[None, :] < hi[:, None]) & act[:, None])
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        rows = np.flatnonzero(has)
        used[rows, j[rows]] = True
        match_b[rows, i] = j[rows]

    matched = match_b >= 0
    m = matched.sum(axis=1)

    # transpositions: a-order matched chars vs b-order matched chars
    s1c = np.zeros((n, L1), dtype=np.uint8)
    r1 = matched.cumsum(axis=1) - 1
    rows, cols = np.nonzero(matched)
    s1c[rows, r1[rows, cols]] = B[rows, match_b[rows, cols]]
    s2c = np.zeros((n, L2), dtype=np.uint8)
    r2 = used.cumsum(axis=1) - 1
    rows2, cols2 = np.nonzero(used)
    s2c[rows2, r2[rows2, cols2]] = B[rows2, cols2]
    kmax = min(L1, L2)
    pos = np.arange(kmax)
    diff = (s1c[:, :kmax] != s2c[:, :kmax]) & (pos[None, :] < m[:, None])
    t = diff.sum(axis=1) // 2

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            m > 0,
            (m / la + m / lb + (m - t) / np.maximum(m, 1)) / 3.0,
            0.0)

    pmax = min(4, L1, L2)
    if pmax > 0:
        eq = ((A[:, :pmax] == B[:, :pmax])
              & (np.arange(pmax)[None, :] < np.minimum(la, lb)[:, None]))
        cp = eq.cumprod(axis=1).sum(axis=1)
    else:
        cp = np.zeros(n, dtype=np.int64)
    return np.where(jaro > 0.7, jaro + cp * 0.1 * (1.0 - jaro), jaro)
