"""Spatial operators: grid-bucketed distance self-join.

The 2-D radius self-join ("all pairs of points within distance r") is
the geo sibling of the banded near-dup joins in ``dedup.py``: bucket so
that every qualifying pair is guaranteed co-located, verify exactly
inside the bucket partition, never compare across the corpus. At 100 TB
this is the store-locator / cell-tower / duplicate-POI workload.

Scheme (the classic fixed-grid ghost-zone join): cells of side r. A
pair within distance r always lands in the SAME cell or in 8-adjacent
cells, so each point is emitted once as HOME (its own cell) and 8× as
GHOST (neighbor cells); all candidate pairs form inside one cell
partition. The keep rule — "the HOME endpoint has the smaller id" —
fires for exactly one row pair per qualifying point pair (a point is
home in exactly one cell and ghosts are unique per cell), so the join
needs NO dedup exchange: one co-locating shuffle on the cell key,
in-partition vectorized verify, done.

No reference counterpart (the reference is a scraper); public
knowledge: fixed-grid spatial hashing (Bentley 1975 bucketing
methods), the standard ghost/halo replication of distributed spatial
joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .grouped import grouped_triu, partitioned_apply

# cell coordinates are folded into one int64 key; 2^20 cells per axis
# bounds the domain at ~10^6 · r per side — raise if exceeded, never wrap
_AXIS = 1 << 20


def grid_distance_join(ds, id_col: str, x_col: str, y_col: str,
                       radius: float, num_partitions: int = 32,
                       max_cell_rows: int = 200_000,
                       ndigits: int = 6):
    """All pairs (id_a < id_b) within Euclidean distance ``radius``.

    Shape: the only exchange carries 9 rows per point (home + 8
    ghosts — fixed replication, independent of corpus size); pairs are
    enumerated AND verified inside the cell partition via the same
    size-class ``grouped_triu`` used by the edit join, so nothing
    quadratic ever crosses the wire. Per-cell occupancy is the
    documented partitioning assumption (cell side = r; ``max_cell_rows``
    raises on a degenerate density hotspot instead of silently going
    quadratic — at that point shrink r or pre-salt the hot cell).

    Returns a Dataset of (id_a, id_b, dist:rounded); the distance
    expression tree matches the SQL replay term-for-term so the doubles
    are bit-equal."""
    r = float(radius)

    def emit(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(np.float64)
        y = b[y_col].to_numpy(np.float64)
        ids = b[id_col].to_numpy(np.int64)
        cx = np.floor(x / r).astype(np.int64)
        cy = np.floor(y / r).astype(np.int64)
        if len(cx) and (abs(cx).max() >= _AXIS - 1 or abs(cy).max() >= _AXIS - 1):
            raise ValueError("grid_distance_join: cell coordinate exceeds "
                             "2^20 — domain too wide for this radius")
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pd.DataFrame({
                    "cell": (cx + dx) * (2 * _AXIS) + (cy + dy),
                    id_col: ids, "x": x, "y": y,
                    "home": np.full(len(ids), dx == 0 and dy == 0)}))
        return pd.concat(outs, ignore_index=True)

    def pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values("cell", kind="mergesort")
        ia, ib = grouped_triu(part["cell"].to_numpy(np.int64),
                              max_size=max_cell_rows, raise_on_exceed=True)
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "dist": pd.Series(dtype="float64")})
        if not len(ia):
            return empty
        ids = part[id_col].to_numpy(np.int64)
        home = part["home"].to_numpy(bool)
        # exactly-once rule: the HOME endpoint carries the smaller id
        keep = ((home[ia] & (ids[ia] < ids[ib]))
                | (home[ib] & (ids[ib] < ids[ia])))
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        x = part["x"].to_numpy(np.float64)
        y = part["y"].to_numpy(np.float64)
        dx = x[ia] - x[ib]
        dy = y[ia] - y[ib]
        d2 = dx * dx + dy * dy
        hit = d2 <= r * r
        id_a = np.minimum(ids[ia], ids[ib])[hit]
        id_b = np.maximum(ids[ia], ids[ib])[hit]
        return pd.DataFrame({"id_a": id_a, "id_b": id_b,
                             "dist": sql_round(np.sqrt(d2[hit]), ndigits)})

    cols = ds.select_columns([id_col, x_col, y_col])
    return partitioned_apply(cols.map_batches(emit, batch_format="pandas"),
                             ["cell"], pairs,
                             num_partitions=num_partitions)
