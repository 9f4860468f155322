"""2-D Pareto skyline (maximize both coordinates) — the classic
distributed-skyline shape: the skyline of a union IS the skyline of the
per-block skylines, so each batch prunes itself to its own (tiny)
maximal set before anything moves, and the global pass runs over the
candidate union only (Börzsönyi 2001's block-nested-loop recast as
map-side pruning + one small final task).

Target-side addition (no reference counterpart): what a 'best price ×
best size' / 'best quality × best freshness' curation gate consumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _skyline_points(p: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Skyline of DISTINCT points, vectorized: sort (x desc, y desc);
    keep a point iff its y strictly exceeds the running max of all
    earlier y — equality means an earlier point with ≥x dominates."""
    p = p.sort_values([x, y], ascending=False, kind="mergesort")
    ys = p[y].to_numpy()
    runmax = np.concatenate([[-np.inf], np.maximum.accumulate(ys)[:-1]])
    return p[ys > runmax]


def skyline2d(ds, x: str, y: str, count_col: str = "n"):
    """Global 2-D max-max skyline over a Dataset with multiplicity:
    returns (x, y, count_col) for each non-dominated DISTINCT point,
    counting every input row that sits on it.

    Shape: per-batch distinct+count and batch-skyline pruning (a point
    dominated inside one batch is dominated globally, and a globally
    maximal point is maximal in every batch it appears in, so partial
    counts survive exactly); one (x, y)-keyed combine of the tiny
    candidate partials; one single-task final skyline over the
    candidate union."""
    from .aggregate import partial_grouped_agg

    def batch_candidates(b: pd.DataFrame) -> pd.DataFrame:
        pts = (b.groupby([x, y], sort=False).size().rename(count_col)
               .reset_index())
        return _skyline_points(pts, x, y)

    cand = partial_grouped_agg(
        ds.map_batches(batch_candidates, batch_format="pandas"),
        [x, y], {count_col: ("sum", count_col)})

    def final(b: pd.DataFrame) -> pd.DataFrame:
        return _skyline_points(b, x, y).reset_index(drop=True)

    # candidate union is tiny by construction — one task, ONE batch
    # (batch_size=None: the whole block) finishes it
    return cand.repartition(1).map_batches(final, batch_format="pandas",
                                           batch_size=None)
