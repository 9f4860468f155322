"""Coarse-partitioned grouped apply — the scale-safe replacement for
``ds.groupby(high_cardinality_key).map_groups(fn)``.

Ray Data's ``map_groups`` launches one Python call per GROUP; with
per-URL / per-content-hash / per-LSH-bucket keys that is one call per
row and the stage collapses to Python overhead. The fix: shuffle on a
coarse partition key (stable row-hash % P), then inside each of the P
partitions run a pandas groupby over the true key — P vectorized tasks
instead of millions of per-group tasks, same shuffle volume, identical
results for any per-group pure ``fn``.
"""

from __future__ import annotations

import pandas as pd


def _stable_pk(df: pd.DataFrame, keys: list[str], num_partitions: int) -> pd.Series:
    h = pd.util.hash_pandas_object(df[keys], index=False)  # deterministic, process-stable
    return (h % num_partitions).astype("int64")


def _maybe_coalesce(ds, n_rows_hint: int | None, max_rows: int = 2_000_000,
                    blocks: int = 16):
    """Consolidate a KNOWN-small dataset into few blocks before the
    groupby shuffle: Ray's sort launches one map + one reduce task per
    block, and dozens of near-empty blocks cost more in task overhead
    than the data moves. Unknown or large inputs keep natural blocks."""
    if n_rows_hint is not None and n_rows_hint <= max_rows:
        return ds.repartition(blocks)
    return ds


def partitioned_apply(ds, keys: list[str], partition_fn, num_partitions: int = 32,
                      n_rows_hint: int | None = None, pre_combine=None):
    """One shuffle on a coarse hash of ``keys``, then ``partition_fn``
    runs ONCE per partition over all of its key groups (every row of a
    key group is guaranteed co-located). Use this — with a vectorized
    ``partition_fn`` (sort + drop_duplicates / groupby-agg) — instead of
    ``grouped_apply`` whenever the per-group reduction is expressible in
    pandas/numpy: at 10^8 distinct keys a per-group Python call is the
    bottleneck, one pass per partition is not.

    ``pre_combine`` (optional, ``df -> df``) runs on each input batch
    BEFORE the shuffle — the map-side combiner. For reductions where a
    batch-local pass can only shrink the input without changing the
    final answer (drop_duplicates with a winner-preserving sort,
    partial counts), this caps shuffle volume at the per-batch-distinct
    count instead of the raw row count."""

    def add_pk(batch: pd.DataFrame) -> pd.DataFrame:
        if pre_combine is not None:
            batch = pre_combine(batch)
        batch = batch.copy()
        batch["__pk"] = _stable_pk(batch, keys, num_partitions)
        return batch

    return (
        _maybe_coalesce(ds.map_batches(add_pk, batch_format="pandas"), n_rows_hint)
        .groupby("__pk")
        .map_groups(
            lambda p: partition_fn(p.drop(columns="__pk")), batch_format="pandas"
        )
    )


def grouped_apply(ds, keys: list[str], fn, num_partitions: int = 32,
                  n_rows_hint: int | None = None):
    """Apply ``fn(group_df) -> df`` per distinct ``keys`` group, with one
    shuffle on a coarse hash of the keys. ``fn`` must not depend on
    cross-group state. Groups are processed in sorted key order within a
    partition (determinism). For reductions expressible as vectorized
    frame ops prefer :func:`partitioned_apply` (no per-group Python)."""

    def apply_partition(part: pd.DataFrame) -> pd.DataFrame:
        outs = [fn(g) for _, g in part.groupby(keys, sort=True, dropna=False)]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            return fn(part.iloc[0:0])  # typed-empty from the fn itself
        return pd.concat(outs, ignore_index=True)

    return partitioned_apply(ds, keys, apply_partition, num_partitions, n_rows_hint)


def partitioned_drop_duplicates(ds, keys: list[str], num_partitions: int = 32,
                                sort_keys: list[str] | None = None,
                                ascending: list[bool] | None = None,
                                n_rows_hint: int | None = None,
                                pre_dedup: bool = False):
    """Exact distinct-by-keys with a deterministic winner per group:
    rows are sorted by ``sort_keys`` (default: the keys) inside each
    hash partition and the first row per key group wins. One shuffle,
    fully vectorized.

    ``pre_dedup=True`` additionally runs the same winner-selection on
    each input batch BEFORE the shuffle (map-side combiner): the global
    winner survives batch-local selection because winner-of-winners
    under a fixed sort order is the global winner, so results are
    identical while the shuffle carries at most one row per (batch,
    key). Enable it when duplicates are frequent and the non-key
    columns of tied rows are identical (or there are no ties)."""

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        sk = sort_keys or keys
        asc = ascending or [True] * len(sk)
        part = part.sort_values(sk, ascending=asc, kind="mergesort")
        return part.drop_duplicates(subset=keys, keep="first")

    return partitioned_apply(ds, keys, dedup, num_partitions, n_rows_hint,
                             pre_combine=dedup if pre_dedup else None)


def grouped_triu(sorted_keys, max_size=None, raise_on_exceed: bool = False):
    """All within-group (i < j) index pairs of a SORTED key array,
    vectorized by group-size class: one np.unique for the boundaries,
    then one triu broadcast per DISTINCT group size (a handful), never
    a Python loop over the groups themselves. Returns (ia, ib) global
    index arrays into the sorted layout.

    ``max_size`` bounds the quadratic fan-out per group: groups past it
    are skipped (LSH-bucket style) or, with ``raise_on_exceed``, abort
    loudly (co-occurrence style — a silent g² explosion is a bug)."""
    import numpy as np

    empty = np.array([], dtype=np.int64)
    if not len(sorted_keys):
        return empty, empty
    _, starts, counts = np.unique(sorted_keys, return_index=True,
                                  return_counts=True)
    keep = counts >= 2
    if max_size is not None:
        over = counts > max_size
        if raise_on_exceed and bool(over.any()):
            raise ValueError(f"group of size {int(counts[over].max())} "
                             f"exceeds max_group={max_size}")
        keep &= ~over
    starts, counts = starts[keep], counts[keep]
    ia_all, ib_all = [], []
    for s in np.unique(counts):
        gs = starts[counts == s]
        la, lb = np.triu_indices(int(s), 1)
        ia_all.append((gs[:, None] + la[None, :]).ravel())
        ib_all.append((gs[:, None] + lb[None, :]).ravel())
    if not ia_all:
        return empty, empty
    return np.concatenate(ia_all), np.concatenate(ib_all)


def grouped_agg_wide(ds, keys: list[str],
                     spec: dict[str, tuple[str, str]],
                     num_partitions: int = 32,
                     n_rows_hint: int | None = None):
    """Multi-key named aggregates for HIGH-cardinality keys (order
    grain, user grain past ~10^3, (partkey, suppkey) pairs, …):
    batch-local pre-combine, ONE coarse hash exchange, vectorized
    per-partition groupby-agg. The native ``groupby().aggregate()``
    path (what ``partial_grouped_agg`` finishes with) degrades ~100×
    past ~10^3-10^4 distinct keys — measured 70 s → 3 s on the sf0.1
    (partkey, suppkey) distinct fold. ``spec``: {out: (fn, col)} with
    fn ∈ {"sum", "min", "max"} (all idempotent under re-combine; for
    counts, sum a ones column). Dtypes are preserved (int64 sums stay
    int64 — callers rely on this for exact-money combines)."""
    aggs = {out: (col, fn) for out, (fn, col) in spec.items()}
    # the pre-combine emits under the OUTPUT names, so the partition
    # fold re-aggregates those columns with the same functions
    re_aggs = {out: (out, fn) for out, (fn, _col) in spec.items()}

    def pre(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(keys, sort=False).agg(**aggs).reset_index()

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        return p.groupby(keys, sort=True).agg(**re_aggs).reset_index()

    return partitioned_apply(ds, keys, fold, num_partitions, n_rows_hint,
                             pre_combine=pre)


def grouped_sum_wide(ds, keys: list[str], sum_cols: list[str],
                     num_partitions: int = 32,
                     n_rows_hint: int | None = None):
    """Sum-only convenience wrapper over :func:`grouped_agg_wide`."""
    return grouped_agg_wide(ds, keys,
                            {c: ("sum", c) for c in sum_cols},
                            num_partitions, n_rows_hint)
