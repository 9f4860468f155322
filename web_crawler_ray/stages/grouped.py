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


def grouped_apply(ds, keys: list[str], fn, num_partitions: int = 32):
    """Apply ``fn(group_df) -> df`` per distinct ``keys`` group, with one
    shuffle on a coarse hash of the keys. ``fn`` must not depend on
    cross-group state. Groups are processed in sorted key order within a
    partition (determinism)."""

    def add_pk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__pk"] = _stable_pk(batch, keys, num_partitions)
        return batch

    def apply_partition(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns="__pk")
        outs = [fn(g) for _, g in part.groupby(keys, sort=True, dropna=False)]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            return fn(part.iloc[0:0])  # typed-empty from the fn itself
        return pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(add_pk, batch_format="pandas")
        .groupby("__pk")
        .map_groups(apply_partition, batch_format="pandas")
    )


def partitioned_drop_duplicates(ds, keys: list[str], num_partitions: int = 32,
                                sort_keys: list[str] | None = None,
                                ascending: list[bool] | None = None):
    """Exact distinct-by-keys with a deterministic winner per group:
    rows are sorted by ``sort_keys`` (default: the keys) inside each
    hash partition and the first row per key group wins. One shuffle,
    fully vectorized."""

    def add_pk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["__pk"] = _stable_pk(batch, keys, num_partitions)
        return batch

    def dedup(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop(columns="__pk")
        sk = sort_keys or keys
        asc = ascending or [True] * len(sk)
        part = part.sort_values(sk, ascending=asc, kind="mergesort")
        return part.drop_duplicates(subset=keys, keep="first")

    return (
        ds.map_batches(add_pk, batch_format="pandas")
        .groupby("__pk")
        .map_groups(dedup, batch_format="pandas")
    )
