"""Join helpers beyond ``Dataset.join`` (SURVEY.md §2.4 J2/J3).

- ``broadcast_lookup``: small-side join as a ``ray.put`` map — zero
  shuffle; the pattern q_customer_geo and the crawl's semi-join fetch
  use inline, exposed as a reusable stage.
- ``semi_join`` / ``anti_join``: membership joins against a key set.
  The right side is reduced to DISTINCT keys first (so the semi join
  can be an inner ``Dataset.join`` without row duplication); anti is a
  left-outer join + null-marker filter. Both sides stream; the only
  driver-side object is the join plan.
"""

from __future__ import annotations

import pandas as pd
import ray

from .grouped import partitioned_drop_duplicates


def broadcast_lookup(ds, mapping: dict, on: str, out_col: str,
                     drop_misses: bool = False):
    """Attach ``out_col = mapping[row[on]]`` via a broadcast dict
    (``ray.put`` once, read per task from the object store). For
    dimension sides that fit in memory — the no-shuffle join."""
    ref = ray.put(mapping)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(ref)
        batch = batch.copy()
        batch[out_col] = batch[on].map(lookup)
        if drop_misses:
            batch = batch[batch[out_col].notna()]
        return batch

    return ds.map_batches(attach, batch_format="pandas")


_MARKER = "__sj_marker"


def _distinct_keys(keys_ds, on: str, num_partitions: int):
    dk = partitioned_drop_duplicates(
        keys_ds.select_columns([on]), [on], num_partitions
    )

    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[_MARKER] = 1
        return batch

    return dk.map_batches(mark, batch_format="pandas")


def semi_join(left, keys_ds, on: str, right_on: str | None = None,
              num_partitions: int = 8):
    """Rows of ``left`` whose ``on`` value appears in ``keys_ds``.
    Right side deduped first, so this is a duplication-free inner hash
    join carrying only the key + a marker."""
    right = _distinct_keys(keys_ds, right_on or on, num_partitions)
    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions,
        on=(on,), right_on=(right_on or on,),
    )
    return joined.drop_columns([_MARKER])


def range_join(left, right, on: str, right_on: str, ts_col: str,
               lo_col: str, hi_col: str, num_partitions: int = 8):
    """Equi-key + interval join: ``left.on == right.right_on AND
    right.lo_col <= left.ts_col <= right.hi_col`` (inclusive both
    ends, SQL BETWEEN). No reference counterpart — a target-side
    addition for event-in-window joins (events within N days of an
    order, prices inside a validity interval).

    Shape: one hash shuffle of each side on the equi-key
    (``Dataset.join``), then a vectorized Arrow range filter per
    batch — the range predicate never forces a second shuffle.
    Partitioning assumption: intermediate cardinality is the EQUI-key
    match count before the range filter, so a skewed equi-key inflates
    a partition exactly like any hash join — salt hot keys upstream if
    one key dominates."""
    import pyarrow.compute as pc

    joined = left.join(
        right, join_type="inner", num_partitions=num_partitions,
        on=(on,), right_on=(right_on,),
    )

    def in_range(batch):
        mask = pc.and_(
            pc.greater_equal(batch[ts_col], batch[lo_col]),
            pc.less_equal(batch[ts_col], batch[hi_col]),
        )
        return batch.filter(mask)

    return joined.map_batches(in_range, batch_format="pyarrow")


def anti_join(left, keys_ds, on: str, right_on: str | None = None,
              num_partitions: int = 8):
    """Rows of ``left`` whose ``on`` value does NOT appear in
    ``keys_ds``: left-outer join against the deduped key set, keep
    marker-null rows."""
    right = _distinct_keys(keys_ds, right_on or on, num_partitions)
    joined = left.join(
        right, join_type="left_outer", num_partitions=num_partitions,
        on=(on,), right_on=(right_on or on,),
    )

    def keep_misses(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch[_MARKER].isna()].drop(columns=[_MARKER])

    return joined.map_batches(keep_misses, batch_format="pandas")
