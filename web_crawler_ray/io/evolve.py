"""Schema-evolution reader: union parquet snapshots whose schemas
drifted (columns added/dropped over time) into one Dataset with the
UNION schema — the data-lake capability that lets a 100-TB corpus keep
its old shards readable after the pipeline adds a column.

Each source reads independently (streaming, column-pruned to what it
actually has); a map-only pass aligns every batch to the target schema
— missing columns filled with a typed default (caller-supplied or
NULL), column order normalized. No shuffle anywhere; the union is a
metadata concatenation of block lists.

Public knowledge: parquet schema merging as in Arrow's
``unify_schemas`` / the Delta/Iceberg "schema evolution on read" rule
(add-column with null backfill). No reference counterpart (the
reference rewrites whole CSV reports; this is the at-scale policy).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def evolved_schema(paths: list[str]) -> pa.Schema:
    """The union schema across snapshot paths, first-seen field order,
    first-seen type winning (conflicting types raise via Arrow's
    unify rule rather than silently coercing)."""
    schemas = [pq.read_schema(_one_file(p)) for p in paths]
    return pa.unify_schemas(schemas, promote_options="permissive")


def _one_file(path: str) -> str:
    import glob
    import os

    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                 recursive=True))
        if not files:
            raise FileNotFoundError(f"no parquet under {path}")
        return files[0]
    return path


def read_evolved(paths: list[str], defaults: dict | None = None,
                 source_col: str | None = None):
    """Read every snapshot in ``paths`` and align to the union schema:
    columns a snapshot lacks are filled with ``defaults[col]`` (or
    null), extra normalization is pure map-side. ``source_col``
    optionally tags each row with its snapshot index (lineage)."""
    defaults = defaults or {}
    target = evolved_schema(paths)
    names = list(target.names)
    empty = target.empty_table().to_pandas()

    out = None
    for i, p in enumerate(paths):
        have = set(pq.read_schema(_one_file(p)).names)

        def align(batch: pd.DataFrame, _i=i, _have=have) -> pd.DataFrame:
            cols = {}
            for c in names:
                if c in batch.columns:
                    cols[c] = batch[c]
                elif c in defaults:
                    cols[c] = pd.Series([defaults[c]] * len(batch),
                                        index=batch.index).astype(empty[c].dtype)
                else:
                    # NULL backfill; integer targets become float64 NaN
                    # (pandas' nullable representation of a null int)
                    dt = empty[c].dtype
                    dt = "float64" if str(dt).startswith("int") else dt
                    cols[c] = pd.Series([None] * len(batch),
                                        index=batch.index, dtype=dt)
            out_b = pd.DataFrame(cols)
            if source_col:
                out_b[source_col] = _i
            return out_b

        ds = rd.read_parquet(p).map_batches(align, batch_format="pandas")
        out = ds if out is None else out.union(ds)
    return out
