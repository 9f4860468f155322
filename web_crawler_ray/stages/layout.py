"""Data-layout operators: Z-order (Morton) interleaving for
multi-column locality.

At 100 TB the dominant cost of a selective scan is how many files a
two-column predicate has to open. Hash or single-column range layout
clusters ONE key; a Z-order key interleaves the bits of two keys so a
range partition on the z-value keeps BOTH columns' ranges narrow per
partition — the Delta/Iceberg ``OPTIMIZE ZORDER BY`` trick, expressed
here as plain columns so ``repartition``/``write_parquet`` on the key
range gives the pruned layout.

No reference counterpart (the reference is a scraper); public
knowledge: Morton 1966, the standard magic-number bit-spread. The
z-value arithmetic is pure integer ops replayed bit-for-bit by the
DuckDB oracle (list-comprehension over bit positions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .aggregate import partial_grouped_agg


def _spread16(x: np.ndarray, bits: int = 16) -> np.ndarray:
    """Spread the low ``bits`` (≤ 16) bits of each int64 so bit i lands
    at bit 2i (Morton magic numbers), vectorized."""
    x = x.astype(np.int64) & ((1 << bits) - 1)
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def zorder_key(ds, col_a: str, col_b: str, num_partitions: int = 16,
               bits: int = 16, out_col: str = "zkey", part_col: str = "zpart"):
    """Append the 2·bits-wide Morton z-value of (col_a low ``bits``
    bits, col_b low ``bits`` bits) and its range-partition id (top
    log2(P) bits of the z-value). Map-only; downstream ``repartition``
    / partitioned write on ``part_col`` produces the clustered layout.
    ``num_partitions`` must be a power of two (the partition id is a
    bit shift, so the SQL replay is exact integer arithmetic)."""
    p = int(num_partitions)
    if p & (p - 1) or p <= 0:
        raise ValueError(f"num_partitions must be a power of two, got {p}")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16], got {bits}")
    shift = 2 * bits - (p.bit_length() - 1)  # z in [0, 2^(2·bits))

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[col_a].to_numpy()
        b = batch[col_b].to_numpy()
        z = _spread16(a, bits) | (_spread16(b, bits) << 1)
        batch = batch.copy()
        batch[out_col] = z.astype("int64")
        batch[part_col] = (z >> shift).astype("int64")
        return batch

    return ds.map_batches(fn, batch_format="pandas")


def zorder_layout_stats(ds, col_a: str, col_b: str, num_partitions: int = 16,
                        bits: int = 16):
    """Layout-quality report: per z-range partition, row count plus the
    min/max of BOTH source columns — narrow per-partition ranges on
    both axes is exactly what makes the layout prunable for either
    predicate. One map pass + a P-row combine (partial agg per batch;
    the shuffle carries ≤ P rows per batch)."""
    keyed = zorder_key(ds, col_a, col_b, num_partitions, bits=bits)
    return partial_grouped_agg(
        keyed.select_columns(["zpart", "zkey", col_a, col_b]),
        ["zpart"],
        {
            "n_rows": ("count", None),
            "z_min": ("min", "zkey"),
            "z_max": ("max", "zkey"),
            "a_min": ("min", col_a),
            "a_max": ("max", col_a),
            "b_min": ("min", col_b),
            "b_max": ("max", col_b),
        },
    )


def zonemap_prune(path: str, col: str, lo, hi) -> tuple[list[str], int]:
    """File-level zone-map pruning from parquet FOOTER statistics: keep
    only the files whose row-group [min, max] range on ``col``
    intersects [lo, hi]. The footers are the zone map — nothing extra
    is built or maintained; a range-clustered layout (sort or z-order
    before writing) is what makes the pruning selective. Returns
    (kept_paths, total_files) so callers can assert/report the prune
    rate. Driver-side cost: one footer read per file (KBs each), never
    any data pages."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))
    kept = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        keep = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                keep = True  # no stats -> cannot prune this file
                break
            if not (st.max < lo or st.min > hi):
                keep = True
                break
        if keep:
            kept.append(f)
    return kept, len(files)


def zonemap_scan(path: str, col: str, lo, hi, columns: list[str] | None = None):
    """Range scan that opens ONLY the files the zone map admits, then
    applies the exact predicate per batch (footer stats prune at file
    granularity; the residual filter restores exactness). On a
    range-clustered table this reads O(selectivity) of the bytes — the
    same discipline as the IVF index's partition-pruned read, for
    arbitrary range predicates."""
    import ray.data as rd

    kept, _total = zonemap_prune(path, col, lo, hi)
    if not kept:
        raise ValueError(f"zone map pruned every file of {path} for "
                         f"[{lo}, {hi}] — nothing to scan")
    read_cols = None
    if columns is not None:
        read_cols = sorted(set(columns) | {col})

    def exact(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col]
        out = batch[(v >= lo) & (v <= hi)]
        return out[columns] if columns is not None else out

    return rd.read_parquet(kept, columns=read_cols).map_batches(
        exact, batch_format="pandas")


def compaction_plan(ds, order_col: str, size_col: str, target: int,
                    bucket_width: int = 4096, num_partitions: int = 32):
    """Sorted-fill compaction plan: walk the files in ``order_col``
    order, assign each to the output bin where its EXCLUSIVE byte
    offset lands (bin = offset // target) — the deterministic
    small-file→target-size rewrite plan every lakehouse table service
    runs (Iceberg/Delta OPTIMIZE), replayable as a SQL window cumsum.

    The global prefix sum is the bucket-bases pattern (cf. packing):
    (1) per-batch partial sums keyed by the key-RANGE bucket
    ``order_col // bucket_width`` fold into per-bucket totals — ONE
    tiny combine; (2) the driver turns bucket totals into exclusive
    bucket bases (bucket-count-sized, broadcast once); (3) one
    co-locating exchange on the bucket key, a vectorized in-bucket
    sort + cumsum against the base, and per-bin partials fold through
    a final bin-cardinality combine. Sizes never shuffle twice and the
    driver never sees a row. Returns (bin, n_files:int64,
    bytes:int64)."""
    import ray

    from .grouped import partitioned_apply

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        k = b[order_col].to_numpy(np.int64)
        return pd.DataFrame({"bkt": k // bucket_width, "k": k,
                             "sz": b[size_col].to_numpy(np.int64)})

    tagged = ds.select_columns([order_col, size_col]).map_batches(
        tag, batch_format="pandas")
    totals = partial_grouped_agg(tagged, ["bkt"], {"sz": ("sum", "sz")}
                                 ).to_pandas().sort_values("bkt")
    bases = dict(zip(
        totals["bkt"],
        np.concatenate(([0], np.cumsum(totals["sz"].to_numpy(np.int64))[:-1]))))
    bref = ray.put(bases)  # bucket-count-sized broadcast

    def bins(part: pd.DataFrame) -> pd.DataFrame:
        bmap = ray.get(bref)
        part = part.sort_values(["bkt", "k"], kind="mergesort")
        sz = part["sz"].to_numpy(np.int64)
        # per-bucket exclusive cumsum + the bucket's global base
        cum = np.cumsum(sz) - sz
        bkt = part["bkt"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], bkt[1:] != bkt[:-1])))
        local0 = np.repeat(cum[starts], np.diff(np.append(starts, len(bkt))))
        offset = cum - local0 + part["bkt"].map(bmap).to_numpy(np.int64)
        f = pd.DataFrame({"bin": offset // int(target), "sz": sz})
        g = f.groupby("bin", sort=False).agg(n_files=("sz", "size"),
                                             bytes=("sz", "sum"))
        return g.reset_index()

    parts = partitioned_apply(tagged, ["bkt"], bins,
                              num_partitions=num_partitions)
    out = partial_grouped_agg(parts, ["bin"],
                              {"n_files": ("sum", "n_files"),
                               "bytes": ("sum", "bytes")}).to_pandas()
    out = out.sort_values("bin", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({"bin": out["bin"].astype("int64"),
                         "n_files": out["n_files"].astype("int64"),
                         "bytes": out["bytes"].astype("int64")})


def partition_checksum(ds, key_col: str, n_buckets: int = 16,
                       num_partitions: int = 8) -> pd.DataFrame:
    """Per-bucket integrity fingerprint (row count, XOR of a key-derived
    31-bit fingerprint, key sum) — the cheap order-independent checksum
    a reshard/migration audit compares before and after moving 100 TB
    (cf. ``rendezvous`` reshard audit): XOR and sum are commutative, so
    the fingerprint is layout-invariant and any dropped/duplicated row
    flips it.

        fp     = (key · 2654435761) mod (2³¹ − 1)     (Knuth multiplicative)
        bucket = key mod n_buckets

    Shape: per-batch partial (bucket, n, xor, sum) — the exchange
    carries ≤ n_buckets rows per batch; a bucket-partitioned fold XORs
    the partials. Integer-exact, no rounding anywhere. Returns
    (bucket, n_rows:int64, xor_fp:int64, key_sum:int64)."""
    from .grouped import partitioned_apply

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b[key_col].to_numpy(np.int64)
        fp = (k * 2654435761) % 2147483647
        f = pd.DataFrame({"bucket": k % n_buckets, "fp": fp, "k": k})
        g = f.groupby("bucket", sort=False).agg(
            n_rows=("fp", "size"),
            xor_fp=("fp", lambda s: np.bitwise_xor.reduce(s.to_numpy())),
            key_sum=("k", "sum"))
        return g.reset_index()

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("bucket", sort=False).agg(
            n_rows=("n_rows", "sum"),
            xor_fp=("xor_fp", lambda s: np.bitwise_xor.reduce(s.to_numpy())),
            key_sum=("key_sum", "sum"))
        g = g.reset_index()
        return g.astype({"bucket": "int64", "n_rows": "int64",
                         "xor_fp": "int64", "key_sum": "int64"})

    return partitioned_apply(
        ds.select_columns([key_col]).map_batches(partial,
                                                 batch_format="pandas"),
        ["bucket"], fold, num_partitions=num_partitions)
