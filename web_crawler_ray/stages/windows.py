"""Windowed aggregates and as-of joins (custom operators per the
engine blueprint — the reference is batch-only, SURVEY.md §2.10, so
these are target-side additions built from map_batches + groupby
compositions; the events table is treated as an ordered, partitioned
log: partition by key, sort by ts within partition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .aggregate import partial_grouped_agg
from .grouped import partitioned_apply


def tumbling_window_agg(ds, ts_col: str, key_cols: list[str], freq: str,
                        aggs: dict[str, tuple[str, str | None]]):
    """Tumbling windows as a derived window column + partial grouped
    aggregation (no event-time machinery needed for a batch log: the
    window id is a pure function of ts). ``freq`` is a pandas floor
    frequency ('D', 'H', ...); the window label is emitted as a string
    so SQL oracles (date_trunc) compare exactly."""

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["window"] = pd.to_datetime(batch[ts_col]).dt.floor(freq).dt.strftime(
            "%Y-%m-%d" if freq == "D" else "%Y-%m-%d %H:%M:%S"
        )
        return batch

    return partial_grouped_agg(
        ds.map_batches(add_window, batch_format="pandas"), [*key_cols, "window"], aggs
    )


def hopping_window_agg(ds, ts_col: str, stride_us: int, width_us: int,
                       aggs: dict[str, tuple[str, str | None]]):
    """Hopping (overlapping) event-time windows: width W = m·stride S,
    so each event belongs to exactly m windows whose starts are
    ``(ts//S − j)·S`` for j = 0..m−1. The fan-out happens map-side with
    ``np.repeat``/``np.tile`` (no per-row loop), partial aggregation
    folds it before the one small shuffle, so the exchange carries
    O(windows) rows however large the log — the streaming-metrics shape
    (URLs/sec over sliding horizons per the crawl monitor, reference
    capability analogue: pacong run statistics)."""
    if width_us % stride_us:
        raise ValueError("width must be a multiple of stride")
    m = width_us // stride_us
    val_cols = sorted({c for _, c in aggs.values() if c})

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = ts // stride_us
        starts = (np.repeat(base, m) - np.tile(np.arange(m, dtype=np.int64),
                                               len(base))) * stride_us
        out = {"w_start": starts}
        for c in val_cols:
            out[c] = np.repeat(batch[c].to_numpy(), m)
        return pd.DataFrame(out)

    return partial_grouped_agg(
        ds.map_batches(fan_out, batch_format="pandas"), ["w_start"], aggs
    )


def hopping_window_distinct(ds, ts_col: str, key_col: str, stride_us: int,
                            width_us: int, num_partitions: int = 32):
    """Exact distinct-key count per hopping window (unique users/URLs
    per sliding horizon). Same fan-out as :func:`hopping_window_agg`,
    but the pre-combine dedups (window, key) pairs batch-locally so the
    window-partitioned exchange carries at most one row per distinct
    pair per batch; the per-partition count is a vectorized
    drop_duplicates + groupby-size. For cardinalities where exact pairs
    are too heavy, the HLL path (``stages/sketch.py``) composes with
    the same fan-out."""
    from .grouped import partitioned_apply

    if width_us % stride_us:
        raise ValueError("width must be a multiple of stride")
    m = width_us // stride_us

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        base = ts // stride_us
        starts = (np.repeat(base, m) - np.tile(np.arange(m, dtype=np.int64),
                                               len(base))) * stride_us
        return pd.DataFrame({
            "w_start": starts,
            key_col: np.repeat(batch[key_col].to_numpy(), m),
        }).drop_duplicates()

    def dedup(p: pd.DataFrame) -> pd.DataFrame:
        return p.drop_duplicates()

    def count_part(p: pd.DataFrame) -> pd.DataFrame:
        g = (p.drop_duplicates().groupby("w_start", sort=True)
             .size().rename("n_distinct").reset_index())
        g["n_distinct"] = g["n_distinct"].astype("int64")
        return g

    pairs = ds.select_columns([ts_col, key_col]).map_batches(
        fan_out, batch_format="pandas")
    return partitioned_apply(pairs, ["w_start"], count_part,
                             num_partitions, pre_combine=dedup)


def sequence_islands(ds, id_col: str, bucket_shift: int = 12,
                     num_partitions: int = 32):
    """Islands-and-gaps over a sparse integer id sequence (the data-
    completeness audit: which id runs are present, where are the
    holes). Classic SQL: island = id − row_number() OVER (ORDER BY id);
    distributed WITHOUT a global sort via the range-bucket two-pass
    (the pack_sequences trick): buckets ``id >> shift`` are themselves
    ordered, so per-bucket counts give exclusive global-rank bases
    (driver prefix-sums one int per 2^shift ids), and the in-bucket
    rank is a vectorized sort position. Islands spanning bucket
    boundaries merge in the final combine because their island key
    (id − global_rank) is identical on both sides. Emits one row per
    island: (start_id, end_id, n)."""
    import ray

    from .grouped import partitioned_apply

    ids_only = ds.select_columns([id_col])

    def add_bucket(p: pd.DataFrame) -> pd.DataFrame:
        p = p.copy()
        p["__bucket"] = p[id_col].to_numpy().astype(np.int64) >> bucket_shift
        return p

    def bucket_pre(p: pd.DataFrame) -> pd.DataFrame:
        p = add_bucket(p)
        return (p.groupby("__bucket", sort=False)[id_col].count()
                .rename("n").reset_index())

    def bucket_sum(p: pd.DataFrame) -> pd.DataFrame:
        return (p.groupby("__bucket", sort=True)["n"].sum()
                .rename("n").reset_index())

    parts = partitioned_apply(ids_only.map_batches(bucket_pre,
                                                   batch_format="pandas"),
                              ["__bucket"], bucket_sum, num_partitions)
    acc = None
    for b in parts.iter_batches(batch_format="pandas"):
        s = b.groupby("__bucket")["n"].sum()
        acc = s if acc is None else acc.add(s, fill_value=0)
    if acc is None or not len(acc):
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "start_id": pd.Series([], dtype="int64"),
            "end_id": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64")}))
    acc = acc.sort_index().astype(np.int64)
    bases = acc.cumsum().shift(fill_value=0).astype(np.int64)
    base_ref = ray.put((bases.index.to_numpy(np.int64),
                        bases.to_numpy(np.int64)))

    def islands(p: pd.DataFrame) -> pd.DataFrame:
        # runs per BUCKET-PARTITION (co-located below), so each bucket's
        # rows are all present and the in-bucket cumcount is its true
        # intra-bucket rank
        p = p.sort_values(["__bucket", id_col], kind="mergesort")
        ids = p[id_col].to_numpy(np.int64)
        buckets = p["__bucket"].to_numpy(np.int64)
        intra = p.groupby("__bucket", sort=False).cumcount().to_numpy(
            np.int64)
        bk, bv = ray.get(base_ref)
        rank = intra + bv[np.searchsorted(bk, buckets)] + 1  # 1-based
        isl = ids - rank
        g = pd.DataFrame({"isl": isl, id_col: ids}).groupby(
            "isl", sort=True)[id_col].agg(["min", "max", "count"])
        return pd.DataFrame({"isl": g.index.to_numpy(),
                             "start_id": g["min"].to_numpy(),
                             "end_id": g["max"].to_numpy(),
                             "n": g["count"].to_numpy().astype("int64")})

    def merge(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("isl", sort=True).agg(
            start_id=("start_id", "min"), end_id=("end_id", "max"),
            n=("n", "sum"))
        return g.reset_index(drop=True).astype(
            {"start_id": "int64", "end_id": "int64", "n": "int64"})

    keyed = partitioned_apply(
        ids_only.map_batches(add_bucket, batch_format="pandas"),
        ["__bucket"], islands, num_partitions)
    return partitioned_apply(keyed, ["isl"], merge, num_partitions)


def rank_transform(ds, col: str, tie_col: str, out_col: str = "pct_rank",
                   num_partitions: int = 32, ndigits: int = 6):
    """Global rank / quantile transform (the ML rank-normalization
    step): every row gets its exact global percent rank
    ``(rank − 1)/(n − 1)`` under the total order (col, tie_col) —
    WITHOUT a global sort. Value buckets ``floor(col)`` are themselves
    ordered, so per-bucket counts give exclusive rank bases (driver
    prefix-sums one int per distinct integer band) and the in-bucket
    rank is a vectorized sort position after bucket co-location — the
    same two-pass shape as :func:`sequence_islands`. Rows shuffle once,
    carrying (col, tie) only."""
    import ray

    from .grouped import partitioned_apply

    src = ds.select_columns([col, tie_col])

    def add_bucket(p: pd.DataFrame) -> pd.DataFrame:
        p = p.copy()
        p["__bucket"] = np.floor(p[col].to_numpy(np.float64)).astype(np.int64)
        return p

    def bucket_pre(p: pd.DataFrame) -> pd.DataFrame:
        p = add_bucket(p)
        return (p.groupby("__bucket", sort=False)[col].count()
                .rename("n").reset_index())

    def bucket_sum(p: pd.DataFrame) -> pd.DataFrame:
        return (p.groupby("__bucket", sort=True)["n"].sum()
                .rename("n").reset_index())

    parts = partitioned_apply(src.map_batches(bucket_pre,
                                              batch_format="pandas"),
                              ["__bucket"], bucket_sum, num_partitions)
    acc = None
    for b in parts.iter_batches(batch_format="pandas"):
        s = b.groupby("__bucket")["n"].sum()
        acc = s if acc is None else acc.add(s, fill_value=0)
    acc = acc.sort_index().astype(np.int64)
    n_total = int(acc.sum())
    bases = acc.cumsum().shift(fill_value=0).astype(np.int64)
    base_ref = ray.put((bases.index.to_numpy(np.int64),
                        bases.to_numpy(np.int64)))

    def rank_part(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values(["__bucket", col, tie_col], kind="mergesort")
        buckets = p["__bucket"].to_numpy(np.int64)
        intra = p.groupby("__bucket", sort=False).cumcount().to_numpy(
            np.int64)
        bk, bv = ray.get(base_ref)
        rank = intra + bv[np.searchsorted(bk, buckets)] + 1
        out = p.drop(columns="__bucket").copy()
        out[out_col] = sql_round((rank - 1) / max(n_total - 1, 1), ndigits)
        return out

    keyed = src.map_batches(add_bucket, batch_format="pandas")
    return partitioned_apply(keyed, ["__bucket"], rank_part,
                             num_partitions)


def lookback_count(ds, key: str, ts_col: str, horizon_us: int,
                   out_col: str = "n_prev", num_partitions: int = 32,
                   n_rows_hint: int | None = None):
    """Per-row trailing-horizon event count: for each row, how many
    same-key rows have ts in [ts − horizon, ts] — SQL ``RANGE BETWEEN
    <horizon> PRECEDING AND CURRENT ROW`` semantics (peers at equal ts
    all count, so the result is tie-order independent). The
    velocity/rate-limit feature of fraud and crawl-politeness stacks.

    One key-partitioned exchange; inside a partition ALL groups are
    handled by two vectorized searchsorted calls on a single combined
    array (each group's timestamps shifted to a disjoint virtual range
    — no per-group Python loop)."""
    from .grouped import partitioned_apply

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col], kind="mergesort")
        ts = p[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        codes = pd.factorize(p[key], use_na_sentinel=False)[0].astype(np.int64)
        span = (ts.max() - ts.min() + horizon_us + 2) if len(ts) else 1
        virt = (ts - (ts.min() if len(ts) else 0)) + codes * span
        r = np.searchsorted(virt, virt, side="right")
        lo = np.searchsorted(virt, virt - horizon_us, side="left")
        out = p.copy()
        out[out_col] = (r - lo).astype("int64")
        return out

    return partitioned_apply(ds, [key], per_partition, num_partitions,
                             n_rows_hint=n_rows_hint)


def asof_join_latest(ds, key_col: str, ts_col: str, right_filter, right_cols: dict[str, str],
                     tie_col: str, n_rows_hint: int | None = None):
    """Per-key as-of join against a filtered subset of the SAME log:
    for each row, attach the most recent earlier-or-equal row matching
    ``right_filter`` (pandas mask fn) for the same key. Inner semantics
    (rows with no match are dropped) to mirror DuckDB's ASOF JOIN.

    Shape: one shuffle on the key (coarse-partitioned), then
    ``pd.merge_asof`` per key group over ts-sorted frames. Right-side
    ties on ts break toward max ``tie_col`` (sorted last)."""

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        # ONE merge_asof per partition with by=key (C kernel across all
        # key groups at once); ties on ts resolve to the LAST right row
        # in (ts, tie) sort order = max tie, same as the per-key form
        left = part.sort_values([ts_col, tie_col], kind="mergesort")
        right = part[right_filter(part)].sort_values([ts_col, tie_col], kind="mergesort")
        out_schema = {new: pd.Series(dtype=part[src].dtype) for new, src in right_cols.items()}
        if right.empty:
            return pd.DataFrame({**{c: pd.Series(dtype=left[c].dtype) for c in left.columns},
                                 **out_schema})
        right_view = pd.DataFrame({key_col: right[key_col].values,
                                   ts_col: right[ts_col].values})
        for new, src in right_cols.items():
            right_view[new] = right[src].values
        merged = pd.merge_asof(
            left, right_view, on=ts_col, by=key_col,
            direction="backward", allow_exact_matches=True,
        )
        first_out = next(iter(right_cols))
        return merged[merged[first_out].notna()]

    return partitioned_apply(ds, [key_col], per_partition, n_rows_hint=n_rows_hint)


def group_quantile_disc(ds, key: str, col: str, qs: dict[str, float],
                        n_rows_hint: int | None = None):
    """Per-key exact discrete quantiles (SQL quantile_disc semantics:
    sorted ascending, element at index ceil(q*n)-1 — probed against
    DuckDB). Returns one row per key with one column per entry in
    ``qs`` ({out_col: q}).

    Partitioning assumption: one key's values fit in a single task
    (coarse hash-partitioned grouped apply) — right for bounded-
    cardinality keys like event_type/status. For high-cardinality or
    giant groups, switch to a sort + per-group offset selection."""
    import numpy as np

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 **{out: pd.Series(dtype="float64") for out in qs}})
        p = p.sort_values([key, col], kind="mergesort")
        keys_arr = p[key].to_numpy()
        v = p[col].to_numpy()
        change = np.concatenate([[True], keys_arr[1:] != keys_arr[:-1]])
        starts = np.nonzero(change)[0]
        n = np.diff(np.concatenate([starts, [len(v)]]))
        row = {key: keys_arr[starts]}
        for out, q in qs.items():
            idx = starts + np.maximum(0, np.ceil(q * n).astype(np.int64) - 1)
            row[out] = v[idx].astype("float64")
        return pd.DataFrame(row)

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def group_quantile_cont(ds, key: str, col: str, qs: dict[str, float],
                        ndigits: int = 6, n_rows_hint: int | None = None):
    """Per-key INTERPOLATED quantiles (SQL quantile_cont semantics:
    linear interpolation at rank q*(n-1), 0-based over the ascending
    sort). Same partitioning shape and assumption as
    :func:`group_quantile_disc`."""
    import numpy as np

    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 **{out: pd.Series(dtype="float64") for out in qs}})
        p = p.sort_values([key, col], kind="mergesort")
        keys_arr = p[key].to_numpy()
        v = p[col].to_numpy().astype(np.float64)
        change = np.concatenate([[True], keys_arr[1:] != keys_arr[:-1]])
        starts = np.nonzero(change)[0]
        n = np.diff(np.concatenate([starts, [len(v)]]))
        row = {key: keys_arr[starts]}
        for out, q in qs.items():
            pos = q * (n - 1)
            lo = np.floor(pos).astype(np.int64)
            hi = np.ceil(pos).astype(np.int64)
            frac = pos - lo
            vlo = v[starts + lo]
            # lo + (hi - lo)*frac, the same FP expression DuckDB's
            # quantile_cont evaluates (algebraic rearrangements round
            # differently)
            val = vlo + (v[starts + hi] - vlo) * frac
            row[out] = sql_round(pd.Series(val), ndigits).to_numpy()
        return pd.DataFrame(row)

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def lag_delta(ds, key: str, ts_col: str, val_col: str, tie_col: str,
              ndigits: int = 2, n_rows_hint: int | None = None):
    """Window row_number + lag-delta per key: rows ordered by
    (ts, tie) within each key get rn = row_number() and
    delta = value - lag(value); the first row of each key (no lag) is
    dropped so the output is NULL-free. Coarse hash-partitioned on the
    key — scales with key cardinality like any PARTITION BY."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort")
        g = p.groupby(key, sort=False)
        out = p.copy()
        out["rn"] = (g.cumcount() + 1).astype("int64")
        out["delta"] = sql_round(out[val_col] - g[val_col].shift(1), ndigits)
        return out[out["rn"] > 1]

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def cumulative_sum(ds, key: str, ts_col: str, val_col: str, tie_col: str,
                   out_col: str = "cum", ndigits: int = 2, n_rows_hint: int | None = None):
    """Running SUM() OVER (PARTITION BY key ORDER BY ts, tie): rows keep
    their identity and gain a cumulative column. Sequential adds in
    order, matching the SQL window's left-to-right running sum. Coarse
    hash-partitioned on the key."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort").copy()
        p[out_col] = sql_round(p.groupby(key, sort=False)[val_col].cumsum(), ndigits)
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def rolling_agg(ds, key: str, ts_col: str, val_col: str, tie_col: str,
                window: int, out_col: str = "roll_avg", ndigits: int = 2,
                n_rows_hint: int | None = None):
    """Moving average per key: AVG(val) OVER (PARTITION BY key ORDER BY
    ts, tie ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW). Computed
    as a C-level pandas ``groupby().rolling()`` over (ts, tie)-sorted
    rows — one sort + one rolling pass per partition, no per-group
    Python. Coarse hash-partitioned on the key like any PARTITION BY."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort").reset_index(drop=True)
        roll = (
            p.groupby(key, sort=False)[val_col]
            .rolling(window, min_periods=1)
            .mean()
            .reset_index(level=0, drop=True)
        )
        p[out_col] = sql_round(roll, ndigits)
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def group_rank(ds, key: str, val_col: str, tie_col: str, k: int | None = None,
               n_rows_hint: int | None = None):
    """row_number() and dense_rank() OVER (PARTITION BY key ORDER BY
    val DESC, tie ASC), optionally keeping only rn <= k (SQL QUALIFY).
    One sort + cumcount/rank C kernels per partition; dense_rank ties
    are on exact ``val_col`` equality, same doubles both engines see."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, val_col, tie_col],
                          ascending=[True, False, True], kind="mergesort").copy()
        g = p.groupby(key, sort=False)
        p["rn"] = (g.cumcount() + 1).astype("int64")
        p["dr"] = g[val_col].rank(method="dense", ascending=False).astype("int64")
        if k is not None:
            p = p[p["rn"] <= k]
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def ntile(ds, key: str, val_col: str, tie_col: str, n_buckets: int,
          out_col: str = "tile", descending: bool = True,
          n_rows_hint: int | None = None):
    """ntile(n) OVER (PARTITION BY key ORDER BY val [DESC], tie) with
    SQL bucket sizing: the first ``n mod b`` buckets get ``ceil(n/b)``
    rows, the rest ``floor(n/b)`` — the same rule DuckDB/ANSI use.
    Vectorized: one sort per partition, bucket ids from the in-group
    row index by closed-form arithmetic (no per-group Python). Coarse
    hash-partitioned on the key like any PARTITION BY."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, val_col, tie_col],
                          ascending=[True, not descending, True],
                          kind="mergesort").copy()
        g = p.groupby(key, sort=False)
        i = g.cumcount().to_numpy()                      # 0-based in-group idx
        n = g[val_col].transform("size").to_numpy()      # group size per row
        q, r = n // n_buckets, n % n_buckets             # floor size, big buckets
        big_span = r * (q + 1)                           # rows covered by big buckets
        in_big = i < big_span
        tile_big = i // np.maximum(q + 1, 1)
        tile_small = r + (i - big_span) // np.maximum(q, 1)
        p[out_col] = (np.where(in_big, tile_big, tile_small) + 1).astype("int64")
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def ratio_to_report(ds, key: str, val_col: str, out_col: str = "share",
                    ndigits: int = 6, n_rows_hint: int | None = None):
    """value / SUM(value) OVER (PARTITION BY key) — the share-of-total
    window. One C transform per coarse partition; rounded at fixed
    precision so per-partition sum order can't flip the oracle hash."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        # sort before summing: shuffle arrival order varies run to run,
        # and a float sum in varying order can flip the rounded digit
        p = p.sort_values([key, val_col], kind="mergesort").copy()
        tot = p.groupby(key, sort=False)[val_col].transform("sum")
        p[out_col] = sql_round(p[val_col] / tot, ndigits)
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def rank_metrics(ds, key: str, val_col: str, tie_col: str,
                 descending: bool = True, n_rows_hint: int | None = None):
    """rank(), percent_rank(), cume_dist() OVER (PARTITION BY key ORDER
    BY val [DESC]): ties on exact ``val_col`` equality; pr =
    (rank−1)/(n−1) with 0 for single-row groups (SQL convention), cd =
    peers-rank-max/n. All three are exact integer-ratio doubles — IEEE
    division of the same ints both engines see — so no rounding is
    needed for oracle parity. C rank kernels per coarse partition."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, val_col, tie_col],
                          ascending=[True, not descending, True],
                          kind="mergesort").copy()
        g = p.groupby(key, sort=False)
        rmin = g[val_col].rank(method="min", ascending=not descending)
        rmax = g[val_col].rank(method="max", ascending=not descending)
        n = g[val_col].transform("size").astype("float64")
        p["rk"] = rmin.astype("int64")
        p["pr"] = np.where(n > 1, (rmin - 1.0) / (n - 1.0), 0.0)
        p["cd"] = (rmax / n).astype("float64")
        return p

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def group_first_last(ds, key: str, ts_col: str, tie_col: str, val_col: str,
                     n_rows_hint: int | None = None):
    """first_value/last_value per key over (ts, tie) order, plus the
    group size — SQL ``first(val ORDER BY ts, tie)`` / ``last(...)``.
    No arithmetic on the values (exact stored doubles pass through),
    one sort + groupby-first/last C kernels per coarse partition."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort")
        return (p.groupby(key, sort=True)
                .agg(first_v=(val_col, "first"), last_v=(val_col, "last"),
                     n=(val_col, "size"))
                .reset_index()
                .astype({"n": "int64"}))

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def sessionize(ds, key: str, ts_col: str, tie_col: str, gap_ms: int,
               aggs: bool = True, n_rows_hint: int | None = None):
    """Gap-based sessionization: within each key, rows ordered by
    (ts, tie) start a new session when the gap to the previous row
    exceeds ``gap_ms``. Returns per-session aggregates (n_events,
    start/end epoch-us) — the log-processing staple for training-data
    pipelines. Coarse hash-partitioned on the key like any
    PARTITION BY."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort")
        ts = pd.to_datetime(p[ts_col])
        keys_arr = p[key].to_numpy()
        new_key = pd.Series(
            [True] + list(keys_arr[1:] != keys_arr[:-1]), index=p.index
        ) if len(p) else pd.Series(dtype=bool)
        # a key's first row always breaks, so cross-key ts diffs are inert
        brk = new_key | (ts.diff() > pd.Timedelta(milliseconds=gap_ms))
        run = brk.cumsum().astype("int64")
        base = run.where(new_key).ffill().astype("int64")
        session_id = run - base + 1
        out = p.assign(session_id=session_id,
                       __us=ts.astype("datetime64[us]").astype("int64"))
        if not aggs:
            return out.drop(columns="__us")
        res = (
            out.groupby([key, "session_id"], sort=True)
            .agg(n_events=("session_id", "size"), start_us=("__us", "min"),
                 end_us=("__us", "max"))
            .reset_index()
        )
        return res[[key, "session_id", "n_events", "start_us", "end_us"]]

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def window_dedup(ds, key_col: str, ts_col: str, width_us: int,
                 tie_col: str, num_partitions: int = 32):
    """Streaming-style windowed dedup: within each (key, tumbling
    width_us window) keep only the FIRST row (min ts, then min
    ``tie_col``) — the at-most-once-per-key-per-window throttle
    (alert suppression, per-user event sampling, crawl re-fetch
    suppression). Emits the surviving rows plus their ``w_start``.

    Shape: a batch-local winner pre-combine caps shuffle volume at one
    row per (batch, key, window); one co-locating shuffle; vectorized
    sort + drop_duplicates per partition — no per-group Python."""
    from .grouped import partitioned_apply

    def add_window(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        ts = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        batch["w_start"] = (ts // width_us) * width_us
        return (batch.sort_values([key_col, "w_start", ts_col, tie_col],
                                  kind="mergesort")
                .drop_duplicates(subset=[key_col, "w_start"]))

    def first_per_window(part: pd.DataFrame) -> pd.DataFrame:
        return (part.sort_values([key_col, "w_start", ts_col, tie_col],
                                 kind="mergesort")
                .drop_duplicates(subset=[key_col, "w_start"])
                .reset_index(drop=True))

    return partitioned_apply(
        ds.map_batches(add_window, batch_format="pandas"),
        [key_col, "w_start"], first_per_window,
        num_partitions=num_partitions)


def late_events(ds, key: str, order_col: str, ts_col: str,
                lateness_us: int, n_rows_hint: int | None = None):
    """Watermark-based late-event flagging — the stream-processing
    admission rule (Flink/Beam semantics) applied to a replayed log:
    within each ``key``, rows arrive in ``order_col`` order and the
    watermark is the running max event-time seen over STRICTLY EARLIER
    arrivals minus ``lateness_us``; a row whose event time falls below
    the watermark is late (a first arrival is never late). Target-side
    addition (the reference is batch-only, SURVEY.md §2.10); what an
    out-of-orderness audit or a dead-letter routing policy consumes.

    Shape: one coarse hash shuffle on ``key`` (PARTITION BY), then a
    vectorized sort + grouped cummax/shift per partition — no per-group
    Python, no driver materialization. Returns the input rows plus an
    int64 ``late`` flag; callers aggregate downstream."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, order_col], kind="mergesort")
        us = p[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        p = p.assign(__us=us)
        g = p.groupby(key, sort=False)["__us"]
        prev_max = g.cummax().groupby(p[key], sort=False).shift(1)
        late = (prev_max - float(lateness_us) > p["__us"]).fillna(False)
        return p.assign(late=late.astype("int64")).drop(columns="__us")

    return partitioned_apply(ds, [key], per_partition,
                             n_rows_hint=n_rows_hint)


def interval_union(ds, key: str, start_col: str, end_col: str,
                   n_rows_hint: int | None = None):
    """Per-key union length of a set of [start, end] intervals
    (gaps-and-islands): overlapping or touching intervals merge, and
    each key reports its merged-interval count and total covered
    length. The classic coverage reduction (user active time, crawl
    window coverage, sensor uptime). Target-side addition.

    Shape: one coarse hash shuffle on ``key``, then a single
    vectorized sweep per partition (sort + grouped cummax + island
    cumsum + one groupby-agg); output is one row per key."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, start_col, end_col], kind="mergesort")
        g_end = p.groupby(key, sort=False)[end_col]
        prev_max = g_end.cummax().groupby(p[key], sort=False).shift(1)
        new_island = prev_max.isna() | (p[start_col] > prev_max)
        island = new_island.cumsum()  # globally increasing — per-key safe
        m = (p.assign(__island=island)
             .groupby([key, "__island"], sort=True)
             .agg(__s=(start_col, "min"), __e=(end_col, "max"))
             .reset_index())
        m["__len"] = m["__e"] - m["__s"]
        out = (m.groupby(key, sort=True)
               .agg(n_intervals=("__island", "size"), covered=("__len", "sum"))
               .reset_index())
        out["n_intervals"] = out["n_intervals"].astype("int64")
        return out

    return partitioned_apply(ds, [key], per_partition,
                             n_rows_hint=n_rows_hint)


def scd2_versions(ds, key: str, ts_col: str, tie_col: str, attr_col: str):
    """Slowly-changing-dimension type-2 builder: collapse an event log
    into per-key attribute VERSIONS — a new version starts whenever the
    attribute differs from the previous row (ordered by ts, tie), with
    [valid_from, valid_to) microsecond validity and an open (NaN)
    valid_to on the current version. The dimension-table shape every
    warehouse CDC pipeline emits.

    Shape: one key exchange, then a single vectorized pass per
    partition (grouped shift/cumsum + one groupby-agg + one shift for
    valid_to). Returns (key, version:int64, attr, valid_from:int64,
    valid_to:float64-with-NaN — matching a nullable-BIGINT SQL
    replay)."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort")
        us = p[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        p = p.assign(__us=us)
        prev = p.groupby(key, sort=False)[attr_col].shift(1)
        chg = (prev.isna() | (prev != p[attr_col])).astype("int64")
        ver = chg.groupby(p[key], sort=False).cumsum()
        g = (p.assign(__ver=ver)
             .groupby([key, "__ver"], sort=True)
             .agg(**{attr_col: (attr_col, "first"),
                     "valid_from": ("__us", "min")})
             .reset_index())
        g = g.sort_values([key, "valid_from"], kind="mergesort")
        g["valid_to"] = (g.groupby(key, sort=False)["valid_from"]
                         .shift(-1))  # float64 + NaN on the open version
        return (g.rename(columns={"__ver": "version"})
                [[key, "version", attr_col, "valid_from", "valid_to"]]
                .astype({"version": "int64", "valid_from": "int64"}))

    return partitioned_apply(ds, [key], per_partition)


def time_weighted_avg(ds, key: str, ts_col: str, val_col: str,
                      tie_col: str, ndigits: int = 6,
                      n_rows_hint: int | None = None):
    """Per-key time-weighted average (TWAP): each value is held until
    the NEXT observation, so it is weighted by its holding interval in
    exact integer microseconds; the last observation has no interval
    and drops (the telemetry/finance convention).

        twap = Σ vᵢ·(tᵢ₊₁ − tᵢ) / Σ (tᵢ₊₁ − tᵢ)

    Keys whose observations all share one timestamp (Σw = 0) are
    excluded on both sides. One co-locating key exchange, vectorized
    grouped shift inside the partition task. Returns
    (key, n_intervals:int64, twap:float64-rounded)."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort")
        us = p[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        g = p.groupby(key, sort=False)
        nxt = g[ts_col].shift(-1).to_numpy("datetime64[us]").astype(np.int64)
        w = (nxt - us).astype(np.float64)
        last = g.cumcount(ascending=False).to_numpy() == 0
        w[last] = 0.0
        f = pd.DataFrame({key: p[key].to_numpy(),
                          "vw": p[val_col].to_numpy(np.float64) * w,
                          "w": w,
                          "n": (~last).astype(np.int64)})
        out = (f.groupby(key, sort=False)
               .agg(vw=("vw", "sum"), w=("w", "sum"), n=("n", "sum"))
               .reset_index())
        out = out[out["w"] > 0]
        return pd.DataFrame({key: out[key],
                             "n_intervals": out["n"].astype("int64"),
                             "twap": sql_round(out["vw"] / out["w"],
                                               ndigits)})

    return partitioned_apply(ds.select_columns([key, ts_col, val_col,
                                                tie_col]),
                             [key], per_partition, n_rows_hint=n_rows_hint)


def rolling_median3(ds, key: str, ts_col: str, val_col: str, tie_col: str,
                    out_col: str = "roll_med", ndigits: int = 4,
                    n_rows_hint: int | None = None):
    """Rolling median over ROWS BETWEEN 2 PRECEDING AND CURRENT ROW per
    key (the robust sibling of ``rolling_agg``'s moving mean), with the
    SQL partial-window convention: row 0 is its own median, row 1 is
    the two-value interpolated median. Both are computed in DuckDB's
    exact quantile_cont FP form — the 3-window median is the sorted
    middle ELEMENT (frac = 0, so no arithmetic at all) and the
    2-window one is ``min + (max − min)·0.5`` — so the doubles are
    bit-identical to the replay; ndigits=4 because the half-interval
    of 2-decimal data terminates within 3 decimals, leaving no
    half-way boundary to straddle."""
    from ..functions.rounding import sql_round

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, ts_col, tie_col], kind="mergesort").copy()
        g = p.groupby(key, sort=False)
        v = p[val_col].to_numpy(np.float64)
        l1 = g[val_col].shift(1).to_numpy()
        l2 = g[val_col].shift(2).to_numpy()
        med3 = np.sort(np.stack([v, l1, l2]), axis=0)[1]
        mn = np.minimum(v, l1)
        med2 = mn + (np.maximum(v, l1) - mn) * 0.5
        med = np.where(np.isnan(l1), v,
                       np.where(np.isnan(l2), med2, med3))
        p[out_col] = sql_round(med, ndigits)
        return p

    return partitioned_apply(ds, [key], per_partition,
                             n_rows_hint=n_rows_hint)


def unconverted_events(ds, key: str, ts_col: str, tie_col: str,
                       type_col: str, trigger: str, target: str,
                       horizon_us: int, n_rows_hint: int | None = None):
    """Trigger events with NO target event from the same key within
    (ts, ts + horizon] — the funnel-abandonment probe ('clicks never
    followed by a purchase within the hour'), i.e. the ANTI form of
    the as-of join.

    One co-locating key exchange; inside the partition task the probe
    is a single ``pd.merge_asof(direction='forward',
    allow_exact_matches=False, tolerance=horizon)`` over exact integer
    microseconds — vectorized C, no per-key loop, and the strict-lower
    / inclusive-upper bounds match the SQL NOT EXISTS replay exactly.
    Returns (key, tie_col) of the unconverted triggers."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        us = p[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        f = pd.DataFrame({key: p[key].to_numpy(), "us": us,
                          tie_col: p[tie_col].to_numpy(),
                          "_ty": p[type_col].to_numpy()})
        trig = (f[f["_ty"] == trigger]
                .sort_values("us", kind="mergesort"))
        targ = (f[f["_ty"] == target][[key, "us"]]
                .sort_values("us", kind="mergesort"))
        if not len(trig):
            return pd.DataFrame({key: pd.Series(dtype=f[key].dtype),
                                 tie_col: pd.Series(
                                     dtype=f[tie_col].dtype)})
        m = pd.merge_asof(trig, targ.rename(columns={"us": "hit_us"}),
                          left_on="us", right_on="hit_us", by=key,
                          direction="forward", allow_exact_matches=False,
                          tolerance=int(horizon_us))
        out = m[m["hit_us"].isna()][[key, tie_col]]
        return out.sort_values([key, tie_col], kind="mergesort")

    return partitioned_apply(
        ds.select_columns([key, ts_col, tie_col, type_col]),
        [key], per_partition, n_rows_hint=n_rows_hint)
