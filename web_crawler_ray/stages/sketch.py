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
    # use_na_sentinel=False: null keys form their OWN group (code >= 0)
    # instead of code -1, which would scatter their rho values into the
    # last key's register block; matches the dropna=False merge step.
    codes, keys = pd.factorize(df[key], sort=True, use_na_sentinel=False)
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


def _mg_compress(counts: pd.Series, m: int) -> pd.Series:
    """Misra–Gries compression: keep at most ``m`` counters by
    subtracting the (m+1)-th largest count from all and dropping the
    non-positives. Each surviving counter under-counts by at most the
    total mass removed — the standard mergeable-summaries guarantee
    (Agarwal et al., PODS'12): after merging any number of summaries
    the under-count is bounded by n/m."""
    if len(counts) <= m:
        return counts
    sorted_c = np.sort(counts.to_numpy())[::-1]
    pivot = sorted_c[m]
    out = counts - pivot
    return out[out > 0]


def mg_partial(df: pd.DataFrame, key: str, m: int,
               weight_col: str | None = None) -> pd.DataFrame:
    """Per-batch Misra–Gries summary: exact batch counts (or
    NONNEGATIVE weight sums) compressed to ≤ m counters. An exact count
    table IS a valid MG summary, so compressing it preserves the merge
    guarantee. ``total`` carries the batch's pre-compression mass on
    the first row only (zeros elsewhere), so summing the column across
    any batch coalescing recovers the exact global mass W."""
    cnt_dtype = "int64" if weight_col is None else "float64"
    if not len(df):
        return pd.DataFrame({key: pd.Series([], dtype=df[key].dtype),
                             "cnt": pd.Series([], dtype=cnt_dtype),
                             "total": pd.Series([], dtype="float64")})
    if weight_col is None:
        vc = df[key].value_counts(sort=False)
    else:
        vc = df.groupby(key, sort=False)[weight_col].sum()
    batch_mass = float(vc.to_numpy().sum())
    vc = _mg_compress(vc, m)
    total = np.zeros(len(vc))
    if len(total):
        total[0] = batch_mass
    return pd.DataFrame({key: vc.index.to_numpy(),
                         "cnt": vc.to_numpy().astype(cnt_dtype),
                         "total": total})


def heavy_hitters(ds, key: str, k: int = 10, m: int = 512,
                  n_rows_hint: int | None = None,
                  weight_col: str | None = None) -> pd.DataFrame:
    """Exact top-k most frequent ``key`` values via a two-pass
    Misra–Gries sketch — the scale path past an exact groupby count
    when the key cardinality is huge (per-URL, per-host at 10^10).

    Pass 1 ships one ≤``m``-row summary per input batch (shuffle volume
    O(batches × m), cardinality-independent) and stream-merges them on
    the driver in O(m) memory — the same bounded single-reducer shape as
    the HLL estimate above. Pass 2 broadcasts the ≤m candidate keys and
    recounts them exactly in one streaming map + tiny driver sum, so the
    returned counts are EXACT, not estimates.

    Correctness gate: MG guarantees every key with true mass > W/m
    survives pass 1 (W = total count, or total weight with
    ``weight_col``), so the result equals the exact top-k whenever the
    k-th exact mass clears that bar. The gate is checked against the
    pass-2 exact masses; below it the function falls back to the exact
    one-shuffle count (and a larger ``m`` should be chosen).

    ``weight_col`` switches from frequency to NONNEGATIVE weight sums
    (top keys by total value) — same summary algebra, float counters.
    """
    cnt_dtype = "int64" if weight_col is None else "float64"
    # prune to the sketched columns BEFORE the map: the per-batch
    # pandas conversion then touches 1-2 columns instead of the whole
    # row (text/payload columns never convert)
    ds = ds.select_columns([key] if weight_col is None else [key, weight_col])

    def agg(frame: pd.DataFrame) -> pd.Series:
        if weight_col is None:
            return frame[key].value_counts(sort=False)
        return frame.groupby(key, sort=False)[weight_col].sum()

    partials = ds.map_batches(lambda b: mg_partial(b, key, m, weight_col),
                              batch_format="pandas")

    merged: pd.Series | None = None
    mass_total = 0.0
    for batch in partials.iter_batches(batch_format="pandas"):
        if not len(batch):
            continue
        mass_total += float(batch["total"].to_numpy().sum())
        # an iterated batch may coalesce several map outputs → the same
        # key can appear twice; collapse to unique labels BEFORE add()
        # (Series.add on duplicate labels cross-joins them)
        part = batch.groupby(key, sort=False)["cnt"].sum()
        merged = part if merged is None else merged.add(part, fill_value=0)
        if len(merged) > 4 * m:
            merged = _mg_compress(merged, m)
    if merged is None or not len(merged):
        return pd.DataFrame({key: [], "cnt": pd.Series([], dtype=cnt_dtype)})
    merged = _mg_compress(merged, m)

    # pass 2: exact recount of the ≤m candidates (broadcast membership)
    cand = np.sort(merged.index.to_numpy())

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        sub = b[b[key].isin(cand)]
        if not len(sub):
            return pd.DataFrame({key: pd.Series([], dtype=b[key].dtype),
                                 "cnt": pd.Series([], dtype=cnt_dtype)})
        vc = agg(sub)
        return pd.DataFrame({key: vc.index.to_numpy(),
                             "cnt": vc.to_numpy().astype(cnt_dtype)})

    exact: pd.Series | None = None
    for batch in ds.map_batches(recount, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        if not len(batch):
            continue
        part = batch.groupby(key, sort=False)["cnt"].sum()
        exact = part if exact is None else exact.add(part, fill_value=0)

    out = (exact.rename("cnt").rename_axis(key).reset_index()
           .sort_values(["cnt", key], ascending=[False, True], kind="mergesort")
           .head(k).reset_index(drop=True))
    out["cnt"] = out["cnt"].astype(cnt_dtype)
    if len(out) < k or float(out["cnt"].iloc[-1]) * m <= mass_total:
        # guarantee not met — the sketch may have dropped a true top-k
        # key; recompute exactly (one coarse-partitioned shuffle)
        from .grouped import partitioned_apply

        def count_part(p: pd.DataFrame) -> pd.DataFrame:
            vc = agg(p)
            return pd.DataFrame({key: vc.index.to_numpy(),
                                 "cnt": vc.to_numpy().astype(cnt_dtype)})

        full = partitioned_apply(ds, [key], count_part,
                                 n_rows_hint=n_rows_hint).to_pandas()
        out = (full.sort_values(["cnt", key], ascending=[False, True],
                                kind="mergesort").head(k).reset_index(drop=True))
    return out


def hll_distinct(ds, key: str, col: str, p: int = 12,
                 num_partitions: int = 32, n_rows_hint: int | None = None):
    """Approximate COUNT(DISTINCT col) per key via HyperLogLog.

    Shape: per-batch register blocks (map side, one row per key per
    batch) → one tiny shuffle on the key → per-partition register max
    + estimate. The only data crossing the wire is keys × blocks × 2^p
    bytes — cardinality-independent, the property that makes this the
    scale path past :func:`..aggregate.distinct_count`'s exact
    one-row-per-distinct-pair shuffle."""
    ds = ds.select_columns([key, col] if key != col else [key])
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


def ddsketch_partial(df: pd.DataFrame, key: str, col: str, lg: float) -> pd.DataFrame:
    """Per-batch DDSketch bucket counts: bucket i = ceil(ln(x)/ln(γ))
    per POSITIVE value, grouped by (key, bucket). One row per distinct
    (key, bucket) in the batch — the exchanged state is O(keys ×
    log-range/α), value-count-independent."""
    x = df[col].to_numpy(dtype=np.float64)
    ok = x > 0
    if not ok.all():
        df, x = df[ok], x[ok]
    if not len(df):
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "bucket": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    b = np.ceil(np.log(x) / lg).astype(np.int64)
    out = (pd.DataFrame({key: df[key].to_numpy(), "bucket": b, "cnt": 1})
           .groupby([key, "bucket"], sort=False).sum().reset_index())
    out["cnt"] = out["cnt"].astype("int64")
    return out


def ddsketch_quantiles(ds, key: str, col: str, qs: dict[str, float],
                       alpha: float = 0.005, num_partitions: int = 32,
                       n_rows_hint: int | None = None):
    """Approximate per-key quantiles with a RELATIVE-error guarantee
    (DDSketch, Masson et al. VLDB'19 — public algorithm): log-γ buckets
    with γ = (1+α)/(1-α), merged by plain count addition, estimate =
    bucket midpoint 2γ^i/(γ+1), so |est − true| ≤ α·true at every
    quantile. The scale path past the exact ``group_quantile_*``
    operators, whose shuffle carries every raw row: here one
    (key, bucket, cnt) row per batch-distinct bucket crosses the wire.

    Deterministic and merge-order-independent (integer counts), so
    results are bit-identical across block layouts and parallelism.
    Positive values only (standard DDSketch domain); zero/negatives are
    dropped. Rank convention matches SQL ``quantile_disc``: the
    ceil(q·n)-th smallest value."""
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)

    ds = ds.select_columns([key, col] if key != col else [key])
    partials = ds.map_batches(lambda b: ddsketch_partial(b, key, col, lg),
                              batch_format="pandas")

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for k, g in part.groupby(key, sort=True, dropna=False):
            byb = g.groupby("bucket", sort=True)["cnt"].sum()
            buckets = byb.index.to_numpy(dtype=np.int64)
            cum = byb.to_numpy(dtype=np.int64).cumsum()
            n = int(cum[-1])
            row = {key: k, "n": np.int64(n)}
            for name, q in qs.items():
                rank = max(1, math.ceil(q * n))
                i = int(buckets[np.searchsorted(cum, rank)])
                row[name] = 2.0 * gamma**i / (gamma + 1.0)
            rows.append(row)
        return pd.DataFrame(rows, columns=[key, "n", *qs])

    return partitioned_apply(partials, [key], merge, num_partitions,
                             n_rows_hint=n_rows_hint)


def _hll_registers(ds, col: str, p: int) -> np.ndarray:
    """Stream a dataset into one merged HLL register block (driver
    keeps 2^p bytes; per-batch blocks OR-merge by elementwise max)."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    ds = ds.select_columns([col])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__k"] = 0
        return hll_partial(df, "__k", col, p)

    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for raw in b["regs"]:
            regs = np.maximum(regs, np.frombuffer(raw, dtype=np.uint8))
    return regs


def hll_intersect(ds_a, ds_b, col: str, p: int = 12) -> pd.DataFrame:
    """Approximate |A ∩ B| over two key streams by HLL
    inclusion–exclusion: est(A) + est(B) − est(A ∪ B), where the UNION
    sketch is just the elementwise register max of the two sides — no
    third scan, no shuffle at all; driver state is 2·2^p bytes. Error
    grows with |A∪B|/|A∩B| (standard sketch caveat — pinned in tests);
    the exact path is the dedup + semi-join `q_set_intersect` shape."""
    ra = _hll_registers(ds_a, col, p)
    rb = _hll_registers(ds_b, col, p)
    est_a = _hll_estimate(ra)
    est_b = _hll_estimate(rb)
    est_u = _hll_estimate(np.maximum(ra, rb))
    return pd.DataFrame({
        "n_a_approx": pd.Series([est_a], dtype="int64"),
        "n_b_approx": pd.Series([est_b], dtype="int64"),
        "n_union_approx": pd.Series([est_u], dtype="int64"),
        "n_intersect_approx": pd.Series([max(0, est_a + est_b - est_u)],
                                        dtype="int64"),
    })


def countmin_frequencies(ds, key: str, queries: list, width_log2: int = 14,
                         depth: int = 4) -> pd.DataFrame:
    """Count–Min point-frequency estimates (Cormode–Muthukrishnan,
    public algorithm): per-batch d×2^w counter blocks merged by plain
    addition on the driver (state O(d·2^w), cardinality- and
    row-count-independent), then the queried keys' estimates read as
    the min over rows. Always OVER-estimates: est ≥ true, and
    est ≤ true + 2n/2^w with prob ≥ 1 − 2^−d — both bounds pinned in
    tests. The exact path is heavy_hitters' recount; CM answers point
    queries for keys chosen AFTER the pass."""
    w = 1 << width_log2
    ds = ds.select_columns([key])
    mask = _U64(w - 1)
    seeds = np.arange(1, depth + 1, dtype=np.uint64) * _U64(0x9E3779B97F4A7C15)

    def positions(col: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(col, index=False).to_numpy(dtype=_U64)
        pos = np.empty((depth, len(h)), dtype=np.int64)
        for d in range(depth):
            x = (h ^ seeds[d]) * _U64(0xFF51AFD7ED558CCD)
            pos[d] = ((x >> _U64(33)) ^ x).astype(_U64).__and__(mask).astype(np.int64)
        return pos

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        counts = np.zeros((depth, w), dtype=np.int64)
        if len(batch):
            pos = positions(batch[key])
            for d in range(depth):
                np.add.at(counts[d], pos[d], 1)
        return pd.DataFrame({"cm": [counts.tobytes()]})

    total = np.zeros((depth, w), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for raw in b["cm"]:
            total += np.frombuffer(raw, dtype=np.int64).reshape(depth, w)

    qser = pd.Series(queries)
    qpos = positions(qser)
    est = np.min(total[np.arange(depth)[:, None], qpos], axis=0)
    return pd.DataFrame({key: qser.to_numpy(),
                         "freq_est": est.astype("int64")})
