"""Aggregations / sorts / top-k (SURVEY.md §2.5 A1-A6, §2.6 O1-O3).

All built on Ray Data's native ``groupby().aggregate`` (partial+final
combine handled by the engine) and ``sort().limit`` — no driver-side
loops. Float outputs that feed the DuckDB oracle are rounded at a fixed
precision on BOTH sides so sum-order nondeterminism in doubles cannot
flip a value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions.rounding import sql_round


def partial_grouped_agg(ds, keys: list[str], spec: dict[str, tuple[str, str | None]]):
    """Pre-aggregate inside map_batches, then combine tiny partials with
    one small shuffle (the guide's canonical aggregation-at-scale
    pattern: the shuffle moves one row per (key, batch), not every row).

    ``spec``: {out_col: (fn, col)} with fn ∈ {"sum", "count", "min",
    "max"}. Means are derived downstream as sum/count. ~10× faster than
    a bare groupby().aggregate() on low-cardinality keys.
    """
    named = {out: (fn, col) for out, (fn, col) in spec.items()}

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        aggs = {}
        for out, (fn, col) in named.items():
            aggs[out] = (col if col else batch.columns[0], "size" if fn == "count" else fn)
        return batch.groupby(keys, sort=False).agg(**aggs).reset_index()

    combine = []
    for out, (fn, _col) in named.items():
        if fn in ("sum", "count"):
            combine.append(Sum(out, alias_name=out))
        elif fn == "min":
            combine.append(Min(out, alias_name=out))
        else:
            combine.append(Max(out, alias_name=out))
    return ds.map_batches(partial, batch_format="pandas").groupby(keys).aggregate(*combine)


def market_summary(ds, change_col: str = "change_percent"):
    """A1 (commodity_service.py:159-211): global count, mean change,
    gainer/loser/unchanged counts. Gainer flags are computed vectorized
    in a map_batches pre-pass so the aggregate is a pure Sum/Count."""

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch[change_col]
        batch = batch.copy()
        batch["is_gainer"] = (c > 0).astype("int64")
        batch["is_loser"] = (c < 0).astype("int64")
        batch["is_unchanged"] = (c == 0).astype("int64")
        return batch

    return ds.map_batches(flags, batch_format="pandas").aggregate(
        Count(alias_name="total_count"),
        Mean(change_col, alias_name="avg_change"),
        Sum("is_gainer", alias_name="gainers"),
        Sum("is_loser", alias_name="losers"),
        Sum("is_unchanged", alias_name="unchanged"),
    )


def category_stats(ds, category_col: str, value_col: str):
    """A2 (commodity_service.py:186-199): per-category count + mean,
    rounded 2dp like the reference. Mean = sum/count over partials."""
    out = partial_grouped_agg(
        ds, [category_col], {"n": ("count", None), "sum_v": ("sum", value_col)}
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["avg_value"] = sql_round(batch["sum_v"] / batch["n"], 2)
        return batch.drop(columns=["sum_v"])

    return out.map_batches(finish, batch_format="pandas")


def top_k(ds, col: str, k: int = 10, descending: bool = True, tie_col: str | None = None):
    """O2 (commodity_service.py:127-157): top-k by a column with a
    deterministic tie-break column."""
    keys = [col] if tie_col is None else [col, tie_col]
    return ds.sort(keys, descending=descending).limit(k)


def top_k_per_group(ds, group_col: str, value_col: str, k: int, tie_col: str):
    """A3/O1 (commodity_service.py:103-125): materialized groups, each
    sorted desc by value — per-group top-k via map_groups."""

    def head(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            [value_col, tie_col], ascending=[False, True], kind="mergesort"
        ).head(k)

    return ds.groupby(group_col).map_groups(head, batch_format="pandas")


def error_histogram(ds, error_col: str = "errors"):
    """A5 (validator.py:320-344): error-type histogram. Error strings are
    semicolon-joined rule names → explode → count."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for e in batch[error_col]:
            if e:
                rows.extend(e.split(";"))
        return pd.DataFrame({"error_type": rows})

    return ds.map_batches(explode, batch_format="pandas").groupby("error_type").aggregate(
        Count(alias_name="n")
    )


def numeric_profile(ds, col: str):
    """A4/A6-style single-column profile: count/sum/min/max/mean."""
    return ds.aggregate(
        Count(alias_name="n"),
        Sum(col, alias_name="sum_v"),
        Min(col, alias_name="min_v"),
        Max(col, alias_name="max_v"),
        Mean(col, alias_name="mean_v"),
    )


def distinct_count(ds, key: str, col: str, num_partitions: int = 32,
                   n_rows_hint: int | None = None):
    """Exact COUNT(DISTINCT col) per key. One coarse shuffle on
    hash(key, col) collapses duplicates (each (key, col) pair lands in
    exactly one partition), then tiny per-key partial counts combine.
    Per-batch pre-dedup inside partitioned_drop_duplicates keeps the
    shuffle volume ≤ the number of distinct pairs per block."""
    from .grouped import partitioned_drop_duplicates

    pairs = partitioned_drop_duplicates(
        ds.select_columns([key, col]), [key, col], num_partitions,
        pre_dedup=True, n_rows_hint=n_rows_hint,
    )
    return partial_grouped_agg(pairs, [key], {"n_distinct": ("count", None)})


def moment_profile(ds, keys: list[str], col: str, ndigits: int = 4):
    """Per-key count / mean / sample variance / sample stddev via
    single-pass partial moments (n, Σx, Σx²) — the shuffle carries one
    row per (key, batch). Matches SQL var_samp/stddev_samp at ``ndigits``
    precision (rounding absorbs the FP gap between the naive-moments
    formula and DuckDB's numerically stable streaming algorithm; fine
    for value ranges where Σx² stays within ~2^50)."""
    import numpy as np

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_x"] = batch[col]
        batch["_xx"] = batch[col] * batch[col]
        return batch

    g = partial_grouped_agg(
        ds.map_batches(moments, batch_format="pandas"),
        keys,
        {"n": ("count", None), "sx": ("sum", "_x"), "sxx": ("sum", "_xx")},
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"]
        # SQL var_samp/stddev_samp return NULL for single-row groups;
        # (n - 1) division would yield inf/NaN-with-sign noise instead —
        # mask n == 1 to NaN (pandas' NULL) deliberately.
        var = ((batch["sxx"] - batch["sx"] * batch["sx"] / n) / (n - 1)).where(n > 1)
        batch["avg_v"] = sql_round(batch["sx"] / n, ndigits)
        batch["var_v"] = sql_round(var, ndigits)
        batch["std_v"] = sql_round(np.sqrt(var), ndigits)
        return batch.drop(columns=["sx", "sxx"])

    return g.map_batches(finish, batch_format="pandas")


def grouped_string_agg(ds, key: str, val_col: str, order_col: str,
                       sep: str = ",", out_col: str = "members",
                       num_partitions: int = 32, n_rows_hint: int | None = None):
    """SQL ``string_agg(val, sep ORDER BY order_col)`` per key: one
    coarse shuffle on the key, then a (key, order)-sorted C sort + one
    ``str.join`` per key group inside each partition.

    Partitioning assumption: one key's concatenated string fits a
    task's heap (bounded-cardinality keys / bounded group width). For
    giant groups, cap or switch to a list sink."""
    from .grouped import partitioned_apply

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, order_col], kind="mergesort")
        res = (
            p.groupby(key, sort=True)[val_col]
            .agg(lambda s: sep.join(s.astype(str)))
            .reset_index()
        )
        return res.rename(columns={val_col: out_col})

    return partitioned_apply(
        ds.select_columns([key, val_col, order_col]),
        [key], per_partition, num_partitions, n_rows_hint=n_rows_hint,
    )


def pivot_sum(ds, key: str, pivot_col: str, val_col: str,
              pivot_values: dict[str, str], ndigits: int = 2):
    """Conditional-aggregation pivot: one output column
    ``out = SUM(CASE WHEN pivot_col = v THEN val END)`` per
    ``pivot_values`` entry ({out_col: v}), plus ``n = COUNT(*)``,
    grouped by ``key``. The pivot-value set must be known and small
    (it becomes the schema). Map-side partials (vectorized ``where``
    masks) + one tiny combine shuffle — one row per (key, batch)
    moves, never the raw rows."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cols = {key: batch[key]}
        for out, v in pivot_values.items():
            cols[out] = batch[val_col].where(batch[pivot_col] == v)
        cols["n"] = 1
        return (
            pd.DataFrame(cols)
            .groupby(key, sort=False)
            .sum(min_count=1)
            .reset_index()
        )

    combine = [Sum(out, alias_name=out) for out in pivot_values]
    combine.append(Sum("n", alias_name="n"))
    g = ds.map_batches(partial, batch_format="pandas").groupby(key).aggregate(*combine)

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        for out in pivot_values:
            batch[out] = sql_round(batch[out], ndigits)
        batch["n"] = batch["n"].astype("int64")
        return batch

    return g.map_batches(finish, batch_format="pandas")


def corr_profile(ds, keys: list[str], xcol: str, ycol: str, ndigits: int = 6):
    """Per-key Pearson correlation from single-pass partial moments
    (n, Σx, Σy, Σxx, Σyy, Σxy). Same shuffle shape as moment_profile."""
    import numpy as np

    def moments(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        x, y = batch[xcol], batch[ycol]
        batch["_x"], batch["_y"] = x, y
        batch["_xx"], batch["_yy"], batch["_xy"] = x * x, y * y, x * y
        return batch

    g = partial_grouped_agg(
        ds.map_batches(moments, batch_format="pandas"),
        keys,
        {"n": ("count", None), "sx": ("sum", "_x"), "sy": ("sum", "_y"),
         "sxx": ("sum", "_xx"), "syy": ("sum", "_yy"), "sxy": ("sum", "_xy")},
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n"]
        cov = batch["sxy"] - batch["sx"] * batch["sy"] / n
        vx = batch["sxx"] - batch["sx"] * batch["sx"] / n
        vy = batch["syy"] - batch["sy"] * batch["sy"] / n
        batch["corr_xy"] = sql_round(cov / np.sqrt(vx * vy), ndigits)
        return batch[[*keys, "n", "corr_xy"]]

    return g.map_batches(finish, batch_format="pandas")


def grouping_sets_sum(ds, keys: list[str], val_col: str,
                      sets: list[list[str]], sum_col: str = "sum_v",
                      ndigits: int = 2):
    """GROUP BY GROUPING SETS: SUM(val) + COUNT(*) at each requested
    key subset, absent key columns NULL like SQL.

    Shape: the raw rows are aggregated ONCE at the finest level
    (map-side partials + one small combine shuffle via
    :func:`partial_grouped_agg`); every grouping set re-aggregates the
    finest-level result, never the input. Partitioning assumption: the
    finest-level distinct-key count is driver-small (grouping-set keys
    are categorical by construction — a cube over a high-cardinality
    key is a different operator). Sums of sums equal direct sums only
    up to FP associativity, so outputs are rounded at a fixed precision
    on both engine and oracle sides like every other aggregate here."""
    finest = partial_grouped_agg(
        ds, keys, {sum_col: ("sum", val_col), "n": ("count", None)}
    ).to_pandas()

    frames = []
    for keep in sets:
        if list(keep) == keys:
            df = finest.copy()
        elif keep:
            df = (finest.groupby(list(keep), sort=True, dropna=False)
                  [[sum_col, "n"]].sum().reset_index())
        else:
            df = pd.DataFrame({sum_col: [finest[sum_col].sum()],
                               "n": [finest["n"].sum()]})
        for k in keys:
            if k not in keep:
                df[k] = None
        frames.append(df[[*keys, sum_col, "n"]])

    out = pd.concat(frames, ignore_index=True)
    out[sum_col] = sql_round(out[sum_col], ndigits)
    out["n"] = out["n"].astype("int64")
    return out


def rollup_sum(ds, keys: list[str], val_col: str, sum_col: str = "sum_v",
               ndigits: int = 2):
    """GROUP BY ROLLUP(*keys): every prefix level, finest → grand
    total (see :func:`grouping_sets_sum` for shape and assumptions)."""
    sets = [keys[:lvl] for lvl in range(len(keys), -1, -1)]
    return grouping_sets_sum(ds, keys, val_col, sets, sum_col, ndigits)


def cube_sum(ds, keys: list[str], val_col: str, sum_col: str = "sum_v",
             ndigits: int = 2):
    """GROUP BY CUBE(*keys): every key subset (2^len(keys) grouping
    sets; see :func:`grouping_sets_sum` for shape and assumptions)."""
    from itertools import combinations

    sets = [list(c) for r in range(len(keys), -1, -1)
            for c in combinations(keys, r)]
    return grouping_sets_sum(ds, keys, val_col, sets, sum_col, ndigits)


def fixed_width_histogram(ds, col: str, n_buckets: int = 16):
    """Equi-width histogram: pass 1 reduces (min, max) — two scalars on
    the driver — pass 2 bins every value vectorized into
    floor((x − lo)/width) clipped to the last bucket, with map-side
    partial counts and one tiny combine shuffle (one row per (bucket,
    batch)). Bin edges use the same IEEE double expression the SQL
    oracle evaluates, so bucket ids match bit-for-bit."""
    import numpy as np

    stats = ds.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"))
    lo, hi = float(stats["lo"]), float(stats["hi"])
    width = (hi - lo) / n_buckets

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[col].to_numpy(dtype=np.float64)
        if width == 0.0:  # all values equal (or single row): 0/0 → NaN
            b = np.zeros(len(x), dtype=np.int64)
        else:
            b = np.minimum(np.floor((x - lo) / width),
                           n_buckets - 1).astype(np.int64)
        vc = pd.Series(b).value_counts(sort=False)
        return pd.DataFrame({"bucket": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("bucket").aggregate(Sum("n", alias_name="n")))


def group_entropy(ds, key: str, cat_col: str, ndigits: int = 6,
                  num_partitions: int = 32, n_rows_hint: int | None = None):
    """Shannon entropy of the ``cat_col`` distribution per ``key`` —
    the diversity/feature-engineering aggregate (user behavioral
    entropy, host content-type entropy). Two-level: exact (key, cat)
    counts via map-side partials + one small combine, then a vectorized
    per-key entropy over the counts table (coarse-partitioned on the
    key, so it scales with key cardinality)."""
    import numpy as np

    from .grouped import partitioned_apply

    counts = partial_grouped_agg(
        ds.select_columns([key, cat_col]), [key, cat_col],
        {"n": ("count", None)},
    )

    def entropy(part: pd.DataFrame) -> pd.DataFrame:
        # sort so the float entropy-term sum runs in a FIXED order —
        # shuffle-arrival order varies run to run and a float sum in
        # varying order can flip the rounded digit (same fix as
        # ratio_to_report).
        part = part.sort_values([key, cat_col], kind="mergesort")
        tot = part.groupby(key, sort=False)["n"].transform("sum")
        p = part["n"] / tot
        term = -(p * np.log(p))
        out = (part.assign(term=term).groupby(key, sort=True)
               .agg(entropy=("term", "sum"), n=("n", "sum")).reset_index())
        out["entropy"] = sql_round(out["entropy"], ndigits)
        out["n"] = out["n"].astype("int64")
        return out

    return partitioned_apply(counts, [key], entropy, num_partitions,
                             n_rows_hint=n_rows_hint)


def group_mode(ds, key: str, cat_col: str, num_partitions: int = 32,
               n_rows_hint: int | None = None):
    """Most-frequent ``cat_col`` value per key with a DETERMINISTIC
    tie-break (highest count, then smallest value) — SQL mode() leaves
    ties unspecified, so the oracle replays the explicit rule. Exact
    (key, value) counts via map-side partials + one small combine, then
    a vectorized winner pick per coarse partition."""
    counts = partial_grouped_agg(
        ds.select_columns([key, cat_col]), [key, cat_col],
        {"n": ("count", None)},
    )

    def pick(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([key, "n", cat_col],
                                ascending=[True, False, True],
                                kind="mergesort")
        out = part.drop_duplicates(subset=[key], keep="first")
        out = out.rename(columns={cat_col: "mode_v"})
        out["n"] = out["n"].astype("int64")
        return out[[key, "mode_v", "n"]]

    from .grouped import partitioned_apply

    return partitioned_apply(counts, [key], pick, num_partitions,
                             n_rows_hint=n_rows_hint)


def quantile_gate(ds, col: str, q: float, keep: str = "ge"):
    """Filter rows against the corpus-global EXACT discrete quantile of
    ``col`` (quality-gate shape: "keep the top 25% by score"). Returns
    the input rows whose ``col`` is >= (``keep="ge"``) or < the
    threshold, i.e. the selection itself — callers chain further stages.

    The threshold element matches DuckDB ``quantile_disc(col, q)``:
    0-based rank ``ceil(q*n) - 1`` over the ascending sort (probed).

    Shape: pass 1 ships per-batch (value, partial count) into one
    tiny combine — volume is DISTINCT values per batch, never rows —
    the driver resolves the rank over the sorted value/count table and
    the second pass is a map-only Arrow filter. Assumes the column's
    distinct-value count is driver-safe (ints, bounded-precision
    scores); for unbounded continuous columns use the DDSketch quantile
    (``stages/sketch.py``) and accept its relative-error bound."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts(sort=False)
        return pd.DataFrame({"v": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    acc = None
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pandas").iter_batches(
                batch_format="pandas"):
        s = b.groupby("v")["n"].sum()  # coalesced batches repeat keys
        acc = s if acc is None else acc.add(s, fill_value=0)
    if acc is None or not len(acc):
        return ds
    acc = acc.sort_index()
    counts = acc.to_numpy(np.int64)
    n = int(counts.sum())
    rank = max(int(np.ceil(q * n)) - 1, 0)
    threshold = acc.index.to_numpy()[np.searchsorted(np.cumsum(counts),
                                                     rank + 1)]

    op = pc.greater_equal if keep == "ge" else pc.less

    def gate(batch):
        return batch.filter(op(batch[col], threshold))

    return ds.map_batches(gate, batch_format="pyarrow")


def gini_coefficient(ds, key: str, ndigits: int = 6,
                     num_partitions: int = 32):
    """Gini coefficient of the per-``key`` row-count distribution — the
    load-inequality / skew report (how unfair is the per-host crawl
    share, the per-user event share). Formula over ascending-sorted
    counts x_1..x_n: sum((2i − n − 1)·x_i) / (n·sum(x)).

    Shape: per-key counts via one map-side-combined exchange (the
    ``partial_grouped_agg`` path), then the KEY-CARDINALITY-sized count
    table collapses to one partition for the exact rank formula — the
    same key-cardinality gate the engine's other exact-rank ops
    document (counts are ~16 B/key; 10^8 keys ≈ 1.6 GB, still
    one-node-sized; past that, DDSketch the distribution instead)."""

    def count_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[key].value_counts(sort=False)
        return pd.DataFrame({key: vc.index.to_numpy(),
                             "x": vc.to_numpy().astype("int64")})

    import numpy as np
    import ray.data as rd

    # the per-batch partials already shrank the stream to distinct keys
    # per batch; finish the combine on the driver (key-cardinality-sized
    # — same surface partial_grouped_agg would shuffle) instead of
    # paying a second exchange for repartition(1). Coalesced iterated
    # batches may repeat keys, so groupby-sum each batch before adding
    # (the duplicate-index Series.add gotcha).
    partials = ds.select_columns([key]).map_batches(
        count_partial, batch_format="pandas")
    acc: pd.Series | None = None
    for b in partials.iter_batches(batch_format="pandas"):
        s = b.groupby(key)["x"].sum()
        acc = s if acc is None else acc.add(s, fill_value=0)
    if acc is None or not len(acc):
        return rd.from_pandas(pd.DataFrame(
            {"gini": pd.Series([], dtype="float64"),
             "n_keys": pd.Series([], dtype="int64")}))
    p = acc.rename("x").reset_index().sort_values(["x", key],
                                                  kind="mergesort")
    x = p["x"].to_numpy(np.float64)
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    g = float(((2 * i - n - 1) * x).sum() / (n * x.sum()))
    return rd.from_pandas(pd.DataFrame(
        {"gini": sql_round(pd.Series([g]), ndigits),
         "n_keys": np.array([n], dtype=np.int64)}))


def winsorize(ds, col: str, lo_q: float = 0.01, hi_q: float = 0.99,
              out_col: str | None = None):
    """Clip ``col`` to its corpus-exact [lo_q, hi_q] discrete quantiles
    (outlier winsorization — the feature-preprocessing staple). Same
    one-pass distinct-value-count combine as :func:`quantile_gate`
    resolves BOTH thresholds from one table; the clip itself is a
    map-only Arrow kernel. Thresholds match DuckDB ``quantile_disc``
    (rank ceil(q·n) − 1 ascending, probed)."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts(sort=False)
        return pd.DataFrame({"v": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    acc = None
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pandas").iter_batches(
                batch_format="pandas"):
        s = b.groupby("v")["n"].sum()
        acc = s if acc is None else acc.add(s, fill_value=0)
    if acc is None or not len(acc):
        return ds
    acc = acc.sort_index()
    counts = acc.to_numpy(np.int64)
    values = acc.index.to_numpy()
    n = int(counts.sum())
    cum = np.cumsum(counts)

    def thr(q: float):
        rank = max(int(np.ceil(q * n)) - 1, 0)
        return values[np.searchsorted(cum, rank + 1)]

    lo, hi = thr(lo_q), thr(hi_q)
    dest = out_col or col

    def clip(batch):
        clipped = pc.min_element_wise(
            pc.max_element_wise(batch[col], lo), hi)
        if dest in batch.schema.names:
            return batch.set_column(batch.schema.names.index(dest), dest,
                                    clipped)
        return batch.append_column(dest, clipped)

    return ds.map_batches(clip, batch_format="pyarrow")


def equidepth_histogram(ds, col: str, k: int = 10):
    """Equi-depth (quantile-bucket) histogram: interior edges at the
    exact discrete quantiles i/k (the shared ``quantile_disc`` rank
    convention: 0-based rank ceil(q·n)−1 ascending), bucket of a row =
    number of edges ≤ its value, per-bucket count/min/max. The
    column-statistics pass an optimizer or skew planner runs — unlike
    the fixed-width histogram it adapts to the distribution.

    Shape: pass 1 is the distinct-value-count combine (volume ∝ batch-
    distinct values, same as ``quantile_gate``); the driver resolves
    k−1 edges; pass 2 is a map-only searchsorted + a ≤k-row partial
    agg combine."""
    import numpy as np

    import ray.data as rd

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[col].value_counts(sort=False)
        return pd.DataFrame({"v": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    acc = None
    for b in ds.select_columns([col]).map_batches(
            partial, batch_format="pandas").iter_batches(
                batch_format="pandas"):
        s = b.groupby("v")["n"].sum()
        acc = s if acc is None else acc.add(s, fill_value=0)
    if acc is None or not len(acc):
        return rd.from_pandas(pd.DataFrame(
            {"bucket": pd.Series([], dtype="int64"),
             "n": pd.Series([], dtype="int64")}))
    acc = acc.sort_index()
    counts = acc.to_numpy(np.int64)
    values = acc.index.to_numpy()
    n = int(counts.sum())
    cum = np.cumsum(counts)
    edges = np.array([
        values[np.searchsorted(cum, max(int(np.ceil((i / k) * n)) - 1, 0) + 1)]
        for i in range(1, k)
    ])

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["bucket"] = np.searchsorted(
            edges, batch[col].to_numpy(), side="right").astype("int64")
        return batch

    return partial_grouped_agg(
        ds.select_columns([col]).map_batches(bucketize, batch_format="pandas"),
        ["bucket"],
        {"n": ("count", None), "v_min": ("min", col), "v_max": ("max", col)},
    )


def shuffle_skew_report(ds, key: str, hot_frac: float = 0.01,
                        max_partitions: int = 32,
                        num_partitions: int = 32):
    """Pre-shuffle skew diagnostic: which keys would overload a
    hash-partitioned exchange, and how many salts each needs. Emits,
    for every key holding ≥ ``hot_frac`` of the rows: its count, its
    integer share in ppm, and ``n_salts = ceil(n·P/total)`` — the salt
    factor that caps each (key, salt) slice at one partition's fair
    share of ``max_partitions``. All-integer output (exact SQL replay).

    Shape: per-key counts via map-side pre-combine + one coarse hash
    shuffle carrying (key, partial) rows; the hot tail that returns is
    ≤ 1/hot_frac keys by construction."""
    import numpy as np

    import ray.data as rd

    from .graph import grouped_sum

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        vc = batch[key].value_counts(sort=False, dropna=False)
        return pd.DataFrame({key: vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = grouped_sum(
        ds.select_columns([key]).map_batches(pre, batch_format="pandas"),
        key, "n", "n", num_partitions=num_partitions,
    ).materialize()
    total = 0
    for b in counts.iter_batches(batch_format="pandas"):
        total += int(b["n"].sum())
    if total == 0:
        return rd.from_pandas(pd.DataFrame(
            {key: pd.Series([], dtype="object"),
             "n": pd.Series([], dtype="int64"),
             "share_ppm": pd.Series([], dtype="int64"),
             "n_salts": pd.Series([], dtype="int64")}))
    cut = hot_frac * total

    def hot(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["n"] >= cut].copy()
        nn = batch["n"].to_numpy(np.int64)
        batch["share_ppm"] = nn * 1_000_000 // total
        batch["n_salts"] = (nn * max_partitions + total - 1) // total
        return batch

    return counts.map_batches(hot, batch_format="pandas")


def incremental_agg_merge(base_ds, changes_ds, group_col: str, id_col: str,
                          val_col: str, op_col: str = "op",
                          seq_col: str = "seq"):
    """Materialized-view maintenance: update a per-group (count, sum)
    aggregate under a CDC changelog WITHOUT re-aggregating the base —
    the at-scale answer to 'a few thousand rows changed in a 100-TB
    table, refresh the dashboard'.

    1. winners: last-seq-wins per changed id (delta-sized, in-memory —
       the changelog is small by construction; use apply_changes for
       snapshot-scale logs).
    2. OLD contributions of every affected id come from ONE map-only
       pass over the base with the affected-id set broadcast (no base
       shuffle, no base re-aggregation).
    3. delta per group = new upsert contributions − old contributions;
       new_agg = base_agg + delta (group-count-sized driver merge).

    Exchange volume ∝ |delta| + |groups|, never |base|. Result is
    EXACTLY the aggregate of ``apply_changes(base, changes)`` (pinned
    in tests)."""
    import ray

    from .grouped import partitioned_apply  # noqa: F401  (shape parity)

    base_agg = partial_grouped_agg(
        base_ds.select_columns([group_col, val_col]), [group_col],
        {"n_rows": ("count", None), "v_sum": ("sum", val_col)},
    ).to_pandas()

    win = (changes_ds.to_pandas()
           .sort_values([id_col, seq_col, op_col],
                        ascending=[True, False, True], kind="mergesort")
           .drop_duplicates(subset=[id_col]))
    affected = set(win[id_col].tolist())
    ids_ref = ray.put(affected)

    def old_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids = ray.get(ids_ref)
        hit = batch[batch[id_col].isin(ids)]
        return hit[[id_col, group_col, val_col]]

    old = (base_ds.select_columns([id_col, group_col, val_col])
           .map_batches(old_rows, batch_format="pandas").to_pandas())

    minus = (old.groupby(group_col)
             .agg(n=(id_col, "size"), s=(val_col, "sum")))
    ups = win[win[op_col] == "upsert"]
    plus = (ups.groupby(group_col)
            .agg(n=(id_col, "size"), s=(val_col, "sum")))

    out = base_agg.set_index(group_col)
    delta_n = plus["n"].sub(minus["n"], fill_value=0) if len(plus) or len(minus) \
        else pd.Series(dtype="float64")
    delta_s = plus["s"].sub(minus["s"], fill_value=0) if len(plus) or len(minus) \
        else pd.Series(dtype="float64")
    out["n_rows"] = out["n_rows"].add(delta_n, fill_value=0)
    out["v_sum"] = out["v_sum"].add(delta_s, fill_value=0)
    # groups created purely by inserts
    new_groups = delta_n.index.difference(out.index)
    for g in new_groups:
        out.loc[g] = [delta_n.get(g, 0), delta_s.get(g, 0)]
    out = out[out["n_rows"] > 0].reset_index()
    out["n_rows"] = out["n_rows"].astype("int64")
    out["v_sum"] = out["v_sum"].astype("int64")
    return out.sort_values(group_col, kind="mergesort").reset_index(drop=True)


def grouping_sets_agg(ds, sets: list[list[str]], val_col: str,
                      ndigits: int = 2) -> pd.DataFrame:
    """GROUP BY GROUPING SETS: one aggregate pass PER SET over the same
    input (count + sum of ``val_col``), results unioned with the
    aggregated-away keys as NULL and the SQL ``grouping()`` bitmask as
    ``gid`` (bit i set ⇔ the i-th key column is aggregated away in
    that set) — the multi-granularity report that avoids re-reading
    the fact table per granularity.

    Each set's aggregate is the map-side-combine pattern (shuffle
    carries one row per (batch, key)); the union is set-count ×
    key-cardinality-sized driver assembly. Returns
    (gid:int64, *all key columns, n:int64, total:rounded)."""
    all_keys: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_keys:
                all_keys.append(c)
    frames = []
    for s in sets:
        g = partial_grouped_agg(
            ds.select_columns(list(dict.fromkeys(s + [val_col]))).map_batches(
                lambda b, keys=tuple(s): (
                    b.groupby(list(keys), sort=False)
                    .agg(n=(val_col, "size"), s=(val_col, "sum"))
                    .reset_index()),
                batch_format="pandas"),
            list(s), {"n": ("sum", "n"), "s": ("sum", "s")}).to_pandas()
        gid = sum(1 << i for i, c in enumerate(all_keys) if c not in s)
        f = pd.DataFrame({"gid": np.full(len(g), gid, dtype=np.int64)})
        for c in all_keys:
            f[c] = g[c] if c in s else None
        f["n"] = g["n"].astype("int64")
        f["total"] = sql_round(g["s"], ndigits)
        frames.append(f)
    out = pd.concat(frames, ignore_index=True)
    return (out.sort_values(["gid"] + all_keys, kind="mergesort")
            .reset_index(drop=True))
