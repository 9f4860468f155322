"""Dataset-profiling statistics: categorical association (PMI /
chi-squared contingency cells), robust per-group dispersion
(median + MAD outliers), and two-sample KS drift.

These are the data-quality / feature-analysis operators a curation
pipeline runs before training: "is `lang` independent of `source`?",
"which groups have heavy tails?", "did the distribution move between
two ingest windows?". All three reduce to group-count-sized exchanges:
the corpus never leaves the mappers, only (key, count/partial) rows
shuffle. Reference capability analogue: the validation / summary
reporting layer (pacong/data/validator.py, pacong/core/analyzer
summaries) generalized to distribution-level checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .aggregate import partial_grouped_agg
from .grouped import partitioned_apply


def contingency_assoc(ds, col_a: str, col_b: str) -> pd.DataFrame:
    """Contingency table of two categorical columns with per-cell
    pointwise mutual information and chi-squared contribution.

    Map-side (a, b) counts pre-combine inside ``map_batches``; the only
    shuffle carries one row per (batch, cell). Marginals and the
    per-cell doubles are computed on the driver over the |A|x|B|-cell
    result (group-count-sized by construction — this is the documented
    partitioning assumption). Every output double is a pure function of
    four integers (n, n_a, n_b, N), so the result is exactly
    reproducible and SQL-replayable:

        pmi       = ln((N * n) / (n_a * n_b))
        expected  = n_a * n_b / N
        chi2_term = (n - e) * (n - e) / e
    """

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.groupby([col_a, col_b], sort=False, dropna=False)
                .size().rename("n").reset_index())

    cells = partial_grouped_agg(
        ds.map_batches(pre, batch_format="pandas"),
        [col_a, col_b], {"n": ("sum", "n")},
    ).to_pandas()

    cells = cells.sort_values([col_a, col_b], kind="mergesort").reset_index(drop=True)
    n = cells["n"].to_numpy(np.float64)
    na = cells.groupby(col_a)["n"].transform("sum").to_numpy(np.float64)
    nb = cells.groupby(col_b)["n"].transform("sum").to_numpy(np.float64)
    nn = float(cells["n"].sum())

    e = na * nb / nn
    pmi = np.log((nn * n) / (na * nb))
    chi2 = (n - e) * (n - e) / e
    return pd.DataFrame({
        col_a: cells[col_a], col_b: cells[col_b],
        "n": cells["n"].astype("int64"),
        "pmi": sql_round(pmi, 6),
        "chi2_term": sql_round(chi2, 6),
    })


def group_mad_outliers(ds, key: str, col: str, c: float = 3.0,
                       n_rows_hint: int | None = None):
    """Per-key robust dispersion: median, MAD (median absolute
    deviation) and the count of rows beyond ``c`` MADs — the outlier
    detector that, unlike z-scores, a few extreme values cannot mask.

    Medians use the quantile_cont interpolation expression
    ``lo + (hi - lo) * frac`` (the exact FP form DuckDB evaluates, see
    :func:`..windows.group_quantile_cont`); the outlier test compares
    UNROUNDED doubles so the SQL replay sees identical values.
    Partitioning assumption: one key's rows fit a task (bounded-
    cardinality keys); giant groups need the sketch path
    (:mod:`.sketch` DDSketch) instead.
    """

    def _interp_median(v: np.ndarray, starts: np.ndarray, n: np.ndarray) -> np.ndarray:
        pos = 0.5 * (n - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.ceil(pos).astype(np.int64)
        frac = pos - lo
        vlo = v[starts + lo]
        return vlo + (v[starts + hi] - vlo) * frac

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "med": pd.Series(dtype="float64"),
                                 "mad": pd.Series(dtype="float64"),
                                 "n_out": pd.Series(dtype="int64")})
        p = p.sort_values([key, col], kind="mergesort")
        keys_arr = p[key].to_numpy()
        v = p[col].to_numpy(np.float64)
        change = np.concatenate([[True], keys_arr[1:] != keys_arr[:-1]])
        starts = np.nonzero(change)[0]
        n = np.diff(np.concatenate([starts, [len(v)]]))
        med = _interp_median(v, starts, n)
        dev = np.abs(v - np.repeat(med, n))
        # median of deviations: second in-group sort (group order and
        # sizes are unchanged, so starts/n still apply)
        dv = (pd.DataFrame({"k": keys_arr, "d": dev})
              .sort_values(["k", "d"], kind="mergesort")["d"].to_numpy())
        mad = _interp_median(dv, starts, n)
        n_out = np.add.reduceat((dev > c * np.repeat(mad, n)).astype(np.int64), starts)
        return pd.DataFrame({key: keys_arr[starts],
                             "med": sql_round(med, 6),
                             "mad": sql_round(mad, 6),
                             "n_out": n_out.astype("int64")})

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def group_ks_drift(ds, key: str, col: str, flag_col: str,
                   n_rows_hint: int | None = None):
    """Two-sample Kolmogorov–Smirnov distance per key between the rows
    where ``flag_col`` is true (sample 1) and false (sample 2) — the
    exact distribution-drift test between two ingest windows /
    pipeline versions (complements the mean-delta drift report, which
    misses variance/shape moves).

    Per key the value axis is collapsed to distinct values with
    per-sample counts FIRST (a groupby, so the exchange is bounded by
    distinct values, not rows), then one cumulative pass gives both
    empirical CDFs and ``ks = max |cdf1 - cdf2|``. CDFs are int/int
    double divisions — bit-identical to the SQL window replay.
    """

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "ks": pd.Series(dtype="float64"),
                                 "n1": pd.Series(dtype="int64"),
                                 "n2": pd.Series(dtype="int64")})
        f = p[flag_col].to_numpy(bool)
        g = (pd.DataFrame({key: p[key].to_numpy(), "v": p[col].to_numpy(),
                           "c1": f.astype(np.int64), "c2": (~f).astype(np.int64)})
             .groupby([key, "v"], sort=True)[["c1", "c2"]].sum().reset_index())
        gb = g.groupby(key, sort=False)
        k1 = gb["c1"].cumsum().to_numpy(np.float64)
        k2 = gb["c2"].cumsum().to_numpy(np.float64)
        n1 = gb["c1"].transform("sum").to_numpy(np.int64)
        n2 = gb["c2"].transform("sum").to_numpy(np.int64)
        d = np.abs(k1 / n1 - k2 / n2)
        out = pd.DataFrame({key: g[key], "d": d, "n1": n1, "n2": n2})
        res = (out.groupby(key, sort=True)
               .agg(ks=("d", "max"), n1=("n1", "first"), n2=("n2", "first"))
               .reset_index())
        res["ks"] = sql_round(res["ks"], 6)
        res["n1"] = res["n1"].astype("int64")
        res["n2"] = res["n2"].astype("int64")
        return res

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def group_weighted_median(ds, key: str, val_col: str, weight_col: str,
                          n_rows_hint: int | None = None):
    """Weighted median of ``val_col`` per key (the 'median dollar', not
    the 'median row'): lower-weighted-median rule — ascending by value,
    first value whose cumulative weight reaches half the total
    (``2·cumw ≥ totw`` over INTEGER weights, so the pick is exact and
    replayable as a SQL window). Values collapse to distinct
    (value, Σweight) rows before the cumulative pass."""

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "wmedian": pd.Series(dtype="float64")})
        g = (p.assign(w=p[weight_col].astype("int64"))
             .groupby([key, val_col], sort=True)["w"].sum().reset_index())
        gb = g.groupby(key, sort=False)
        cw = gb["w"].cumsum().to_numpy()
        tot = gb["w"].transform("sum").to_numpy()
        hit = g[2 * cw >= tot]
        out = hit.groupby(key, sort=True)[val_col].first()
        return out.rename("wmedian").reset_index()

    return partitioned_apply(ds, [key], per_partition, n_rows_hint=n_rows_hint)


def benford_profile(ds, col: str, scale: int = 100) -> pd.DataFrame:
    """Leading-digit (Benford) profile of a positive numeric column —
    the classic fabricated-/corrupted-data screen a quality pipeline
    runs over monetary columns.

    Values are scaled to exact integers (``floor(x·scale + 0.5)``, same
    expression on the SQL side so there is no float-rounding
    divergence), the leading digit is computed with an
    exactly-corrected ``log10`` (float log10 of an exact int64 can be
    off by one at powers of ten; two integer comparisons repair it),
    and one 9-cell count combine is the only exchange — the column
    never leaves the mappers. Output per digit d ∈ 1..9: count,
    observed share and the Benford expectation ``log10(1 + 1/d)``,
    both rounded at 6 digits.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        x = batch[col].to_numpy(np.float64)
        n = np.floor(x * scale + 0.5).astype(np.int64)
        n = n[n > 0]
        if len(n) == 0:
            return pd.DataFrame({"digit": pd.Series(dtype="int64"),
                                 "n_vals": pd.Series(dtype="int64")})
        k = np.floor(np.log10(n.astype(np.float64))).astype(np.int64)
        p = np.power(10.0, k)
        k = np.where(n < p, k - 1, k)
        k = np.where(n >= 10 * np.power(10.0, k), k + 1, k)
        d = n // np.power(10, k).astype(np.int64)
        cnt = np.bincount(d, minlength=10)[1:10]
        keep = cnt > 0
        return pd.DataFrame({"digit": np.arange(1, 10)[keep],
                             "n_vals": cnt[keep].astype("int64")})

    cells = partial_grouped_agg(
        ds.select_columns([col]).map_batches(partial, batch_format="pandas"),
        ["digit"], {"n_vals": ("sum", "n_vals")},
    ).to_pandas().sort_values("digit", kind="mergesort").reset_index(drop=True)
    total = float(cells["n_vals"].sum())
    dig = cells["digit"].to_numpy(np.float64)
    out = pd.DataFrame({
        "digit": cells["digit"].astype("int64"),
        "n_vals": cells["n_vals"].astype("int64"),
        "share": sql_round(pd.Series(cells["n_vals"].to_numpy(np.float64) / total), 6),
        "expected": sql_round(pd.Series(np.log(1.0 + 1.0 / dig) / np.log(10.0)), 6),
    })
    return out


def unigram_kl(ds, text_col: str, split_col: str, value_a: str,
               value_b: str, vocab_size: int = 100,
               ndigits: int = 6) -> pd.DataFrame:
    """Corpus-drift report between two sub-corpora (A = rows with
    ``split_col == value_a``, B = ``value_b``): cross-entropy H(A, B),
    self-entropy H(A, A) and KL(A‖B) = H(A,B) − H(A,A) over a shared
    top-``vocab_size`` unigram vocabulary (by combined count), add-1
    smoothed — "how far did the token distribution move between these
    two sources/snapshots?", the language-model analogue of
    :func:`group_ks_drift`.

    One counting pass emits (token, n_a, n_b) partials; the combine is
    vocab-bounded; everything after it is a driver-side fold over ≤V
    rows. Exactly SQL-replayable: probabilities are add-1 count ratios
    over the same vocab on both sides."""
    import re

    TOK_RE = re.compile(r"[a-z0-9]+")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        side = batch[split_col].to_numpy()
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "n_a": pd.Series([], dtype="int64"),
                                 "n_b": pd.Series([], dtype="int64")})
        f = pd.DataFrame({
            "token": pd.Series([t for doc in toks_per_doc for t in doc],
                               dtype="object"),
            "a": np.repeat(side == value_a, lens),
            "b": np.repeat(side == value_b, lens),
        })
        g = f.groupby("token", sort=False)[["a", "b"]].sum()
        g = g[(g["a"] > 0) | (g["b"] > 0)]
        return pd.DataFrame({"token": g.index.to_numpy(),
                             "n_a": g["a"].to_numpy().astype("int64"),
                             "n_b": g["b"].to_numpy().astype("int64")})

    counts = partial_grouped_agg(
        ds.select_columns([text_col, split_col]).map_batches(
            partial, batch_format="pandas"),
        ["token"], {"n_a": ("sum", "n_a"), "n_b": ("sum", "n_b")},
    ).to_pandas()
    counts["n_tot"] = counts["n_a"] + counts["n_b"]
    vocab = counts.sort_values(["n_tot", "token"],
                               ascending=[False, True],
                               kind="mergesort").head(vocab_size)
    vocab = vocab.sort_values("token", kind="mergesort")  # fixed fold order
    v = float(len(vocab))
    na = vocab["n_a"].to_numpy(np.float64)
    nb = vocab["n_b"].to_numpy(np.float64)
    pa_ = (na + 1.0) / (na.sum() + v)
    pb_ = (nb + 1.0) / (nb.sum() + v)
    h_ab = float(-(pa_ * np.log(pb_)).sum())
    h_aa = float(-(pa_ * np.log(pa_)).sum())
    return pd.DataFrame({
        "vocab": [np.int64(len(vocab))],
        "h_cross": sql_round(pd.Series([h_ab]), ndigits),
        "h_self": sql_round(pd.Series([h_aa]), ndigits),
        "kl": sql_round(pd.Series([h_ab - h_aa]), ndigits),
    })


def group_regression(ds, key: str, ts_col: str, y_col: str,
                     day_offset: float = 19723.0,
                     ndigits: int = 6) -> pd.DataFrame:
    """Per-group OLS trend line y = slope·x + intercept with r², where
    x = days since ``day_offset`` (epoch days) — "is this metric
    drifting over time, per segment?". The distributed shape is the
    moments pattern: each batch emits per-key (n, Σx, Σy, Σxx, Σxy,
    Σyy) partials, one key-cardinality combine, closed-form fold.
    The closed forms share the exact expression tree with the SQL
    replay ((nΣxy − ΣxΣy)/(nΣxx − Σx²) etc.), and x is derived from
    exact integer microseconds on both sides, so only sum order can
    differ — rounded away at ``ndigits``."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        x = us.astype(np.float64) / 1000000.0 / 86400.0 - day_offset
        y = batch[y_col].to_numpy(np.float64)
        f = pd.DataFrame({key: batch[key].to_numpy(), "x": x, "y": y,
                          "xx": x * x, "xy": x * y, "yy": y * y})
        g = f.groupby(key, sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"), syy=("yy", "sum"))
        return g.reset_index()

    m = partial_grouped_agg(
        ds.select_columns([key, ts_col, y_col]).map_batches(
            partial, batch_format="pandas"),
        [key], {"n": ("sum", "n"), "sx": ("sum", "sx"),
                "sy": ("sum", "sy"), "sxx": ("sum", "sxx"),
                "sxy": ("sum", "sxy"), "syy": ("sum", "syy")},
    ).to_pandas().sort_values(key, kind="mergesort").reset_index(drop=True)
    n = m["n"].to_numpy(np.float64)
    sx, sy = m["sx"].to_numpy(), m["sy"].to_numpy()
    sxx, sxy, syy = m["sxx"].to_numpy(), m["sxy"].to_numpy(), m["syy"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return pd.DataFrame({
        key: m[key],
        "n": m["n"].astype("int64"),
        "slope": sql_round(pd.Series(slope), ndigits),
        "intercept": sql_round(pd.Series((sy - slope * sx) / n), ndigits),
        "r2": sql_round(pd.Series(
            (n * sxy - sx * sy) ** 2
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))), ndigits),
    })


def group_hhi(ds, key: str, member: str, val_col: str,
              ndigits: int = 6) -> pd.DataFrame:
    """Per-key Herfindahl–Hirschman concentration index over member
    shares: hhi = Σ_m (s_m / S)² where s_m is the member's total and S
    the key's total ("is one user/host eating this event type's whole
    budget?" — the crawl-politeness audit generalized). 1/n_members ≤
    hhi ≤ 1; higher = more concentrated.

    Shape: per-batch (key, member) partial sums, ONE combine exchange
    carrying one row per (batch, key, member), then a per-key-partition
    fold — raw rows never shuffle, and the fold input is
    member-cardinality-sized. Returns
    (key, n_members:int64, hhi:float64-rounded)."""

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({key: b[key].to_numpy(),
                              member: b[member].to_numpy(),
                              "s": b[val_col].to_numpy(np.float64)})
                .groupby([key, member], sort=False)
                .agg(s=("s", "sum")).reset_index())

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        # combine the per-batch partials AND fold, in one partition
        # task (member cardinality can reach ~10⁴ per key — past the
        # native-groupby comfort zone, so the combine is this same
        # coarse-hash exchange, cf. the basket-pair lesson)
        p = (p.groupby([key, member], sort=False)["s"].sum()
             .reset_index())
        tot = p.groupby(key, sort=False)["s"].transform("sum").to_numpy()
        share = p["s"].to_numpy(np.float64) / tot
        f = pd.DataFrame({key: p[key], "sq": share * share})
        out = (f.groupby(key, sort=False)
               .agg(n_members=("sq", "size"), hhi=("sq", "sum"))
               .reset_index())
        return pd.DataFrame({key: out[key],
                             "n_members": out["n_members"].astype("int64"),
                             "hhi": sql_round(out["hhi"], ndigits)})

    return partitioned_apply(ds.map_batches(pre, batch_format="pandas"),
                             [key], finish)


def group_moments(ds, key: str, col: str, ndigits: int = 6) -> pd.DataFrame:
    """Per-key sample skewness and EXCESS kurtosis via the two-pass
    centered-moment scheme: pass 1 folds (n, Σv) into per-key means;
    pass 2 sums (v−m)², (v−m)³, (v−m)⁴ against the BROADCAST means.
    Centering before powering keeps the third/fourth powers O(σ⁴)
    instead of O(v⁴), so the combine is numerically tame and the
    6-digit round absorbs summation-order ULPs.

        skew   = √n · M₃ / M₂^1.5          (population g₁)
        exkurt = n · M₄ / M₂² − 3          (population g₂ − 3)

    Shape: two map-only passes + two key-cardinality exchanges; the
    mean map broadcasts once via ``ray.put`` (key-cardinality-sized,
    the documented bound). Returns
    (key, n:int64, mean, skewness, exkurtosis — rounded)."""
    import ray

    means = partial_grouped_agg(
        ds.select_columns([key, col]).map_batches(
            lambda b: pd.DataFrame({key: b[key],
                                    "n": np.ones(len(b), np.int64),
                                    "s": b[col].to_numpy(np.float64)}),
            batch_format="pandas"),
        [key], {"n": ("sum", "n"), "s": ("sum", "s")}).to_pandas()
    means["m"] = means["s"] / means["n"]
    mref = ray.put(dict(zip(means[key], means["m"])))  # key-cardinality

    def centered(b: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(mref)
        c = b[col].to_numpy(np.float64) - b[key].map(mm).to_numpy(np.float64)
        c2 = c * c
        return (pd.DataFrame({key: b[key].to_numpy(), "m2": c2,
                              "m3": c2 * c, "m4": c2 * c2})
                .groupby(key, sort=False).sum().reset_index())

    m = partial_grouped_agg(
        ds.select_columns([key, col]).map_batches(
            centered, batch_format="pandas"),
        [key], {"m2": ("sum", "m2"), "m3": ("sum", "m3"),
                "m4": ("sum", "m4")},
    ).to_pandas().merge(means[[key, "n", "m"]], on=key)
    m = m.sort_values(key, kind="mergesort").reset_index(drop=True)
    n = m["n"].to_numpy(np.float64)
    m2 = m["m2"].to_numpy(np.float64)
    return pd.DataFrame({
        key: m[key], "n": m["n"].astype("int64"),
        "mean": sql_round(m["m"], ndigits),
        "skewness": sql_round(
            np.sqrt(n) * m["m3"].to_numpy(np.float64) / m2 ** 1.5, ndigits),
        "exkurtosis": sql_round(
            n * m["m4"].to_numpy() / (m2 * m2) - 3.0, ndigits)})


def mann_whitney_u(ds, key: str, arm_col: str, val_col: str,
                   num_partitions: int = 32,
                   ndigits: int = 6) -> pd.DataFrame:
    """Per-key two-sample Mann–Whitney U (rank-sum) test between arms
    0 and 1 with average-rank tie handling and the tie-corrected
    normal approximation — the non-parametric sibling of the Welch
    readout (``q_abtest``): robust to the heavy-tailed metrics an
    event log actually carries.

        U  = R₀ − n₀(n₀+1)/2       (R₀ = Σ avg-ranks of arm 0)
        z  = (U − n₀n₁/2) / √(n₀n₁/12 · ((N+1) − Σ(t³−t)/(N(N−1))))

    Keys missing an arm (or with a zero variance denominator) are
    excluded. Shape: ONE co-locating exchange on ``key``; ranking runs
    vectorized inside the key's partition task (the documented
    per-group-fits-a-task contract shared by the other rank operators;
    the at-scale path is the distributed rank machinery of
    ``group_rank`` feeding the same closed form). Returns
    (key, n_a:int64, n_b:int64, u_stat, z — rounded)."""
    from .grouped import partitioned_apply as papply

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in p.groupby(key, sort=False):
            v = g[val_col].to_numpy(np.float64)
            arm = g[arm_col].to_numpy(np.int64)
            n0, n1 = int((arm == 0).sum()), int((arm == 1).sum())
            if n0 == 0 or n1 == 0:
                continue
            order = np.argsort(v, kind="mergesort")
            ranks = np.empty(len(v), dtype=np.float64)
            # average ranks over tie runs
            sv = v[order]
            uniq, start = np.unique(sv, return_index=True)
            end = np.append(start[1:], len(sv))
            avg = (start + end - 1) / 2.0 + 1.0  # 1-based
            runs = np.repeat(avg, end - start)
            ranks[order] = runs
            r0 = float(ranks[arm == 0].sum())
            u = r0 - n0 * (n0 + 1) / 2.0
            nn = float(n0 + n1)
            t = (end - start).astype(np.float64)
            tie = float((t ** 3 - t).sum())
            var = n0 * n1 / 12.0 * ((nn + 1.0) - tie / (nn * (nn - 1.0)))
            if var <= 0.0:
                continue
            z = (u - n0 * n1 / 2.0) / np.sqrt(var)
            rows.append((kv, n0, n1, u, z))
        if not rows:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "n_a": pd.Series(dtype="int64"),
                                 "n_b": pd.Series(dtype="int64"),
                                 "u_stat": pd.Series(dtype="float64"),
                                 "z": pd.Series(dtype="float64")})
        out = pd.DataFrame(rows, columns=[key, "n_a", "n_b", "u_stat", "z"])
        out["n_a"] = out["n_a"].astype("int64")
        out["n_b"] = out["n_b"].astype("int64")
        out["u_stat"] = sql_round(out["u_stat"], ndigits)
        out["z"] = sql_round(out["z"], ndigits)
        return out

    return papply(ds.select_columns([key, arm_col, val_col]),
                  [key], finish, num_partitions=num_partitions)


def iqr_outliers(ds, key: str, col: str, k: float = 1.5,
                 ndigits: int = 6) -> pd.DataFrame:
    """Per-key Tukey-fence outlier counts: values outside
    [p25 − k·IQR, p75 + k·IQR] (the boxplot rule — the parametric-free
    sibling of ``group_mad_outliers`` when quartiles, not medians, are
    the convention). The fences derive from quantiles ROUNDED at
    ``ndigits`` on both engine and replay sides, so the comparison
    boundary is bit-identical by construction.

    Two passes: per-key interpolated quartiles (one key exchange via
    ``windows.group_quantile_cont``), then the fence map — key-
    cardinality-sized — broadcasts into a map-only counting pass with
    one tiny combine. Returns (key, p25, p75, n_low:int64,
    n_high:int64)."""
    import ray

    from .windows import group_quantile_cont

    q = group_quantile_cont(ds, key, col, {"p25": 0.25, "p75": 0.75},
                            ndigits=ndigits).to_pandas()
    p25 = q["p25"].to_numpy(np.float64)
    p75 = q["p75"].to_numpy(np.float64)
    lo = dict(zip(q[key], p25 - k * (p75 - p25)))
    hi = dict(zip(q[key], p75 + k * (p75 - p25)))
    lref = ray.put((lo, hi))  # key-cardinality broadcast

    def count(b: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = ray.get(lref)
        v = b[col].to_numpy(np.float64)
        kk = b[key]
        f = pd.DataFrame({
            key: kk,
            "n_low": (v < kk.map(lo_m).to_numpy(np.float64)).astype(np.int64),
            "n_high": (v > kk.map(hi_m).to_numpy(np.float64)).astype(np.int64),
        })
        return f.groupby(key, sort=False).sum().reset_index()

    c = partial_grouped_agg(
        ds.select_columns([key, col]).map_batches(count,
                                                  batch_format="pandas"),
        [key], {"n_low": ("sum", "n_low"), "n_high": ("sum", "n_high")}
    ).to_pandas()
    out = q.merge(c, on=key).sort_values(key, kind="mergesort")
    return pd.DataFrame({key: out[key], "p25": out["p25"],
                         "p75": out["p75"],
                         "n_low": out["n_low"].astype("int64"),
                         "n_high": out["n_high"].astype("int64")}
                        ).reset_index(drop=True)


def lorenz_deciles(ds, key: str, col: str, n_buckets: int = 10,
                   ndigits: int = 6) -> pd.DataFrame:
    """Per-key Lorenz-curve points: split the key's rows into
    ``n_buckets`` equal-count tiles ASCENDING by value (SQL NTILE
    convention — the first n mod nb tiles take the extra row) and
    report each tile's cumulative share of the key's total — the
    decile-resolution companion of the scalar Gini ("the top decile
    holds 62% of the value"). Tied values may land in either
    neighbouring tile, but tile SUMS are invariant under tie order, so
    the result is deterministic without a tie column.

    One co-locating key exchange; tiling and the cumulative fold are
    vectorized inside the partition task (the per-group-fits-a-task
    contract of the other rank operators). Returns
    (key, decile:int64, n:int64, cum_share:float64-rounded)."""

    def finish(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([key, col], kind="mergesort")
        keys_arr = p[key].to_numpy()
        v = p[col].to_numpy(np.float64)
        change = np.concatenate([[True], keys_arr[1:] != keys_arr[:-1]])
        starts = np.nonzero(change)[0]
        n = np.diff(np.concatenate([starts, [len(v)]]))
        rows = []
        for s, cnt in zip(starts, n):
            kv = keys_arr[s]
            g = v[s:s + cnt]
            q, r = divmod(int(cnt), n_buckets)
            sizes = np.full(n_buckets, q, dtype=np.int64)
            sizes[:r] += 1
            nz = sizes > 0
            ends = np.cumsum(sizes)
            cum = np.cumsum(g)[ends[nz] - 1]
            tot = cum[-1]
            dec = np.arange(1, n_buckets + 1, dtype=np.int64)[nz]
            rows.append(pd.DataFrame({
                key: kv, "decile": dec, "n": sizes[nz],
                "cum_share": sql_round(cum / tot, ndigits)}))
        if not rows:
            return pd.DataFrame({key: pd.Series(dtype=object),
                                 "decile": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "cum_share": pd.Series(dtype="float64")})
        return pd.concat(rows, ignore_index=True)

    return partitioned_apply(ds.select_columns([key, col]), [key], finish)


def markov_power(ds, seq_key: str, state_col: str, ts_col: str,
                 tie_col: str, steps: int = 3,
                 ndigits: int = 6) -> pd.DataFrame:
    """State distribution after ``steps`` Markov transitions: the
    row-normalized first-order transition matrix P is estimated from
    every key's time-ordered state sequence, the start vector x₀ from
    the keys' FIRST states, and the result is x₀·Pˢ — "where do user
    journeys stand after 3 clicks?". States with no outgoing
    transitions drop their mass (no renormalization), matching the
    inner-join semantics of the SQL replay.

    One co-locating exchange on ``seq_key``; the partition task emits
    transition-pair AND first-state count partials in the SAME
    vectorized pass; the combine and the power iteration are
    states²-sized driver math (states = event-type cardinality).
    Returns (state, p:float64-rounded)."""
    from .aggregate import partial_grouped_agg

    def per_part(p: pd.DataFrame) -> pd.DataFrame:
        p = p.sort_values([seq_key, ts_col, tie_col], kind="mergesort")
        g = p.groupby(seq_key, sort=False)
        prev = g[state_col].shift()
        m = prev.notna().to_numpy()
        tr = (pd.DataFrame({"f": prev[m].to_numpy(),
                            "t": p[state_col].to_numpy()[m]})
              .groupby(["f", "t"], sort=False).size()
              .rename("n").reset_index())
        tr["_kind"] = np.int64(0)
        first = (p[~m].groupby(state_col, sort=False).size()
                 .rename("n").reset_index())
        first.columns = ["f", "n"]
        first["t"] = first["f"]
        first["_kind"] = np.int64(1)
        return pd.concat([tr, first[["f", "t", "n", "_kind"]]],
                         ignore_index=True)

    parts = partitioned_apply(
        ds.select_columns([seq_key, state_col, ts_col, tie_col]),
        [seq_key], per_part)
    c = partial_grouped_agg(parts, ["f", "t", "_kind"],
                            {"n": ("sum", "n")}).to_pandas()  # states²
    states = np.sort(pd.unique(pd.concat([c["f"], c["t"]])))
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    cnt = np.zeros((k, k), dtype=np.int64)
    tr = c[c["_kind"] == 0]
    cnt[tr["f"].map(idx), tr["t"].map(idx)] = tr["n"]
    row = cnt.sum(axis=1)
    pmat = np.zeros((k, k))
    nz = row > 0
    pmat[nz] = cnt[nz] / row[nz, None].astype(np.float64)
    fi = c[c["_kind"] == 1]
    x = np.zeros(k)
    x[fi["f"].map(idx)] = fi["n"].to_numpy(np.float64)
    x = x / x.sum()
    for _ in range(steps):
        x = x @ pmat
    keep = x > 0
    return pd.DataFrame({state_col: states[keep],
                         "p": sql_round(x[keep], ndigits)})


def srm_check(ds, key: str, arm_col: str, ndigits: int = 6) -> pd.DataFrame:
    """Sample-ratio-mismatch check per key: the one-degree-of-freedom
    chi² of the observed arm split against the designed 50/50 — the
    guardrail every experimentation readout runs BEFORE trusting the
    effect estimate (a biased assignment invalidates q_abtest /
    q_mannwhitney downstream).

        chi² = (n₀ − n/2)²/(n/2) + (n₁ − n/2)²/(n/2)

    Map-side (key, arm) count partials, one key-cardinality combine,
    closed-form finish. Integer counts make the doubles exact up to
    the shared expression tree. Returns
    (key, n_a:int64, n_b:int64, chi2:float64-rounded)."""

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        arm = b[arm_col].to_numpy(np.int64)
        return (pd.DataFrame({key: b[key].to_numpy(),
                              "n0": (arm == 0).astype(np.int64),
                              "n1": (arm == 1).astype(np.int64)})
                .groupby(key, sort=False).sum().reset_index())

    g = partial_grouped_agg(
        ds.select_columns([key, arm_col]).map_batches(
            pre, batch_format="pandas"),
        [key], {"n0": ("sum", "n0"), "n1": ("sum", "n1")},
    ).to_pandas().sort_values(key, kind="mergesort").reset_index(drop=True)
    n0 = g["n0"].to_numpy(np.float64)
    n1 = g["n1"].to_numpy(np.float64)
    e = (n0 + n1) / 2.0
    chi2 = (n0 - e) * (n0 - e) / e + (n1 - e) * (n1 - e) / e
    return pd.DataFrame({key: g[key], "n_a": g["n0"].astype("int64"),
                         "n_b": g["n1"].astype("int64"),
                         "chi2": sql_round(chi2, ndigits)})


def adoption_curve(ds, id_col: str, ts_col: str,
                   num_partitions: int = 32) -> pd.DataFrame:
    """First-seen adoption curve: per calendar day, how many ids
    appeared for the FIRST time, with the running total — the
    'cumulative distinct users' a growth/coverage dashboard plots
    (and the crawl's new-hosts-per-round audit generalized).

    One id-keyed exchange folds per-batch (id, min day) partials to
    the global first-seen day (id cardinality can be corpus-scale, so
    the fold is the coarse-hash partition pattern, not a native
    groupby); day counts then combine through a calendar-bounded
    exchange and the cumulative sum is a driver fold over days.
    Integer-exact. Returns (day:int64, n_new:int64, cum_users:int64)."""

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        day = (pd.to_datetime(b[ts_col]).to_numpy()
               .astype("datetime64[D]").astype("int64"))
        return (pd.DataFrame({id_col: b[id_col].to_numpy(), "day": day})
                .groupby(id_col, sort=False).min().reset_index())

    def fold(p: pd.DataFrame) -> pd.DataFrame:
        first = (p.groupby(id_col, sort=False)["day"].min()
                 .reset_index())
        return (first.groupby("day", sort=False).size()
                .rename("n_new").reset_index())

    parts = partitioned_apply(
        ds.select_columns([id_col, ts_col]).map_batches(
            pre, batch_format="pandas"),
        [id_col], fold, num_partitions=num_partitions)
    days = partial_grouped_agg(parts, ["day"],
                               {"n_new": ("sum", "n_new")}).to_pandas()
    days = days.sort_values("day", kind="mergesort").reset_index(drop=True)
    return pd.DataFrame({
        "day": days["day"].astype("int64"),
        "n_new": days["n_new"].astype("int64"),
        "cum_users": days["n_new"].cumsum().astype("int64")})


def degree_assortativity(ds, src: str = "src", dst: str = "dst",
                         broadcast_nodes_max: int = 5_000_000,
                         num_partitions: int = 32,
                         ndigits: int = 6) -> pd.DataFrame:
    """Degree assortativity of the UNDIRECTED simple graph (Newman
    2002): the Pearson correlation of endpoint degrees over the
    symmetrized edge list — do hubs link to hubs (r > 0, social
    shape) or to leaves (r < 0, web/crawl shape)?

    Distinct undirected edges via one coarse-hash dedup exchange;
    degrees fold the same way; the degree map broadcasts once
    (node-cardinality-bounded — raises past ``broadcast_nodes_max``,
    where the join path of `graph._join_*` is the scale route); the
    correlation folds integer moment partials (degrees are ints, so
    every sum is EXACT and order-independent — the final r is the only
    double). Returns one row (n_edges:int64, r:float64-rounded)."""
    import ray

    from .grouped import partitioned_apply as papply

    def undirect(b: pd.DataFrame) -> pd.DataFrame:
        u = b[src].to_numpy(np.int64)
        v = b[dst].to_numpy(np.int64)
        keep = u != v  # simple graph: self-loops carry no mixing info
        return pd.DataFrame({"a": np.minimum(u, v)[keep],
                             "b": np.maximum(u, v)[keep]}).drop_duplicates()

    edges = papply(ds.map_batches(undirect, batch_format="pandas"),
                   ["a", "b"],
                   lambda p: p.drop_duplicates(["a", "b"]),
                   num_partitions=num_partitions)

    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([b["a"].to_numpy(np.int64),
                                b["b"].to_numpy(np.int64)])
        return (pd.DataFrame({"node": nodes})
                .groupby("node", sort=False).size()
                .rename("d").reset_index())

    deg = papply(edges.map_batches(deg_partial, batch_format="pandas"),
                 ["node"],
                 lambda p: p.groupby("node", sort=False)["d"].sum()
                 .reset_index(),
                 num_partitions=num_partitions).to_pandas()
    if len(deg) > broadcast_nodes_max:
        raise ValueError(
            f"degree_assortativity: {len(deg)} nodes exceeds the "
            f"broadcast gate ({broadcast_nodes_max}); use a degree join")
    dref = ray.put(dict(zip(deg["node"], deg["d"])))

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(dref)
        da = b["a"].map(dm).to_numpy(np.int64)
        db = b["b"].map(dm).to_numpy(np.int64)
        # symmetrized: each undirected edge contributes (da,db)+(db,da)
        return pd.DataFrame({
            "n": [np.int64(2 * len(b))],
            "sx": [int(da.sum() + db.sum())],
            "sxx": [int((da * da).sum() + (db * db).sum())],
            "sxy": [int(2 * (da * db).sum())]})

    m = (edges.map_batches(moments, batch_format="pandas")
         .to_pandas().sum())  # one row per batch, integer-exact
    n, sx = int(m["n"]), int(m["sx"])
    sxx, sxy = int(m["sxx"]), int(m["sxy"])
    # symmetric marginals (sy = sx, syy = sxx); moments stay exact
    # Python ints until the single closing division, mirroring the
    # replay's HUGEINT folds
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = float(num) / (np.sqrt(float(den)) * np.sqrt(float(den)))
    return pd.DataFrame({"n_edges": [np.int64(n // 2)],
                         "r": [float(sql_round(r, ndigits))]})
