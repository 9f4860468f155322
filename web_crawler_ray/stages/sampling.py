"""Deterministic sampling / splitting (training-data curation suite).

Every decision is a pure modular-hash function of the id column —
Knuth multiplicative hashing over int64 — so splits and samples are
reproducible across runs and cluster sizes, require ZERO shuffle
(each row decides independently inside map_batches), and are
SQL-replayable exactly (integer arithmetic only, no engine RNG).

No reference counterpart: the reference is a scraper; these are the
train/test-split and per-stratum downsampling stages a 100-TB
training-data pipeline puts between dedup and the sink.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Knuth's multiplicative constant; bucket = ((id mod 2^31) * K) mod
# 2^32 mod M. The id is folded to 31 bits INSIDE the primitive so the
# int64 product never overflows (ids ≳ 3.5e9 would otherwise wrap
# silently in numpy while DuckDB promotes to HUGEINT, diverging from
# the SQL replay); for ids < 2^31 the fold is the identity.
KNUTH = 2654435761
_FOLD = 1 << 31


def hash_bucket(ids: np.ndarray, mod: int) -> np.ndarray:
    """Deterministic bucket in [0, mod) per id — the primitive both
    stages and their SQL oracles share (`(id % 2147483648) *
    2654435761 % 4294967296 % mod`)."""
    folded = ids.astype(np.int64) % _FOLD
    return ((folded * KNUTH) % (1 << 32)) % mod


def hash_split(ds, id_col: str, train_frac: float = 0.8, mod: int = 10,
               out_col: str = "split"):
    """Tag each row 'train' / 'test' by hash bucket: bucket <
    train_frac * mod → train. Stateless per-row decision — streams at
    any scale, stable under repartitioning, and a given id always
    lands in the same split (the property random() splits lose)."""
    thresh = int(round(train_frac * mod))

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), mod)
        batch = batch.copy()
        batch[out_col] = np.where(b < thresh, "train", "test")
        return batch

    return ds.map_batches(tag, batch_format="pandas")


def stratified_sample(ds, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      mod: int = 1000):
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket (in [0, mod)) falls below rate[stratum] * mod. Rebalances
    skewed strata (the over-represented-language / boilerplate-source
    problem) without a shuffle or an RNG; nested samples at decreasing
    rates are strict subsets (bucket < r2*mod ⊂ bucket < r1*mod)."""
    thresholds = {s: int(round(r * mod)) for s, r in rates.items()}
    default_thresh = int(round(default_rate * mod))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), mod)
        thr = (
            batch[stratum_col].map(thresholds).fillna(default_thresh).to_numpy()
        )
        return batch[b < thr]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(ds, id_col: str, weight_col: str, k: int,
                    mod: int = 1_000_000):
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res, public algorithm): each row gets key =
    u^(1/w) with u a deterministic hash-uniform in (0,1); the k largest
    keys are the sample, with inclusion probability proportional to
    weight. No RNG, no shuffle: per-batch vectorized keys + per-batch
    top-k partials, a ≤k·batches driver merge — and the same integer
    hash + pow expression replays exactly in SQL.

    Ties at equal key (hash-collision granularity 1/mod) break by
    ascending id on both sides."""

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        u = (hash_bucket(ids, mod) + 1.0) / (mod + 1.0)  # (0, 1], never 0
        w = batch[weight_col].to_numpy(dtype=np.float64)
        out = pd.DataFrame({id_col: ids, "es_key": u ** (1.0 / w)})
        return out.sort_values(["es_key", id_col], ascending=[False, True],
                               kind="mergesort").head(k)

    partials = ds.map_batches(score_topk, batch_format="pandas").to_pandas()
    return (partials.sort_values(["es_key", id_col], ascending=[False, True],
                                 kind="mergesort")
            .head(k).reset_index(drop=True))


def cap_per_group(ds, group_col: str, id_col: str, k: int,
                  num_partitions: int = 32, n_rows_hint: int | None = None):
    """Deterministic per-group row cap — the "at most k documents per
    domain / per dedup cluster" curation stage. Winners are the k rows
    with the smallest (hash(id), id) per group, so the kept set is a
    pure function of the data (stable across runs, cluster sizes and
    repartitioning — the property a resumable 100-TB run needs), and
    nested caps are consistent: the k'=5 winners are a subset of the
    k=10 winners.

    One coarse shuffle on the group key with a map-side combiner
    (batch-local top-k per group — winner-of-winners under a fixed sort
    order is the global winner, so the shuffle carries ≤ k rows per
    (batch, group)); inside each partition one vectorized sort +
    groupby-head. SQL replay: QUALIFY row_number() OVER (PARTITION BY
    group ORDER BY hash_expr, id) <= k with the shared hash_bucket
    expression."""
    from .grouped import partitioned_apply

    def top_k(part: pd.DataFrame) -> pd.DataFrame:
        part = part.assign(
            __h=hash_bucket(part[id_col].to_numpy(), 1 << 32))
        part = part.sort_values([group_col, "__h", id_col],
                                kind="mergesort")
        return (part.groupby(group_col, sort=False, dropna=False)
                .head(k).drop(columns="__h"))

    return partitioned_apply(ds, [group_col], top_k, num_partitions,
                             n_rows_hint=n_rows_hint, pre_combine=top_k)


def epoch_shuffle_plan(ds, id_col: str, num_shards: int, seed: int = 0,
                       num_partitions: int = 32,
                       n_rows_hint: int | None = None):
    """Deterministic training-epoch shuffle PLAN: every row gets a
    pseudo-random sort key ``k = hash(id + seed)``, lands in shard
    ``k % num_shards`` and position ``rank of (k, id) within the
    shard`` — i.e. the (shard, pos) address a data loader would read
    it from. Changing ``seed`` reshuffles; the same seed reproduces
    the identical epoch order on any cluster size (the property an
    elastic resume needs, which ``random_shuffle()`` can't give).

    Scale shape: the key/shard assignment is map-side integer
    arithmetic; only (id, key, shard) — 24 B/row — enters the one
    hash-partitioned exchange, and the per-shard rank is an
    in-partition vectorized argsort. The corpus payload never moves;
    the plan joins back by id at read time. SQL replay: the shared
    ``hash_bucket`` expression + row_number() OVER (PARTITION BY shard
    ORDER BY k, id)."""
    from .grouped import partitioned_apply

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        k = hash_bucket(ids + seed, 1 << 32)
        return pd.DataFrame({id_col: ids, "k": k.astype("int64"),
                             "shard": (k % num_shards).astype("int64")})

    def rank(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["shard", "k", id_col], kind="mergesort")
        pos = part.groupby("shard", sort=False).cumcount()
        return pd.DataFrame({id_col: part[id_col].to_numpy(),
                             "shard": part["shard"].to_numpy(),
                             "pos": pos.to_numpy().astype("int64")})

    keyed = ds.select_columns([id_col]).map_batches(
        assign, batch_format="pandas")
    return partitioned_apply(keyed, ["shard"], rank, num_partitions,
                             n_rows_hint=n_rows_hint)


def mixture_plan(ds, id_col: str, source_col: str, weights: dict[str, float],
                 default_weight: float = 1.0, mod: int = 1000):
    """Data-mixture repetition plan: each source gets a target epoch
    weight w (0.5 = sample half, 2.3 = repeat ~2.3×); every doc emits
    ``n_repeats = floor(w) + (1 if hash(id) < frac(w)·mod)`` so the
    EXPECTED per-source token share matches the recipe while the
    decision stays a pure per-row hash — zero shuffle, reproducible,
    and nested (raising a weight never drops a previously kept doc).
    This is the mixture/repetition stage of LLM data recipes
    (over-sample wiki, down-sample web) executed as a plan column.
    """
    floors = {s: int(np.floor(w)) for s, w in weights.items()}
    fracs = {s: int(round((w - np.floor(w)) * mod)) for s, w in weights.items()}
    d_floor = int(np.floor(default_weight))
    d_frac = int(round((default_weight - np.floor(default_weight)) * mod))

    def plan(batch: pd.DataFrame) -> pd.DataFrame:
        b = hash_bucket(batch[id_col].to_numpy(), mod)
        fl = batch[source_col].map(floors).fillna(d_floor).to_numpy(np.int64)
        fr = batch[source_col].map(fracs).fillna(d_frac).to_numpy(np.int64)
        batch = batch.copy()
        batch["n_repeats"] = fl + (b < fr).astype(np.int64)
        return batch

    return ds.map_batches(plan, batch_format="pandas")


def sample_exact_k(ds, id_col: str, k: int):
    """EXACTLY-k uniform sample without replacement: rank every id by
    its 32-bit multiplicative hash and keep the k smallest (ties broken
    by id). Unlike the per-row Bernoulli splits this guarantees the
    sample SIZE; unlike ``Dataset.random_sample`` it is seed-free
    deterministic and replayable in SQL (``ORDER BY h, id LIMIT k``).

    Distributed as a partial top-k per batch (np.lexsort over at most
    the batch) followed by one k-row-per-batch merge — the exchange is
    O(k · n_batches), never the corpus.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        h = ((ids % _FOLD) * KNUTH) % (1 << 32)
        o = np.lexsort((ids, h))[:k]
        return pd.DataFrame({id_col: ids[o], "h": h[o].astype("int64")})

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        o = np.lexsort((batch[id_col].to_numpy(), batch["h"].to_numpy()))[:k]
        return batch.iloc[o].reset_index(drop=True)

    parts = ds.select_columns([id_col]).map_batches(partial, batch_format="pandas")
    return parts.repartition(1).map_batches(final, batch_format="pandas")


def token_budget_select(ds, id_col: str, quality_col: str, token_col: str,
                        budget: int):
    """Greedy token-budget corpus selection WITHOUT a global sort: keep
    the best documents (by ``quality_col`` desc, ``id_col`` asc) whose
    running token total stays within ``budget`` — exactly the rows a
    ``SUM(tokens) OVER (ORDER BY quality DESC, id) <= budget`` window
    would keep.

    Instead of globally sorting the corpus, pass 1 combines per-QUALITY
    token sums (exchange bounded by distinct quality values, not
    rows); the driver finds the boundary quality level from the
    descending cumulative sums; only the boundary level's rows (a tie
    group) are pulled to resolve the intra-level prefix by id. The
    final pass is a broadcast filter. Same 2-pass shape as
    rank_transform."""
    import ray

    from .graph import grouped_sum

    slim = ds.select_columns(list(dict.fromkeys([id_col, quality_col, token_col])))
    if quality_col == token_col:
        per_q = grouped_sum(
            slim.select_columns([quality_col]).add_column(
                "_tok", lambda b: b[quality_col]),
            quality_col, "_tok", "toks",
        ).to_pandas()
    else:
        per_q = grouped_sum(
            slim.select_columns([quality_col, token_col]),
            quality_col, token_col, "toks",
        ).to_pandas()
    per_q = per_q.sort_values(quality_col, ascending=False, kind="mergesort")

    cum = per_q["toks"].cumsum()
    full = per_q[cum <= budget]
    q_min_full = full[quality_col].min() if len(full) else None
    spent = int(full["toks"].sum())
    boundary = per_q[~per_q.index.isin(full.index)].head(1)

    boundary_ids: set = set()
    if len(boundary):
        q_star = boundary[quality_col].iloc[0]

        def only_boundary(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[batch[quality_col] == q_star]

        tie = (slim.map_batches(only_boundary, batch_format="pandas")
               .to_pandas().sort_values(id_col, kind="mergesort"))
        within = tie[token_col].cumsum() + spent <= budget
        boundary_ids = set(tie[id_col][within].tolist())

    ids_ref = ray.put(boundary_ids)
    threshold = q_min_full

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        bid = ray.get(ids_ref)
        mask = batch[id_col].isin(bid)
        if threshold is not None:
            mask = mask | (batch[quality_col] >= threshold)
        return batch[mask]

    return slim.map_batches(keep, batch_format="pandas")
