"""Deduplication operators (SURVEY.md §2.7 D1-D4 + training-data suite).

- exact latest-wins (reference D1, pacong/data/processor.py:335-380);
- exact content-hash dedup (hash-partition + per-group first);
- MinHash+LSH near-dup (shingle → minhash → band → bucket groupby);
- SimHash near-dup (band groupby on hash chunks);
- n-gram Jaccard verification of candidate pairs;
- embedding-cosine near-dup (LSH-free small-scale; bucketed at scale).

Scale notes: every variant is shaped as ``map_batches`` (per-row
signatures, vectorized) → explode to (bucket_key, id) → ``groupby``
on the bucket key → per-group candidate verification. The groupby is
the only shuffle and its payload is (key, id, signature), never the
full document — at 100 TB the text/bytes stay columnar in the source
and only fixed-width keys move.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import text as T
from ..config import auto_concurrency
from .grouped import (grouped_triu, partitioned_apply,
                      partitioned_drop_duplicates)


def latest_wins_reducer(group: pd.DataFrame, ts_col: str, tie_col: str, source_col: str | None) -> pd.DataFrame:
    """D1 merge semantics (processor.py:362-377): keep the row with max
    ``ts_col`` (deterministic tie-break on ``tie_col``); if multiple
    distinct sources contributed, replace source with the comma-joined
    *sorted* distinct set (the reference joins an unordered ``set`` —
    nondeterministic; we pin sorted order, documented divergence)."""
    idx = group.sort_values([ts_col, tie_col], ascending=[False, False], kind="mergesort").index[0]
    winner = group.loc[[idx]].copy()
    if source_col is not None and source_col in group.columns:
        sources = sorted({s for s in group[source_col] if s})
        if len(sources) > 1:
            winner[source_col] = ",".join(sources)
    return winner


def _latest_wins_partition(part: pd.DataFrame, keys: list[str], ts_col: str,
                           tie_col: str, source_col: str | None) -> pd.DataFrame:
    """Vectorized per-partition D1: one stable sort + drop_duplicates
    picks every key group's winner, and the source-union fix-up touches
    ONLY keys with >1 distinct truthy source (the rare case) — no
    per-group Python call on the 10^8-distinct-keys path. Output is
    identical to mapping :func:`latest_wins_reducer` over each group
    (property-tested)."""
    part = part.sort_values(
        [*keys, ts_col, tie_col],
        ascending=[True] * len(keys) + [False, False],
        kind="mergesort",
    )
    winners = part.drop_duplicates(subset=keys, keep="first")
    if source_col is not None and source_col in part.columns and len(part):
        src = part[[*keys, source_col]]
        src = src[src[source_col].astype(bool)].drop_duplicates()
        multi = src[src.duplicated(subset=keys, keep=False)]
        if len(multi):
            joined = (
                multi.sort_values([*keys, source_col], kind="mergesort")
                .groupby(keys, sort=False)[source_col]
                .agg(",".join)
                .reset_index()
                .rename(columns={source_col: "__union_src"})
            )
            winners = winners.merge(joined, on=keys, how="left")
            hit = winners["__union_src"].notna()
            winners.loc[hit, source_col] = winners.loc[hit, "__union_src"]
            winners = winners.drop(columns="__union_src")
    return winners


def dedup_latest_wins(ds, keys: list[str], ts_col: str, tie_col: str, source_col: str | None = None,
                      n_rows_hint: int | None = None):
    """D1 as coarse-hash-partitioned shuffle + ONE vectorized pass per
    partition (sort + drop_duplicates + rare-key source-union fix-up),
    not one Python call per key group. ``n_rows_hint`` gates small-input
    block consolidation before the shuffle."""
    return partitioned_apply(
        ds, keys,
        lambda p: _latest_wins_partition(p, keys, ts_col, tie_col, source_col),
        num_partitions=32, n_rows_hint=n_rows_hint,
    )


def add_content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    """Vectorized-enough md5 per batch (matches DuckDB ``md5`` for the
    oracle); one C-call per row, no Python string munging."""
    vals = batch[text_col].to_pylist()
    hashes = [md5((v or "").encode()).hexdigest() for v in vals]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def dedup_exact(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: hash-partition on content hash, keep min id per group."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
    # pre_dedup: the min-id winner per hash survives batch-local
    # selection, so the shuffle carries one row per (batch, hash)
    return partitioned_drop_duplicates(
        hashed, ["content_hash"], sort_keys=["content_hash", id_col], pre_dedup=True
    )


class MinHashSignatures:
    """map_batches stage: text → minhash signature + LSH band keys,
    exploded to one row per (band_key, id). Whole-batch numpy kernels
    (one crc32 table pass over every doc's shingle windows, reduceat
    per-doc minima, vectorized band crc) — bit-identical to the per-doc
    formulation (property-tested). Stateless after the round-2 rewrite
    (permutation params are two 512-B arrays shipped in the closure),
    so it runs as a TASK pool — no actor spin-up per query."""

    def __init__(self, num_perm: int = 64, bands: int = 16, k: int = 5,
                 text_col: str = "text", id_col: str = "doc_id", seed: int = 7):
        self.a, self.b = T.minhash_params(num_perm, seed)
        self.bands = bands
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        sigs = T.minhash_signatures_batch(texts, self.a, self.b, self.k)
        keys = T.lsh_band_keys_batch(sigs, self.bands)
        rep = np.repeat(np.arange(n, dtype=np.int64), self.bands)
        sig_bytes = [s.tobytes() for s in sigs]  # one bytes obj per doc
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                self.id_col: batch[self.id_col].take(pa.array(rep)),
                "sig": pa.array([sig_bytes[i] for i in rep], pa.binary()),
            }
        )


def _pairs_from_bucket(group: pd.DataFrame, id_col: str, threshold: float) -> pd.DataFrame:
    """Candidate pairs within one LSH bucket, verified by estimated
    Jaccard (signature agreement rate). Deterministic (ids sorted)."""
    rows = group.drop_duplicates(subset=[id_col]).sort_values(id_col, kind="mergesort")
    ids = rows[id_col].to_numpy()
    sigs = [np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]]
    a_out, b_out, est = [], [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            jac = float((sigs[i] == sigs[j]).mean())
            if jac >= threshold:
                a_out.append(ids[i])
                b_out.append(ids[j])
                est.append(jac)
    return pd.DataFrame(
        {
            "id_a": pd.Series(a_out, dtype="int64"),
            "id_b": pd.Series(b_out, dtype="int64"),
            "est_jaccard": pd.Series(est, dtype="float64"),
        }
    )


def _verify_lsh_partition(part: pd.DataFrame, id_col: str, threshold: float,
                          num_perm: int) -> pd.DataFrame:
    """Vectorized per-PARTITION LSH verification: one numpy pass over
    every bucket in the hash partition instead of one pandas DataFrame
    per bucket (buckets are tiny and numerous — per-bucket Python
    overhead dominated the stage). Signature matrices are compared
    all-pairs per bucket via broadcasting; identical output (sorted
    ids, same threshold rule) to the per-bucket reference
    ``_pairs_from_bucket``."""
    part = part.drop_duplicates(subset=["band_key", id_col]).sort_values(
        ["band_key", id_col], kind="mergesort"
    )
    if part.empty:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    sigs = np.frombuffer(b"".join(part["sig"]), dtype=np.uint64).reshape(-1, num_perm)
    keys = part["band_key"].to_numpy()
    ids = part[id_col].to_numpy()
    # size-class triu pair enumeration, then ONE row-wise signature
    # comparison over all candidate pairs — O(P·num_perm) instead of
    # Σ g²·num_perm per-bucket broadcasting, and no per-bucket loop
    ia, ib = grouped_triu(keys)
    if not len(ia):
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64")}
        )
    jac = (sigs[ia] == sigs[ib]).mean(axis=1)
    hit = jac >= threshold
    return pd.DataFrame(
        {"id_a": ids[ia[hit]].astype("int64"),
         "id_b": ids[ib[hit]].astype("int64"),
         "est_jaccard": jac[hit].astype("float64")}
    )


def minhash_near_dup_pairs(ds, text_col="text", id_col="doc_id",
                           num_perm=64, bands=16, k=5, threshold=0.6, concurrency=None,
                           n_docs_hint: int | None = None):
    """MinHash+LSH near-duplicate pairs: signatures (task pool, batch
    numpy kernels) → one shuffle on hash(band_key) → vectorized
    per-partition bucket verify → global distinct pairs.
    ``n_docs_hint`` (parquet footer count — metadata-only) gates
    small-input block consolidation. ``concurrency`` kept for API
    compatibility (task pools self-scale)."""
    sign = MinHashSignatures(num_perm=num_perm, bands=bands, k=k,
                             text_col=text_col, id_col=id_col)
    exploded = ds.map_batches(sign, batch_format="pyarrow")

    n_exploded = None if n_docs_hint is None else n_docs_hint * bands
    pairs = partitioned_apply(
        exploded, ["band_key"],
        lambda p: _verify_lsh_partition(p, id_col, threshold, num_perm),
        num_partitions=32, n_rows_hint=n_exploded,
    )
    # same pair can surface from multiple bands → distinct (pairs are
    # verify output: always ≪ exploded rows)
    return partitioned_drop_duplicates(
        pairs, ["id_a", "id_b"], num_partitions=8, n_rows_hint=n_exploded,
    )


class SimHashStage:
    """map_batches stage: text → simhash64 + 4×16-bit band keys (near-dup
    candidates differ in ≤3 bands ⇒ hamming ≤ 16·3 guaranteed window;
    verification computes true hamming)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        h = T.simhash64_batch(texts)  # int64, one token-hash per DISTINCT token per batch
        hu = h.view(np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        # (n × 4) band keys: (band << 16) | 16-bit chunk
        keys = ((bands[None, :] << np.uint64(16))
                | ((hu[:, None] >> (bands[None, :] * np.uint64(16))) & np.uint64(0xFFFF)))
        rep = np.repeat(np.arange(n, dtype=np.int64), 4)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1).astype(np.int64), pa.int64()),
                self.id_col: batch[self.id_col].take(pa.array(rep)),
                "simhash": pa.array(np.repeat(h, 4), pa.int64()),
            }
        )


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return _POPCNT8[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)].sum(
        axis=1, dtype=np.int64
    )


def _verify_simhash_partition(part: pd.DataFrame, id_col: str,
                              max_hamming: int) -> pd.DataFrame:
    """One numpy pass over every band bucket in a hash partition:
    per-bucket all-pairs XOR + table-lookup popcount (same output as
    the per-pair Python formulation, minus the per-bucket overhead)."""
    part = part.drop_duplicates(subset=["band_key", id_col]).sort_values(
        ["band_key", id_col], kind="mergesort"
    )
    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
         "hamming": pd.Series(dtype="int64")}
    )
    if part.empty:
        return empty
    ids = part[id_col].to_numpy()
    keys = part["band_key"].to_numpy()
    hs = part["simhash"].to_numpy().view(np.uint64)  # same bits, unsigned view
    # size-class triu pair enumeration + one vectorized popcount pass
    ia, ib = grouped_triu(keys)
    a_out, b_out, d_out = [], [], []
    if len(ia):
        d = _popcount64(hs[ia] ^ hs[ib])
        hit = d <= max_hamming
        if hit.any():
            a_out.append(ids[ia[hit]])
            b_out.append(ids[ib[hit]])
            d_out.append(d[hit])
    if not a_out:
        return empty
    return pd.DataFrame(
        {"id_a": np.concatenate(a_out).astype("int64"),
         "id_b": np.concatenate(b_out).astype("int64"),
         "hamming": np.concatenate(d_out).astype("int64")}
    )


def simhash_near_dup_pairs(ds, text_col="text", id_col="doc_id", max_hamming=8,
                           n_docs_hint: int | None = None):
    exploded = ds.map_batches(SimHashStage(text_col=text_col, id_col=id_col),
                              batch_format="pyarrow")
    n_exploded = None if n_docs_hint is None else n_docs_hint * 4
    pairs = partitioned_apply(
        exploded, ["band_key"],
        lambda p: _verify_simhash_partition(p, id_col, max_hamming),
        num_partitions=32, n_rows_hint=n_exploded,
    )
    return partitioned_drop_duplicates(
        pairs, ["id_a", "id_b"], num_partitions=8, n_rows_hint=n_exploded,
    )


class HashBands:
    """map_batches stage: an EXISTING 64-bit hash column (phash,
    simhash, any fingerprint) → 4×16-bit band keys, reusing the
    simhash verify kernel downstream. By pigeonhole, two hashes with
    hamming ≤ 3 agree on at least one of the 4 bands, so for
    ``max_hamming ≤ 3`` the banded pipeline is EXACT (identical to
    all-pairs); above that it is LSH-approximate."""

    def __init__(self, hash_col: str, id_col: str):
        self.hash_col = hash_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch[self.hash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(h)
        hu = h.view(np.uint64)
        bands = np.arange(4, dtype=np.uint64)
        keys = ((bands[None, :] << np.uint64(16))
                | ((hu[:, None] >> (bands[None, :] * np.uint64(16))) & np.uint64(0xFFFF)))
        rep = np.repeat(np.arange(n, dtype=np.int64), 4)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1).astype(np.int64), pa.int64()),
                self.id_col: batch[self.id_col].take(pa.array(rep)),
                "simhash": pa.array(np.repeat(h, 4), pa.int64()),
            }
        )


def hash_near_dup_pairs(ds, hash_col: str, id_col: str, max_hamming: int = 3,
                        n_rows_hint: int | None = None):
    """Near-duplicate (id_a, id_b, hamming) pairs over a precomputed
    64-bit hash column — the image-corpus counterpart of
    :func:`simhash_near_dup_pairs` (phash near-dedup): band-key shuffle
    only, vectorized per-bucket XOR+popcount verify, global distinct.
    Exact for ``max_hamming ≤ 3`` (see :class:`HashBands`)."""
    exploded = ds.map_batches(HashBands(hash_col, id_col), batch_format="pyarrow")
    n_exploded = None if n_rows_hint is None else n_rows_hint * 4
    pairs = partitioned_apply(
        exploded, ["band_key"],
        lambda p: _verify_simhash_partition(p, id_col, max_hamming),
        num_partitions=32, n_rows_hint=n_exploded,
    )
    return partitioned_drop_duplicates(
        pairs, ["id_a", "id_b"], num_partitions=8, n_rows_hint=n_exploded,
    )


def ngram_jaccard_verify(ds_pairs, docs_ds, k: int = 5, threshold: float = 0.5,
                         id_a="id_a", id_b="id_b", id_col="doc_id", text_col="text"):
    """Verify candidate pairs with true k-gram Jaccard, shipping only
    candidate texts. The candidate PAIR set is small by construction
    (bounded by the LSH bands), so: broadcast the candidate id SET,
    semi-join filter the documents table with a streaming scan (no
    shuffle, the corpus never leaves its blocks), pull just the
    |candidates| matching texts, and verify the pairs distributively
    against that small broadcast lookup. The broadcast payload is
    ∝ candidates, never the corpus."""
    import ray

    pairs = ds_pairs.materialize()
    id_tab = pairs.select_columns([id_a, id_b]).to_pandas()
    ids = np.unique(
        np.concatenate([id_tab[id_a].to_numpy(), id_tab[id_b].to_numpy()])
    )
    ids_ref = ray.put(np.sort(ids))

    def semi_filter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        v = batch[id_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(wanted, v)
        np.minimum(pos, max(len(wanted) - 1, 0), out=pos)
        mask = wanted[pos] == v if len(wanted) else np.zeros(len(v), dtype=bool)
        return batch.filter(pa.array(mask))

    texts = (
        docs_ds.select_columns([id_col, text_col])
        .map_batches(semi_filter, batch_format="pyarrow")
        .to_pandas()
    )
    lookup_ref = ray.put(dict(zip(texts[id_col], texts[text_col])))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(lookup_ref)
        keep, jac = [], []
        for a, b in zip(batch[id_a], batch[id_b]):
            ja = T.jaccard(T.char_shingles(lookup.get(a, ""), k), T.char_shingles(lookup.get(b, ""), k))
            keep.append(ja >= threshold)
            jac.append(ja)
        batch = batch.copy()
        batch["jaccard"] = jac
        return batch[np.array(keep, dtype=bool)]

    return pairs.map_batches(verify, batch_format="pandas")


def phash_dup_groups(ds, phash_col: str = "phash", id_col: str = "image_id"):
    """D4 — exact perceptual-hash dup groups over the image corpus:
    hash-partition on phash, keep groups of size > 1, emit
    (phash, n_dups, ids). Vectorized per partition: singleton keys
    (the vast majority) are dropped by a duplicated() mask before any
    per-group work; the id join runs only over actual dup groups."""
    def collect_partition(part: pd.DataFrame) -> pd.DataFrame:
        sub = part[part.duplicated(subset=[phash_col], keep=False)].copy()
        if sub.empty:
            return pd.DataFrame(
                {phash_col: pd.Series([], dtype="int64"),
                 "n_dups": pd.Series([], dtype="int64"),
                 "ids": pd.Series([], dtype=object)}
            )
        sub["__sid"] = sub[id_col].astype(str)
        sub = sub.sort_values([phash_col, "__sid"], kind="mergesort")
        g = sub.groupby(phash_col, sort=True)["__sid"]
        out = pd.DataFrame(
            {phash_col: g.size().index.astype("int64"),
             "n_dups": g.size().to_numpy().astype("int64"),
             "ids": g.agg(",".join).to_numpy()}
        )
        return out

    return partitioned_apply(ds, [phash_col], collect_partition, num_partitions=32)


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  text_col: str = "text", num_partitions: int = 32):
    """Incremental corpus diff between two snapshots: per id, 'added'
    (new only), 'removed' (old only) or 'changed' (both sides, content
    hash differs); unchanged rows are dropped — at 100 TB the diff
    output is the small delta, never the corpus. The recompute-only-
    what-changed primitive of an incremental curation pipeline.

    Shape: both sides hash their text MAP-SIDE (md5, the same digest
    the exact-dedup stage uses — DuckDB replays it), so the single
    co-locating shuffle carries (id, 32-byte hex, side-tag) — payload
    text never moves. One vectorized pivot per partition classifies
    every id group; ids are unique per side by contract (snapshots are
    post-dedup)."""
    from .grouped import partitioned_apply

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            hashed = add_content_hash(batch, text_col)
            n = hashed.num_rows
            return pa.table({
                id_col: hashed[id_col],
                "h": hashed["content_hash"],
                "side": pa.array([side] * n, pa.string()),
            })
        return fn

    both = (old_ds.select_columns([id_col, text_col])
            .map_batches(tag("old"), batch_format="pyarrow")
            .union(new_ds.select_columns([id_col, text_col])
                   .map_batches(tag("new"), batch_format="pyarrow")))

    def classify(part: pd.DataFrame) -> pd.DataFrame:
        wide = part.pivot(index=id_col, columns="side", values="h")
        old_h = wide["old"] if "old" in wide else pd.Series(pd.NA, index=wide.index)
        new_h = wide["new"] if "new" in wide else pd.Series(pd.NA, index=wide.index)
        status = np.where(
            old_h.isna(), "added",
            np.where(new_h.isna(), "removed",
                     np.where(old_h != new_h, "changed", "unchanged")))
        out = pd.DataFrame({id_col: wide.index.to_numpy(),
                            "status": status})
        return out[out["status"] != "unchanged"].reset_index(drop=True)

    return partitioned_apply(both, [id_col], classify,
                             num_partitions=num_partitions)


def apply_changes(base_ds, changes_ds, id_col: str = "doc_id",
                  op_col: str = "op", seq_col: str = "seq",
                  num_partitions: int = 32):
    """CDC merge: apply a changelog of (id, op ∈ {'upsert','delete'},
    seq, payload…) rows to a base snapshot — last change per id wins
    (max ``seq``), 'delete' removes the row, 'upsert' replaces or
    inserts it, untouched base rows pass through. The incremental
    companion of :func:`snapshot_diff`: diff tells you what changed,
    apply produces the next snapshot without recomputing it.

    Shape: one co-locating shuffle of base ∪ changelog on ``id_col``
    (the changelog is the small side by construction); per partition a
    vectorized sort + drop_duplicates resolves winners — no per-id
    Python. Payload columns are every shared column except id/op/seq."""
    from .grouped import partitioned_apply

    base_cols = [c for c in base_ds.schema().names]
    payload = [c for c in base_cols if c != id_col]

    def tag_base(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[base_cols].copy()
        batch[op_col] = "base"
        batch[seq_col] = np.int64(-1)
        return batch

    def tag_change(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[id_col, op_col, seq_col, *payload]]

    both = (base_ds.map_batches(tag_base, batch_format="pandas")
            .union(changes_ds.map_batches(tag_change,
                                          batch_format="pandas")))

    def resolve(part: pd.DataFrame) -> pd.DataFrame:
        # winner per id: max seq (base rows carry seq −1, so any change
        # beats the base); deterministic tie-break on op then payload
        part = part.sort_values([id_col, seq_col, op_col],
                                ascending=[True, False, True],
                                kind="mergesort")
        win = part.drop_duplicates(subset=[id_col])
        out = win[win[op_col] != "delete"]
        return out[[id_col, *payload]].reset_index(drop=True)

    return partitioned_apply(both, [id_col], resolve,
                             num_partitions=num_partitions)


def mirror_hosts(ds, host_col: str = "host", content_col: str = "content",
                 min_jaccard: float = 0.5, max_hosts_per_content: int = 32,
                 num_partitions: int = 32, ndigits: int = 6):
    """Mirror-host detection (Bharat et al. 2000, "Mirror, mirror on
    the Web: a study of host pairs with replicated content"): host
    pairs whose DISTINCT content sets overlap with Jaccard ≥
    ``min_jaccard`` are candidate mirrors a crawl frontier should
    collapse to one fetch stream. Reference capability analogue: the
    source-union dedup of `pacong/data/processor.py:349-361`, lifted
    from row identity to host-level set similarity.

    Scale shape: one exchange produces distinct (host, content) with a
    map-side combiner; a content-keyed partition pass enumerates host
    pairs per content via size-class triu — contents shared by more
    than ``max_hosts_per_content`` hosts are boilerplate (404 pages,
    parked-domain templates) and are EXCLUDED from both the pair
    counts and the per-host set sizes, which also bounds the quadratic
    fan-out per content; pair partials reduce in a second exchange
    keyed (host_a, host_b) — bounded by the CANDIDATE pair count
    (hosts actually sharing content), never hosts². Per-host set
    sizes are a host-count-sized side table broadcast into the final
    jaccard map. Nothing all-pairs, nothing corpus-sized on the
    driver.

    Returns a Dataset of (host_a, host_b, shared, n_a, n_b, jaccard)
    with host_a < host_b; jaccard rounded at ``ndigits`` (SQL-replay
    precision contract)."""
    import ray
    import ray.data as rd

    from ..functions.rounding import sql_round

    distinct = partitioned_drop_duplicates(
        ds.select_columns([host_col, content_col]),
        [host_col, content_col], num_partitions, pre_dedup=True)

    def per_content(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([content_col, host_col], kind="mergesort")
        keys = part[content_col].to_numpy()
        hosts = part[host_col].to_numpy()
        # row-level eligibility: group sizes per row (sorted layout)
        _, counts = np.unique(keys, return_counts=True)
        ok = np.repeat(counts <= max_hosts_per_content, counts)
        frames = []
        if ok.any():  # per-host set-size partials over eligible rows
            vc = pd.Series(hosts[ok]).value_counts(sort=False)
            frames.append(pd.DataFrame({
                "host_a": vc.index.to_numpy(),
                "host_b": np.full(len(vc), -1, dtype="int64"),
                "n": vc.to_numpy().astype("int64")}))
        ia, ib = grouped_triu(keys, max_size=max_hosts_per_content)
        if len(ia):
            pc = (pd.DataFrame({"host_a": hosts[ia], "host_b": hosts[ib]})
                  .groupby(["host_a", "host_b"], sort=False).size()
                  .rename("n").reset_index())
            frames.append(pc)
        if not frames:
            return pd.DataFrame({"host_a": pd.Series([], dtype="int64"),
                                 "host_b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    tagged = partitioned_apply(distinct, [content_col], per_content,
                               num_partitions)

    def sum_part(part: pd.DataFrame) -> pd.DataFrame:
        return (part.groupby(["host_a", "host_b"], sort=True)["n"].sum()
                .reset_index())

    summed = partitioned_apply(tagged, ["host_a", "host_b"], sum_part,
                               num_partitions).materialize()

    sizes = summed.filter(expr="host_b == -1").to_pandas()  # host-sized
    size_ref = ray.put(dict(zip(sizes["host_a"].astype("int64"),
                                sizes["n"].astype("int64"))))

    def jaccard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["host_b"] != -1]
        if not len(batch):
            return pd.DataFrame({
                "host_a": pd.Series([], dtype="int64"),
                "host_b": pd.Series([], dtype="int64"),
                "shared": pd.Series([], dtype="int64"),
                "n_a": pd.Series([], dtype="int64"),
                "n_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64")})
        sz = ray.get(size_ref)
        na = batch["host_a"].map(sz).to_numpy(np.int64)
        nb = batch["host_b"].map(sz).to_numpy(np.int64)
        sh = batch["n"].to_numpy(np.int64)
        j = sql_round(pd.Series(sh / (na + nb - sh)), ndigits).to_numpy()
        out = pd.DataFrame({
            "host_a": batch["host_a"].to_numpy(np.int64),
            "host_b": batch["host_b"].to_numpy(np.int64),
            "shared": sh, "n_a": na, "n_b": nb, "jaccard": j})
        return out[out["jaccard"] >= min_jaccard]

    return summed.map_batches(jaccard, batch_format="pandas")
