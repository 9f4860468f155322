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

import numpy as np
import pandas as pd
import ray

from .grouped import grouped_triu, partitioned_drop_duplicates


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
              num_partitions: int = 8, keys_unique: bool = False):
    """Rows of ``left`` whose ``on`` value appears in ``keys_ds``.
    Right side deduped first, so this is a duplication-free inner hash
    join carrying only the key + a marker. Pass ``keys_unique=True``
    when the key column is known unique (a primary key) to skip the
    dedup exchange."""
    if keys_unique:
        right = keys_ds.select_columns([right_on or on]).map_batches(
            lambda b: b.assign(**{_MARKER: 1}), batch_format="pandas")
    else:
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


def bloom_semi_join(left, keys_ds, on: str, right_on: str | None = None,
                    bits_log2: int = 20, k_hashes: int = 4,
                    num_partitions: int = 8, keys_unique: bool = False):
    """Exact semi-join with a bloom-filter pushdown — the scale pattern
    for "big probe side, medium build side": the build side streams once
    into per-batch bloom bitmaps (OR-merged on the driver in O(2^bits/8)
    bytes, broadcast once via ``ray.put``), the probe side is filtered
    map-side to bloom candidates (false positives only, never false
    negatives), and the surviving — typically tiny — candidate set goes
    through the exact :func:`semi_join` to remove the false positives.
    Result is therefore EXACTLY the semi-join, but the shuffle carries
    only the candidates: at a 1% hit rate the exchange shrinks 100×.

    Hashes are Kirsch–Mitzenmacher double hashing over the stable
    64-bit row hash (deterministic across processes/parallelism).
    """
    import numpy as np
    import ray as _ray

    rkey = right_on or on
    m_bits = 1 << bits_log2
    mask = np.uint64(m_bits - 1)
    # the build side is consumed twice (bloom build + exact fix-up
    # join); it is the medium/small side by assumption, so materialize
    # its key column once instead of re-executing its read+filter
    keys_ds = keys_ds.select_columns([rkey]).materialize()

    def _positions(col: pd.Series) -> np.ndarray:
        h = pd.util.hash_pandas_object(col, index=False).to_numpy(dtype=np.uint64)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
        i = np.arange(k_hashes, dtype=np.uint64)[:, None]
        return ((h1 + i * h2) & mask).astype(np.int64)  # (k, n)

    def build_partial(batch: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        if len(batch):
            pos = _positions(batch[rkey]).ravel()
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    merged = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in keys_ds.select_columns([rkey]).map_batches(
            build_partial, batch_format="pandas").iter_batches(batch_format="pandas"):
        for raw in b["bitmap"]:
            merged |= np.frombuffer(raw, dtype=np.uint8)
    bloom_ref = _ray.put(merged)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch
        bloom = _ray.get(bloom_ref)
        pos = _positions(batch[on])  # (k, n)
        hit = np.ones(len(batch), dtype=bool)
        for row in pos:
            hit &= (bloom[row >> 3] & (1 << (row & 7)).astype(np.uint8)) != 0
        return batch[hit]

    candidates = left.map_batches(probe, batch_format="pandas")
    return semi_join(candidates, keys_ds, on, right_on=rkey,
                     num_partitions=num_partitions,
                     keys_unique=keys_unique)


def interval_overlap_join(left, right, lo_a: str, hi_a: str,
                          lo_b: str, hi_b: str, bucket_width: float,
                          num_partitions: int = 16):
    """Pure interval-overlap join (NO equi key):
    ``a.lo <= b.hi AND b.lo <= a.hi`` — the 1-D spatial-join pattern
    (time-range conflicts, numeric-band matching).

    Shape: each interval explodes to every fixed-width bucket it covers
    (one row per covered bucket), the join becomes a native hash
    equi-join on the bucket id (one shuffle per side), and the overlap
    predicate is a vectorized per-batch filter on the joined rows. A
    pair overlapping in SEVERAL buckets is emitted exactly once WITHOUT
    a dedup shuffle: only its canonical bucket — the bucket of
    max(a.lo, b.lo), the leftmost point both intervals share — keeps
    it. Pick ``bucket_width`` near the median interval span: too small
    explodes the bucket fan-out, too big inflates the per-bucket cross
    product (the usual spatial-binning tradeoff; salt hot buckets
    upstream if one band dominates). Right-side columns that collide
    with left names come back suffixed ``_b``."""
    import numpy as np

    a_cols = list(left.schema().names)
    b_cols = list(right.schema().names)
    rename_b = {c: c + "_b" for c in b_cols if c in a_cols}
    lo_b_out = rename_b.get(lo_b, lo_b)
    hi_b_out = rename_b.get(hi_b, hi_b)

    def explode(lo, hi, rename):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            if rename:
                batch = batch.rename(columns=rename)
            lo_v = np.floor(batch[rename.get(lo, lo) if rename else lo]
                            .to_numpy(dtype=np.float64) / bucket_width)
            hi_v = np.floor(batch[rename.get(hi, hi) if rename else hi]
                            .to_numpy(dtype=np.float64) / bucket_width)
            b0 = lo_v.astype(np.int64)
            b1 = hi_v.astype(np.int64)
            reps = b1 - b0 + 1
            idx = np.repeat(np.arange(len(batch)), reps)
            out = batch.iloc[idx].reset_index(drop=True)
            out["__bucket"] = (np.concatenate(
                [np.arange(s, e + 1) for s, e in zip(b0, b1)])
                if len(batch) else np.array([], dtype=np.int64))
            return out
        return fn

    la = left.map_batches(explode(lo_a, hi_a, {}), batch_format="pandas")
    rb = right.map_batches(explode(lo_b, hi_b, rename_b), batch_format="pandas")
    joined = la.join(rb, join_type="inner", num_partitions=num_partitions,
                     on=("__bucket",))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return batch.drop(columns=["__bucket"])
        alo = batch[lo_a].to_numpy(dtype=np.float64)
        ahi = batch[hi_a].to_numpy(dtype=np.float64)
        blo = batch[lo_b_out].to_numpy(dtype=np.float64)
        bhi = batch[hi_b_out].to_numpy(dtype=np.float64)
        bucket = batch["__bucket"].to_numpy(dtype=np.int64)
        hit = (alo <= bhi) & (blo <= ahi)
        canon = np.floor(np.maximum(alo, blo) / bucket_width).astype(np.int64) == bucket
        return batch[hit & canon].drop(columns=["__bucket"])

    return joined.map_batches(verify, batch_format="pandas")


def salted_inner_join(left, right, on: str, right_on: str | None = None,
                      n_salts: int = 8, num_partitions: int = 8):
    """Skew-defeating equi join: a single hot key collapses a hash join
    to one reduce partition; salting splits it. Left rows get a
    deterministic salt (stable row hash of the WHOLE row, so duplicate
    keys spread) appended to the join key; the (small) right side is
    replicated once per salt value, and the join runs on
    (key, salt) — the hot key's rows now land on ``n_salts``
    partitions. Inner-join semantics are unchanged: every left row
    meets every matching right row exactly once, in the one salt
    replica it carries.

    Use when the LEFT is large and skewed and the RIGHT is small enough
    to replicate ``n_salts``× (dimension tables, lookup sides). For a
    right side too big to replicate, salt only the hot keys (detect via
    a count sketch) and replicate just their right rows — the crawl
    scheduler's hot-host remap (pipelines/crawl.py) is that variant."""
    right_on = right_on or on

    def salt_left(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = pd.util.hash_pandas_object(b, index=False).to_numpy()
        b["__salt"] = (h % n_salts).astype("int64")
        return b

    def replicate_right(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        out = b.iloc[np.tile(np.arange(n), n_salts)].copy()
        out["__salt"] = np.repeat(np.arange(n_salts, dtype=np.int64), n)
        return out

    l = left.map_batches(salt_left, batch_format="pandas")
    r = right.map_batches(replicate_right, batch_format="pandas")
    joined = l.join(r, join_type="inner", num_partitions=num_partitions,
                    on=(on, "__salt"),
                    right_on=(right_on, "__salt") if right_on != on else None)
    return joined.drop_columns(["__salt"])


def bucketed_write(ds, key: str, num_buckets: int, path: str,
                   fingerprint: str | None = None) -> str:
    """Materialize a table hash-bucketed by ``key`` as hive-partitioned
    parquet (one directory per ``_bkt``) — the Hive/Iceberg bucketed
    storage layout. Written ONCE; any number of later joins on the
    same key read bucket-by-bucket with NO shuffle at all (the whole
    point of co-partitioned storage at 100 TB: the exchange happens at
    ingest, not per query). ``fingerprint`` makes the build idempotent
    via a ``_BUILT.json`` marker, same rule as the IVF index."""
    import json
    import os
    import shutil

    from .sampling import hash_bucket

    marker = os.path.join(path, "_BUILT.json")
    if fingerprint and os.path.exists(marker):
        meta = json.load(open(marker))
        if (meta.get("fingerprint") == fingerprint
                and meta.get("num_buckets") == num_buckets
                and meta.get("key") == key):
            return path
    if os.path.exists(path):
        shutil.rmtree(path)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_bkt"] = hash_bucket(batch[key].to_numpy(), num_buckets).astype("int64")
        return batch

    ds.map_batches(tag, batch_format="pandas").write_parquet(
        path, partition_cols=["_bkt"])
    if fingerprint:
        with open(marker, "w") as f:
            json.dump({"fingerprint": fingerprint,
                       "num_buckets": num_buckets, "key": key}, f)
    return path


def bucketed_join(left_path: str, right_path: str, on: str,
                  right_on: str | None = None, num_buckets: int = 16,
                  left_cols: list[str] | None = None,
                  right_cols: list[str] | None = None):
    """Shuffle-free join of two bucketed tables written by
    ``bucketed_write`` with the SAME ``num_buckets`` (both sides use
    the shared ``hash_bucket`` primitive, so equal keys are guaranteed
    co-bucketed): one task per bucket reads only that bucket's files
    from each side and merges vectorized. No all-to-all exchange —
    the scan IS the partitioning. Returns a Dataset of joined rows."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    right_on = right_on or on

    def bucket_files(root: str, b: int) -> list[str]:
        return sorted(glob.glob(os.path.join(root, f"_bkt={b}", "*.parquet")))

    # capture output dtypes up front so empty buckets stay schema-stable
    def side_schema(root: str, cols: list[str] | None):
        f = sorted(glob.glob(os.path.join(root, "_bkt=*", "*.parquet")))[0]
        empty = pq.ParquetFile(f).schema_arrow.empty_table().to_pandas()
        return empty[cols] if cols else empty.drop(columns=["_bkt"], errors="ignore")

    lempty, rempty = side_schema(left_path, left_cols), side_schema(right_path, right_cols)
    empty_out = lempty.merge(rempty, left_on=on, right_on=right_on)

    def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b in batch["bkt"].tolist():
            lf, rf = bucket_files(left_path, b), bucket_files(right_path, b)
            if not lf or not rf:
                continue
            lt = pq.read_table(lf, columns=left_cols).to_pandas()
            rt = pq.read_table(rf, columns=right_cols).to_pandas()
            outs.append(lt.merge(rt, left_on=on, right_on=right_on))
        return pd.concat(outs, ignore_index=True) if outs else empty_out

    buckets = rd.from_items([{"bkt": b} for b in range(num_buckets)],
                            override_num_blocks=num_buckets)
    return buckets.map_batches(join_bucket, batch_format="pandas")


def _codepoint_matrix(strs) -> tuple[np.ndarray, np.ndarray]:
    """list[str] → (padded (n, L) uint32 codepoint matrix, lengths)."""
    lens = np.array([len(s) for s in strs], dtype=np.int64)
    L = int(lens.max()) if len(lens) else 0
    m = np.zeros((len(strs), L), dtype=np.uint32)
    for i, s in enumerate(strs):  # one pass to fill; rows are short
        if s:
            m[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32)
    return m, lens


_B = np.uint64(1099511628211)       # FNV prime as the polynomial base
_BINV = np.uint64(pow(1099511628211, -1, 2 ** 64))  # B is odd ⇒ invertible


def _levenshtein_verify(ids_a, ids_b, s_a, s_b, k: int) -> pd.DataFrame:
    """Exact batched Levenshtein over candidate pairs: one (P, Lb+1)
    DP row rolled down La, fully vectorized across the P pairs.
    Operates on UNICODE CODEPOINTS (utf-32 matrix); callers whose
    oracle is byte-based (DuckDB's ``levenshtein``) must feed ASCII —
    see ``edit_distance_join``'s contract note."""
    if not len(ids_a):
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "dist": pd.Series([], dtype="int64")})
    A, la = _codepoint_matrix(list(s_a))
    Bm, lb = _codepoint_matrix(list(s_b))
    P = len(ids_a)
    Lb = Bm.shape[1]
    prev = np.tile(np.arange(Lb + 1, dtype=np.int64), (P, 1))
    final = np.where(la == 0, lb, -1)
    for i in range(1, A.shape[1] + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (A[:, i - 1] != Bm[:, j - 1])
            cur[:, j] = np.minimum(np.minimum(prev[:, j] + 1,
                                              cur[:, j - 1] + 1), sub)
        hit = la == i
        if hit.any():
            final[hit] = cur[hit, lb[hit]]
        prev = cur
    keep = (final >= 0) & (final <= k)
    return pd.DataFrame({
        "id_a": np.asarray(ids_a)[keep],
        "id_b": np.asarray(ids_b)[keep],
        "dist": final[keep].astype("int64"),
    })


def edit_distance_join(ds, id_col: str, str_col: str, k: int = 1,
                       num_partitions: int = 32,
                       block_col: str | None = None):
    """Self-join on Levenshtein distance ≤ ``k`` (k ∈ {1, 2}) via the
    FastSS deletion neighbourhood (Bocek et al. 2007, "Fast Similarity
    Search in Big Data"): if ed(u, v) ≤ k then deleting the ≤k
    positions touched by the optimal alignment from each side yields a
    COMMON string, so hashing every ≤k-deletion variant and grouping
    by the hash gives a candidate set with NO false negatives; an
    exact vectorized Levenshtein verify removes the false positives.
    Hash collisions only ever ADD candidates, so variants are never
    materialized — every deletion's hash comes from precomputed
    prefix/suffix polynomial hashes: single deletions in O(len) per
    row, double deletions (k=2) in O(len²/2) per row via the modular
    inverse of the base (suffix weights divide by B once for the
    middle segment), all vectorized over the batch.

    Scale shape (ONE heavy exchange + one id-pair dedup): the shuffle
    carries (variant_hash, id, s) rows — (len+1) per input row for
    k=1, O(len²/2) for k=2 — grouped by hash with
    :func:`..stages.grouped.partitioned_apply`; candidate pairs are
    verified IN the key partition (both sides' strings are co-located
    there), so the second exchange carries only verified
    (id_a, id_b, dist) triples into a partitioned drop-duplicates —
    no strings, no DP work. A pair sharing variants that hash into
    multiple partitions is re-verified once per partition (bounded by
    its variant count); the duplicate triples agree exactly, so the
    dedup winner is well-defined.

    ``block_col`` is the classic record-linkage blocking key: its value
    mixes into the variant hash so candidates only form within a block
    (collisions across blocks are removed by an explicit equality check
    in the pair stage), and pairs must agree on it to match.

    ORACLE CONTRACT: distances here are over Unicode CODEPOINTS while
    DuckDB's ``levenshtein`` is byte-based (``levenshtein('café',
    'cafe')`` = 2 in DuckDB, 1 here); SQL-replay parity therefore
    assumes ASCII input (TPC-H names are ASCII). Non-ASCII corpora
    still get correct codepoint distances — only the DuckDB replay
    diverges.

    Reference capability analogue: fuzzy name standardization
    `pacong/data/processor.py:142-171` (exact alias map), generalized
    to typo-tolerant matching."""
    from .grouped import partitioned_apply, partitioned_drop_duplicates

    if k not in (1, 2):
        raise NotImplementedError("edit_distance_join: k ∈ {1, 2} "
                                  "(deeper deletion neighbourhoods grow "
                                  "O(len^k) keys per row)")

    def keys_batch(batch: pd.DataFrame) -> pd.DataFrame:
        strs = batch[str_col].astype(str).tolist()
        ids = batch[id_col].to_numpy()
        m, lens = _codepoint_matrix(strs)
        n, L = m.shape
        if n == 0:
            empty = {"key": pd.Series([], dtype="uint64"),
                     id_col: pd.Series([], dtype=ids.dtype),
                     str_col: pd.Series([], dtype="object")}
            if block_col:
                empty["blk"] = batch[block_col] if block_col in batch else \
                    pd.Series([], dtype="object")
            return pd.DataFrame(empty)
        c = m.astype(np.uint64)
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            powB = np.ones(L + 1, dtype=np.uint64)
            for p in range(1, L + 1):
                powB[p] = powB[p - 1] * _B
        # prefix[i, p] = hash of s[:p];  wsuf[i, j] = Σ_{t≥j} c_t·B^(len-1-t)
        pref = np.zeros((n, L + 1), dtype=np.uint64)
        for p in range(L):
            pref[:, p + 1] = pref[:, p] * _B + c[:, p]
        w = c * powB[np.maximum(lens[:, None] - 1 - np.arange(L), 0)]
        w[np.arange(L) >= lens[:, None]] = 0
        wsuf = np.zeros((n, L + 1), dtype=np.uint64)
        wsuf[:, :L] = w[:, ::-1].cumsum(axis=1, dtype=np.uint64)[:, ::-1]
        out_k, out_i = [], []
        rows = np.arange(n)
        # 0-deletion key: full-string hash mixed with its length
        # (emitted even when every string is empty — empty-empty pairs
        # are distance 0 and must still collide on key 0·31+0)
        out_k.append(pref[rows, lens] * np.uint64(31) + lens.astype(np.uint64))
        out_i.append(rows)
        for p in range(L):  # deletion at position p (rows with len > p)
            ok = lens > p
            if not ok.any():
                break
            # hash(s[:p] + s[p+1:]) = pref[:,p]·B^(len-1-p) + wsuf[:,p+1]
            # (wsuf terms already carry weight B^(len-1-t) = the variant's
            # positional weight, because deleting BEFORE t shifts t left
            # by exactly one)
            h = (pref[ok, p] * powB[lens[ok] - 1 - p] + wsuf[ok, p + 1])
            out_k.append(h * np.uint64(31) + (lens[ok] - 1).astype(np.uint64))
            out_i.append(rows[ok])
        if k >= 2:
            # deletion at positions p < q (rows with len > q):
            #   prefix  t<p     → pref[:,p]·B^(len-2-p)   (two shifts right
            #                     of it, so its weight drops by B²·B^p…)
            #   middle  p<t<q   → one deletion before t: wsuf weight / B
            #   suffix  t>q     → two deletions before t: wsuf weight as-is
            # hash = pref[:,p]·B^(len-2-p) + (wsuf[:,p+1]−wsuf[:,q])·B⁻¹
            #        + wsuf[:,q+1]
            with np.errstate(over="ignore"):
                for q in range(1, L):
                    okq = lens > q
                    if not okq.any():
                        break
                    for p in range(q):
                        h2 = (pref[okq, p] * powB[lens[okq] - 2 - p]
                              + (wsuf[okq, p + 1] - wsuf[okq, q]) * _BINV
                              + wsuf[okq, q + 1])
                        out_k.append(h2 * np.uint64(31)
                                     + (lens[okq] - 2).astype(np.uint64))
                        out_i.append(rows[okq])
        key = np.concatenate(out_k)
        idx = np.concatenate(out_i)
        cols = {
            "key": key,
            id_col: ids[idx],
            str_col: pd.Series([strs[i] for i in idx], dtype="object"),
        }
        if block_col:
            # mix the blocking key into the hash (candidates only form
            # within a block) and carry it for the exact equality check
            bh = pd.util.hash_pandas_object(batch[block_col],
                                            index=False).to_numpy(np.uint64)
            with np.errstate(over="ignore"):
                cols["key"] = key * np.uint64(1000003) + bh[idx]
            cols["blk"] = batch[block_col].to_numpy()[idx]
        return pd.DataFrame(cols).drop_duplicates()

    def pairs_in_partition(part: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs of this key partition, verified IN PLACE
        (strings are already co-located here) — emits only confirmed
        (id_a, id_b, dist) triples. Pair enumeration is vectorized:
        one lexsort by (key, id), group boundaries from np.unique, and
        per-SIZE-CLASS triu index broadcasting (a Python loop over the
        handful of distinct group sizes, never over the ~10⁵ groups —
        the per-group pandas loop this replaces was 60× slower)."""
        part = part.drop_duplicates(subset=["key", id_col])
        kv = part["key"].to_numpy(np.uint64)
        ids = part[id_col].to_numpy()
        order = np.lexsort((ids, kv))
        kv, ids = kv[order], ids[order]
        ss = part[str_col].to_numpy()[order]
        bb = part["blk"].to_numpy()[order] if block_col else None
        ia, ib = grouped_triu(kv)
        if not len(ia):
            return _levenshtein_verify([], [], [], [], k)
        if block_col is not None:
            same = bb[ia] == bb[ib]  # drop cross-block hash collisions
            ia, ib = ia[same], ib[same]
        # sorted by id within each key group, so id_a < id_b holds
        cand = pd.DataFrame({
            "id_a": ids[ia], "id_b": ids[ib],
            "s_a": ss[ia], "s_b": ss[ib],
        }).drop_duplicates(subset=["id_a", "id_b"])
        return _levenshtein_verify(cand["id_a"].to_numpy(),
                                   cand["id_b"].to_numpy(),
                                   cand["s_a"].to_numpy(),
                                   cand["s_b"].to_numpy(), k)

    in_cols = [id_col, str_col] + ([block_col] if block_col else [])
    keyed = ds.select_columns(in_cols).map_batches(
        keys_batch, batch_format="pandas")
    verified = partitioned_apply(keyed, ["key"], pairs_in_partition,
                                 num_partitions=num_partitions)
    # cross-partition duplicates (a pair whose shared variants hash to
    # several partitions) agree on every column; one light exchange of
    # (id_a, id_b, dist) triples removes them.
    return partitioned_drop_duplicates(verified, ["id_a", "id_b"],
                                       num_partitions=num_partitions,
                                       pre_dedup=True)


def join_size_estimate(left, right, on: str, right_on: str | None = None,
                       num_partitions: int = 16) -> pd.DataFrame:
    """Exact equi-join cardinality WITHOUT executing the join — the
    planner primitive behind "will this join explode?". Each batch of
    either side collapses to per-key partial counts tagged with its
    side, both streams union into ONE co-locating hash exchange
    (reduce-side merge — no join actor pool, no native groupby, which
    is sort-based and slow at high key cardinality), and the partition
    task folds Σ n_left·n_right plus matched-key count and the hottest
    key's contribution — constant-size output, integer-exact.

    Scale shape: the only exchange carries one row per (batch, key).
    The max-key row doubles as the salt-planner input
    (cf. ``shuffle_skew_report``)."""
    from .grouped import partitioned_apply

    right_on = right_on or on

    def counter(col: str, out_l: bool):
        def count(b: pd.DataFrame) -> pd.DataFrame:
            vc = b[col].value_counts(sort=False)
            n = vc.to_numpy().astype("int64")
            z = np.zeros(len(vc), dtype=np.int64)
            return pd.DataFrame({"k": vc.index.to_numpy(),
                                 "nl": n if out_l else z,
                                 "nr": z if out_l else n})
        return count

    tagged = left.select_columns([on]).map_batches(
        counter(on, True), batch_format="pandas").union(
        right.select_columns([right_on]).map_batches(
            counter(right_on, False), batch_format="pandas"))

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby("k", sort=False)[["nl", "nr"]].sum()
        prod = g["nl"].to_numpy(np.int64) * g["nr"].to_numpy(np.int64)
        hit = prod > 0
        if not hit.any():
            return pd.DataFrame({"join_rows": [np.int64(0)],
                                 "n_keys": [np.int64(0)],
                                 "max_key_rows": [np.int64(0)]})
        return pd.DataFrame({"join_rows": [np.int64(prod[hit].sum())],
                             "n_keys": [np.int64(hit.sum())],
                             "max_key_rows": [np.int64(prod[hit].max())]})

    parts = partitioned_apply(tagged, ["k"], merge,
                              num_partitions).to_pandas()
    if not len(parts):  # both inputs empty — pin the 0 convention
        return pd.DataFrame({"join_rows": [np.int64(0)],
                             "n_keys": [np.int64(0)],
                             "max_key_rows": [np.int64(0)]})
    # 0 (not NULL) when no key matches: the SQL replay pins the same
    # convention with coalesce(sum(...), 0) / coalesce(max(...), 0).
    return pd.DataFrame({
        "join_rows": [np.int64(parts["join_rows"].sum())],
        "n_keys": [np.int64(parts["n_keys"].sum())],
        "max_key_rows": [np.int64(parts["max_key_rows"].max())],
    })


def jaro_winkler_join(ds, name_col: str, threshold: float,
                      block_chars: int = 1, max_block: int = 10_000,
                      num_partitions: int = 32):
    """Blocked Jaro–Winkler similarity self-join over a name dictionary
    — the record-linkage staple for OCR'd / transliterated names where
    edit distance is too rigid (Winkler 1990). Reference capability
    analogue: the dedup grouping of `pacong/data/processor.py:349-361`
    extended to fuzzy name matching.

    Shape (the at-scale contract):

    * names are DISTINCT'd map-side (pre-combine) and once more inside
      the single block-keyed exchange — the raw row count never
      shuffles, the name-dictionary does;
    * blocking key = first ``block_chars`` characters; a block is
      co-located by the exchange, so pair enumeration is
      size-class-vectorized `grouped_triu` per partition (blocks past
      ``max_block`` raise: a silent b² explosion is a bug, pick a
      longer blocking key instead);
    * scoring is the DuckDB-exact batch JW kernel
      (`functions/strsim.jaro_winkler_batch`) — one numpy pass over
      all pairs of the partition, no per-pair Python.

    Returns (name_a, name_b, jw) with name_a < name_b and jw rounded
    to 6 (both the kernel and the rounding replay value-exact in
    SQL)."""
    from ..functions.rounding import sql_round
    from ..functions.strsim import jaro_winkler_batch
    from .grouped import partitioned_apply

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[name_col]].drop_duplicates()

    def per_partition(p: pd.DataFrame) -> pd.DataFrame:
        p = p.drop_duplicates(subset=[name_col])
        blk = p[name_col].str.slice(0, block_chars)
        p = (p.assign(__blk=blk)
             .sort_values(["__blk", name_col], kind="mergesort")
             .reset_index(drop=True))
        ia, ib = grouped_triu(p["__blk"].to_numpy(), max_size=max_block,
                              raise_on_exceed=True)
        names = p[name_col].to_numpy()
        a, b = names[ia], names[ib]
        jw = jaro_winkler_batch(a, b)
        keep = jw >= threshold
        return pd.DataFrame({"name_a": a[keep], "name_b": b[keep],
                             "jw": sql_round(jw[keep], 6)})

    def add_blk(batch: pd.DataFrame) -> pd.DataFrame:
        batch = pre(batch).copy()
        batch["__blk"] = batch[name_col].str.slice(0, block_chars)
        return batch

    return partitioned_apply(
        ds.map_batches(add_blk, batch_format="pandas"), ["__blk"],
        per_partition, num_partitions=num_partitions)
