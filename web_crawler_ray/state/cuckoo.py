"""Approximate-membership structures for the URL-seen set
(north rule: "bloom/cuckoo URL-seen"; SURVEY.md §2.3 T7, §2.7 D3).

- ``CuckooFilter``: 4-way bucketed cuckoo filter (Fan et al., CoNLL'14
  construction) over uint64 key hashes, numpy-backed, with
  deterministic eviction and byte-exact serialize/restore (checkpoint
  determinism: eviction paths depend on insertion order, so resume
  restores the filter BYTES, never a rebuilt approximation —
  SURVEY.md §7 "what's hard").
- ``BloomFilter``: the spill fallback — when a shard's working set
  exceeds the cuckoo capacity the shard degrades to a bloom overlay
  (no deletions needed for URL-seen).
- ``SeenShard``: the Ray actor owning one hash-range shard. The filter
  answers "definitely new" fast; an exact uint64 set backs "maybe
  seen" probes so the URL-seen set is EXACT (the north rule requires
  the final seen set to match the reference exactly; the approximate
  structures are the memory/speed story, the exact store is the truth
  and is what spills to the checkpoint).

Batch API throughout: probes/inserts take uint64 arrays, one actor
round-trip per (batch × shard), not per URL.
"""

from __future__ import annotations

import io

import numpy as np

_FP_MASK = np.uint64(0xFFFF)


class CuckooFilter:
    """4-slot-per-bucket cuckoo filter with 16-bit fingerprints.

    ~98% load capacity in theory; we cap at 95% and report failure
    beyond it (caller degrades to bloom). False-positive rate ≈
    2*4/2^16 ≈ 1.2e-4.
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0):
        nb = 1
        while nb * 4 < capacity:
            nb <<= 1
        self.n_buckets = nb
        self.buckets = np.zeros((nb, 4), dtype=np.uint16)
        self.count = 0
        self._kick_state = np.uint64(seed * 2654435761 + 12345)  # deterministic eviction PRNG
        # fingerprints displaced by a FAILED eviction chain: without this
        # sideline a full table silently FORGETS a previously-inserted
        # key (its fp was kicked out with nowhere to go) and the filter
        # would claim "definitely new" for a seen key — unsound.
        self.orphans: set[tuple[int, int]] = set()

    def _fp(self, h: np.uint64) -> np.uint64:
        fp = (np.uint64(h) >> np.uint64(48)) & _FP_MASK
        return fp if fp != 0 else np.uint64(1)

    def _i1(self, h: np.uint64) -> int:
        return int(np.uint64(h) & np.uint64(self.n_buckets - 1))

    def _i2(self, i1: int, fp: np.uint64) -> int:
        # partial-key cuckoo hashing: alt index = i1 xor hash(fp)
        fph = (np.uint64(fp) * np.uint64(0x5BD1E995)) & np.uint64(self.n_buckets - 1)
        return int(np.uint64(i1) ^ fph)

    def _next_kick(self) -> int:
        # xorshift64 — deterministic given construction seed + call order
        x = self._kick_state
        x ^= x << np.uint64(13)
        x ^= x >> np.uint64(7)
        x ^= x << np.uint64(17)
        self._kick_state = x
        return int(x & np.uint64(3))

    def contains(self, h: int) -> bool:
        fp = self._fp(np.uint64(h))
        i1 = self._i1(np.uint64(h))
        if (self.buckets[i1] == fp).any():
            return True
        i2 = self._i2(i1, fp)
        if (self.buckets[i2] == fp).any():
            return True
        if self.orphans and ((i1, int(fp)) in self.orphans or (i2, int(fp)) in self.orphans):
            return True
        return False

    def contains_batch(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership: fingerprint + both candidate buckets
        computed with numpy fancy indexing — no per-key Python loop."""
        hs = hs.astype(np.uint64)
        fp = ((hs >> np.uint64(48)) & _FP_MASK).astype(np.uint16)
        fp[fp == 0] = 1
        mask = np.uint64(self.n_buckets - 1)
        i1 = (hs & mask).astype(np.int64)
        i2 = (i1.astype(np.uint64) ^ ((fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & mask)).astype(np.int64)
        hit = (self.buckets[i1] == fp[:, None]).any(axis=1)
        hit |= (self.buckets[i2] == fp[:, None]).any(axis=1)
        if self.orphans:
            for k in np.nonzero(~hit)[0]:
                f = int(fp[k])
                if (int(i1[k]), f) in self.orphans or (int(i2[k]), f) in self.orphans:
                    hit[k] = True
        return hit

    def insert(self, h: int) -> bool:
        fp = self._fp(np.uint64(h))
        i1 = self._i1(np.uint64(h))
        i2 = self._i2(i1, fp)
        for idx in (i1, i2):
            empty = np.nonzero(self.buckets[idx] == 0)[0]
            if len(empty):
                self.buckets[idx, empty[0]] = fp
                self.count += 1
                return True
        # evict deterministically
        idx = i1
        cur = fp
        for _ in range(self.MAX_KICKS):
            slot = self._next_kick()
            cur, self.buckets[idx, slot] = self.buckets[idx, slot], cur
            idx = self._i2(idx, cur)
            empty = np.nonzero(self.buckets[idx] == 0)[0]
            if len(empty):
                self.buckets[idx, empty[0]] = cur
                self.count += 1
                return True
        # table effectively full: the displaced fingerprint `cur` (which
        # belongs to some earlier key whose home buckets include `idx`)
        # must stay findable — park it in the orphan sideline. Note the
        # orphan's alternate bucket also resolves to `idx` via the
        # partial-key xor, so (idx, cur) covers both probe sites.
        self.orphans.add((idx, int(cur)))
        return False

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        orphan_arr = np.array(sorted(self.orphans), dtype=np.int64).reshape(-1, 2)
        np.savez_compressed(
            buf, buckets=self.buckets, count=np.int64(self.count),
            kick=np.uint64(self._kick_state), orphans=orphan_arr,
        )
        return buf.getvalue()

    @classmethod
    def restore(cls, data: bytes) -> "CuckooFilter":
        loaded = np.load(io.BytesIO(data))
        obj = cls.__new__(cls)
        obj.buckets = loaded["buckets"]
        obj.n_buckets = obj.buckets.shape[0]
        obj.count = int(loaded["count"])
        obj._kick_state = np.uint64(loaded["kick"])
        obj.orphans = {(int(a), int(b)) for a, b in loaded["orphans"]}
        return obj


class BloomFilter:
    """Split-bloom over uint64 hashes (k derived hashes by multiply-shift).
    The spill fallback: no deletes, constant memory, ~1e-4 fpr at
    10 bits/key."""

    def __init__(self, capacity: int, bits_per_key: int = 10, k: int = 7):
        n_bits = max(64, capacity * bits_per_key)
        self.n_words = (n_bits + 63) // 64
        self.words = np.zeros(self.n_words, dtype=np.uint64)
        self.k = k

    def _positions(self, hs: np.ndarray) -> np.ndarray:
        hs = hs.astype(np.uint64)
        out = np.empty((self.k, len(hs)), dtype=np.uint64)
        h1 = hs
        h2 = (hs >> np.uint64(32)) | (hs << np.uint64(32))
        for i in range(self.k):
            out[i] = h1 + np.uint64(i) * h2
        return out % np.uint64(self.n_words * 64)

    def add_batch(self, hs: np.ndarray) -> None:
        pos = self._positions(hs).ravel()
        np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains_batch(self, hs: np.ndarray) -> np.ndarray:
        pos = self._positions(hs)
        word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
        bit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0).astype(bool)

    def serialize(self) -> bytes:
        buf = io.BytesIO()
        np.savez_compressed(buf, words=self.words, k=np.int64(self.k))
        return buf.getvalue()

    @classmethod
    def restore(cls, data: bytes) -> "BloomFilter":
        loaded = np.load(io.BytesIO(data))
        obj = cls.__new__(cls)
        obj.words = loaded["words"]
        obj.n_words = len(obj.words)
        obj.k = int(loaded["k"])
        return obj


class ExactPages:
    """Exact uint64 key store as sorted immutable numpy pages + a small
    append buffer (LSM-style). ~8 B/key instead of the ~65 B/key a
    Python ``set[int]`` costs — at 10^10 seen URLs across shards that is
    the difference between ~80 GB and ~700 GB of truth-store RAM.
    Probes are vectorized ``searchsorted`` per page; the buffer is
    bounded so ``isin`` over it stays cheap. Callers must only ``add``
    keys that are not already present (``contains`` first).

    Disk spill (the >10^9-keys-per-shard story): pass ``spill_dir`` and
    pages whose merged size exceeds ``spill_threshold`` keys are
    memmapped to a file — probes still run ``searchsorted`` against the
    memmap (OS page cache absorbs the hot prefix), and resident RAM is
    bounded by the buffer + small pages regardless of key count."""

    BUF_CAP = 16384
    MAX_PAGES = 8

    def __init__(self, spill_dir: str | None = None,
                 spill_threshold: int = 4_000_000):
        self.pages: list[np.ndarray] = []
        self._buf = np.empty(self.BUF_CAP, dtype=np.uint64)
        self._buf_len = 0
        self.spill_dir = spill_dir
        self.spill_threshold = spill_threshold
        self._spill_seq = 0

    def _maybe_spill(self, merged: np.ndarray) -> np.ndarray:
        """Swap a large merged page for a read-only memmap of it."""
        if self.spill_dir is None or len(merged) < self.spill_threshold:
            return merged
        import os

        os.makedirs(self.spill_dir, exist_ok=True)
        path = os.path.join(self.spill_dir, f"page-{self._spill_seq:06d}.u64")
        self._spill_seq += 1
        merged.tofile(path)
        return np.memmap(path, dtype=np.uint64, mode="r")

    def __len__(self) -> int:
        return sum(len(p) for p in self.pages) + self._buf_len

    def __iter__(self):
        return iter(self.array())

    def contains(self, hs: np.ndarray) -> np.ndarray:
        hs = np.asarray(hs, dtype=np.uint64)
        mask = np.zeros(len(hs), dtype=bool)
        for page in self.pages:
            pos = np.searchsorted(page, hs)
            np.minimum(pos, len(page) - 1, out=pos)
            mask |= page[pos] == hs
        if self._buf_len:
            mask |= np.isin(hs, self._buf[: self._buf_len])
        return mask

    def add(self, hs: np.ndarray) -> None:
        """Append keys known to be absent (and unique within ``hs``)."""
        hs = np.asarray(hs, dtype=np.uint64)
        while len(hs):
            take = min(len(hs), self.BUF_CAP - self._buf_len)
            self._buf[self._buf_len : self._buf_len + take] = hs[:take]
            self._buf_len += take
            hs = hs[take:]
            if self._buf_len == self.BUF_CAP:
                self._flush()

    def _flush(self) -> None:
        if not self._buf_len:
            return
        self.pages.append(np.sort(self._buf[: self._buf_len].copy()))
        self._buf_len = 0
        if len(self.pages) > self.MAX_PAGES:
            # periodic merge keeps probe cost at MAX_PAGES searchsorteds;
            # amortized O(log) like an LSM compaction. The merged page
            # spills to a memmap file past the threshold.
            merged = np.sort(np.concatenate([np.asarray(p) for p in self.pages]))
            self.pages = [self._maybe_spill(merged)]

    def array(self) -> np.ndarray:
        parts = list(self.pages)
        if self._buf_len:
            parts.append(np.sort(self._buf[: self._buf_len].copy()))
        if not parts:
            return np.empty(0, dtype=np.uint64)
        return np.sort(np.concatenate(parts))

    @classmethod
    def from_sorted(cls, arr: np.ndarray) -> "ExactPages":
        obj = cls()
        if len(arr):
            obj.pages = [np.asarray(arr, dtype=np.uint64)]
        return obj


class SeenShardState:
    """One URL-seen shard: cuckoo fast path + exact backing store (+
    bloom overlay once the cuckoo saturates). Plain object so the same
    code runs inside a Ray actor (distributed) and inside the sequential
    oracle (reference-semantics replay)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16,
                 spill_dir: str | None = None, spill_threshold: int = 4_000_000):
        self.shard_id = shard_id
        self.cuckoo = CuckooFilter(capacity, seed=shard_id)
        self.bloom: BloomFilter | None = None
        self.exact = ExactPages(spill_dir=spill_dir, spill_threshold=spill_threshold)
        self.fp_hits = 0  # cuckoo-positive but actually new

    def probe_and_add(self, hs: np.ndarray) -> np.ndarray:
        """Returns is_new mask; marks all probed hashes as seen.

        Fully vectorized: batch-local duplicates are collapsed with
        ``np.unique`` (only the FIRST occurrence reports new — same
        semantics as probing them sequentially); one cuckoo
        ``contains_batch`` (+ bloom) over the unique keys; only
        filter-positive keys fall back to the exact store (real dups +
        rare false positives); only genuinely-new keys pay the per-key
        cuckoo insert. Exactness: the filter only short-circuits
        definite negatives; positives are confirmed exactly."""
        hs = np.asarray(hs, dtype=np.uint64)
        uniq, first_idx = np.unique(hs, return_index=True)
        maybe = self.cuckoo.contains_batch(uniq)
        if self.bloom is not None:
            maybe |= self.bloom.contains_batch(uniq)
        new = ~maybe
        if maybe.any():
            pos = np.nonzero(maybe)[0]
            truly_seen = self.exact.contains(uniq[pos])
            fp = ~truly_seen
            new[pos[fp]] = True
            self.fp_hits += int(fp.sum())
        new_keys = uniq[new]
        self.exact.add(new_keys)
        overflow: list[int] = []
        for h in new_keys:
            if not self.cuckoo.insert(int(h)):
                overflow.append(int(h))
        if overflow:
            if self.bloom is None:
                self.bloom = BloomFilter(capacity=max(1 << 18, len(self.exact) * 4))
            self.bloom.add_batch(np.array(overflow, dtype=np.uint64))
        out = np.zeros(len(hs), dtype=bool)
        out[first_idx[new]] = True
        return out

    def snapshot(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "cuckoo": self.cuckoo.serialize(),
            "bloom": self.bloom.serialize() if self.bloom else None,
            "exact": self.exact.array(),
            "fp_hits": self.fp_hits,
        }

    @classmethod
    def restore(cls, snap: dict) -> "SeenShardState":
        obj = cls.__new__(cls)
        obj.shard_id = int(snap["shard_id"])
        obj.cuckoo = CuckooFilter.restore(snap["cuckoo"])
        obj.bloom = BloomFilter.restore(snap["bloom"]) if snap["bloom"] is not None else None
        obj.exact = ExactPages.from_sorted(np.asarray(snap["exact"], dtype=np.uint64))
        obj.fp_hits = int(snap["fp_hits"])
        return obj

    def seen_array(self) -> np.ndarray:
        return self.exact.array()
