"""Stable 64-bit hashing for URL-seen sets, shuffling keys, and checkpoints.

The reference has no content hashing (its dedup keys are Python tuples,
``pacong/data/processor.py:349-361``); at 10^10-URL frontier scale every
shuffle / membership key must be a fixed-width integer. We use
blake2b(digest_size=8) — stable across processes and Python versions
(unlike builtin ``hash()``), collision-negligible at 10^10 keys
(~3e-7 expected collisions via birthday bound on 2^64).

At real cluster scale this would be xxhash64 via a C extension; blake2b
is the stdlib-only stand-in and is NOT the bottleneck at bench scale
(~1.5M hashes/sec/core; the canonicalize stage dominates).
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np

_U64 = np.uint64


def hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit hash of a string (big-endian blake2b-8)."""
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(blake2b(s, digest_size=8).digest(), "big")


def hash64_batch(values) -> np.ndarray:
    """Vectorized-ish hash of an iterable of strings → uint64 ndarray.

    Per-value Python loop over a batch is acceptable here (one tight
    comprehension per Arrow batch, not per row task); swap for a C
    xxhash at deployment scale.
    """
    enc = str.encode
    bb = blake2b
    fb = int.from_bytes
    return np.fromiter(
        (
            fb(bb(enc(v, "utf-8", "surrogatepass") if isinstance(v, str) else v, digest_size=8).digest(), "big")
            for v in values
        ),
        dtype=_U64,
        count=len(values),
    )


def fingerprint_bytes(payload: bytes) -> str:
    """Hex content fingerprint for checkpoint lineage records."""
    return blake2b(payload, digest_size=16).hexdigest()
