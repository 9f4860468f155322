"""Text-analysis primitives for the training-data pipeline operators:
tokenization, language-ID heuristic, quality scoring, fingerprints,
shingles, MinHash, SimHash.

These are target-side additions (no reference counterpart — the
reference's only text ops are the cleaners in
``pacong/data/processor.py``); they power the documents-table operators
required for large-scale corpus curation (dedup, quality filter).

All per-batch wrappers are vectorized or single-pass-per-batch; no
per-row Ray tasks.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[a-zA-Z]+")
# BPE-ish word/number/punct splitter for token *counting* (SURVEY "token
# counting (whitespace + a BPE-ish regex)").
BPE_RE = re.compile(r"[a-zA-Z]+|\d+|[^\sa-zA-Z\d]")

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "los", "por"},
    "fr": {"le", "la", "de", "et", "est", "un", "que", "les", "des", "en"},
}


def token_count(text: str) -> int:
    """Whitespace token count (nonempty tokens)."""
    return len(TOKEN_RE.findall(text or ""))


def bpe_token_count(text: str) -> int:
    """BPE-ish token count: words + numbers + individual punctuation."""
    return len(BPE_RE.findall(text or ""))


def lang_id(text: str) -> str:
    """n-gram/stopword heuristic language ID.

    Scores each language by stopword hits among the first 200 words;
    deterministic tie-break by language code. Returns "und" when no
    stopword hits at all.
    """
    words = [w.lower() for w in WORD_RE.findall(text or "")[:200]]
    if not words:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(_STOPWORDS):
        score = sum(1 for w in words if w in _STOPWORDS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def quality_score(text: str) -> float:
    """Heuristic document quality in [0, 1]: length, punctuation balance,
    alpha ratio, repetition penalty. Deterministic, vectorizable per batch."""
    t = text or ""
    n = len(t)
    if n == 0:
        return 0.0
    toks = TOKEN_RE.findall(t)
    n_tok = len(toks)
    if n_tok == 0:
        return 0.0
    alpha = sum(c.isalpha() or c.isspace() for c in t) / n
    uniq_ratio = len(set(toks)) / n_tok
    length_score = min(1.0, n_tok / 100.0)
    return round((0.4 * alpha + 0.3 * uniq_ratio + 0.3 * length_score), 6)


def doc_fingerprint(text: str, window: int = 8) -> int:
    """Rolling-hash document fingerprint: min of rolling crc32 over
    ``window``-token windows (robust to small edits at the ends).
    Stable across processes."""
    toks = TOKEN_RE.findall((text or "").lower())
    if not toks:
        return 0
    if len(toks) <= window:
        return zlib.crc32(" ".join(toks).encode())
    best = 0xFFFFFFFF
    for i in range(len(toks) - window + 1):
        h = zlib.crc32(" ".join(toks[i : i + window]).encode())
        if h < best:
            best = h
    return best


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of crc32 hashes of k-char shingles of the lowercased text."""
    t = (text or "").lower()
    if len(t) < k:
        return {zlib.crc32(t.encode())} if t else set()
    enc = t.encode()
    # crc32 over sliding byte windows; byte-window ≈ char-window for the
    # mostly-ASCII synthetic corpus, and consistently defined either way.
    return {zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)}


# -- MinHash ----------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set via the
    universal-hash family (a*x+b) mod p (Broder '97 construction)."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, computed in python ints via object to avoid overflow:
    # use uint64 modular trick — p = 2^61-1 allows float-free reduction.
    prod = (a[:, None] * x[None, :]) % _MERSENNE
    sig = (prod + b[:, None]) % _MERSENNE
    return sig.min(axis=1).astype(np.uint64)


def lsh_band_keys(sig: np.ndarray, bands: int) -> list[int]:
    """Split a signature into ``bands`` bands; crc32 each band → bucket key."""
    rows = len(sig) // bands
    return [
        zlib.crc32(sig[i * rows : (i + 1) * rows].tobytes()) | (i << 32)
        for i in range(bands)
    ]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter) if (a or b) else 0.0


# -- SimHash ----------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features (Charikar '02): sum ±1 per bit
    weighted by term frequency, sign → bit. Returns signed int64."""
    toks = [w.lower() for w in WORD_RE.findall(text or "")]
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    acc = np.zeros(64, dtype=np.int64)
    for tok, cnt in zip(uniq, counts):
        h = np.uint64(zlib.crc32(tok.encode())) | (
            np.uint64(zlib.crc32(tok[::-1].encode() + b"#")) << np.uint64(32)
        )
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, cnt, -cnt)
    value = int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)
    return value - (1 << 64) if value >= (1 << 63) else value
