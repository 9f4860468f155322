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
    buf = " ".join(toks).encode()
    if len(toks) <= window:
        return zlib.crc32(buf)
    # byte offsets of each token in the joined buffer: one slice + one
    # C crc call per window instead of an 8-string join + encode
    # (crc32(buf[s:e]) == crc32(" ".join(toks[i:i+w]).encode()) because
    # the window's bytes are identical either way)
    blens = [len(t.encode()) for t in toks]
    starts = [0] * len(toks)
    pos = 0
    for i, bl in enumerate(blens):
        starts[i] = pos
        pos += bl + 1
    crc = zlib.crc32
    best = 0xFFFFFFFF
    last = window - 1
    for i in range(len(toks) - window + 1):
        j = i + last
        h = crc(buf[starts[i] : starts[j] + blens[j]])
        if h < best:
            best = h
    return best


# alpha-or-space lookup for the ASCII plane; non-ASCII codepoints are
# classified once per distinct codepoint per batch (str.isalpha /
# str.isspace stay the semantic definition — the table just caches it)
_ASCII_ALPHA_SPACE = np.array(
    [chr(i).isalpha() or chr(i).isspace() for i in range(128)], dtype=bool
)


def alpha_space_counts(texts: list[str]) -> np.ndarray:
    """Per-text count of chars where ``c.isalpha() or c.isspace()`` —
    bit-identical to the scalar genexpr in :func:`quality_score`, but
    one UTF-32 decode + table lookup over the whole batch instead of
    ~10^6 Python-level genexpr frames per 5k docs."""
    n_texts = len(texts)
    if n_texts == 0:
        return np.zeros(0, dtype=np.int64)
    lens = np.fromiter((len(t or "") for t in texts), dtype=np.int64, count=n_texts)
    joined = "".join(t or "" for t in texts)
    if not joined:
        return np.zeros(n_texts, dtype=np.int64)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    mask = np.zeros(len(codes), dtype=bool)
    is_ascii = codes < 128
    mask[is_ascii] = _ASCII_ALPHA_SPACE[codes[is_ascii]]
    if not is_ascii.all():
        hi = codes[~is_ascii]
        uniq = np.unique(hi)
        vals = np.fromiter(
            ((lambda ch: ch.isalpha() or ch.isspace())(chr(int(c))) for c in uniq),
            dtype=bool, count=len(uniq),
        )
        mask[~is_ascii] = vals[np.searchsorted(uniq, hi)]
    ends = np.cumsum(lens)
    starts = ends - lens
    csum = np.concatenate(([0], np.cumsum(mask, dtype=np.int64)))
    return csum[ends] - csum[starts]


def quality_scores_batch(texts: list[str], toks_list: list[list[str]] | None = None) -> list[float]:
    """Batch :func:`quality_score` (identical output, property-tested):
    alpha counts via :func:`alpha_space_counts`, the rest is per-doc C
    calls (set(), len()) + the same final ``round(x, 6)``."""
    if toks_list is None:
        toks_list = [TOKEN_RE.findall(t or "") for t in texts]
    alpha_counts = alpha_space_counts(texts)
    out = []
    for t, toks, a in zip(texts, toks_list, alpha_counts):
        n = len(t or "")
        n_tok = len(toks)
        if n == 0 or n_tok == 0:
            out.append(0.0)
            continue
        alpha = a / n
        uniq_ratio = len(set(toks)) / n_tok
        length_score = min(1.0, n_tok / 100.0)
        out.append(round(0.4 * alpha + 0.3 * uniq_ratio + 0.3 * length_score, 6))
    return out


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of crc32 hashes of k-char shingles of the lowercased text."""
    t = (text or "").lower()
    if len(t) < k:
        return {zlib.crc32(t.encode())} if t else set()
    enc = t.encode()
    # crc32 over sliding byte windows; byte-window ≈ char-window for the
    # mostly-ASCII synthetic corpus, and consistently defined either way.
    return {zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)}


# -- vectorized CRC32 (exact zlib.crc32 bits, table-driven) ------------------

def _build_crc_table() -> np.ndarray:
    t = np.arange(256, dtype=np.uint32)
    for _ in range(8):
        t = np.where(t & 1, (t >> 1) ^ np.uint32(0xEDB88320), t >> 1)
    return t


_CRC_TABLE = _build_crc_table()


def crc32_windows(buf: np.ndarray, starts: np.ndarray, k: int) -> np.ndarray:
    """zlib.crc32 of every k-byte window ``buf[s:s+k]`` — one table-lookup
    step per window BYTE POSITION (k vectorized steps over all windows at
    once), not one Python call per window. Bit-identical to zlib."""
    crc = np.full(len(starts), 0xFFFFFFFF, dtype=np.uint32)
    for j in range(k):
        crc = (crc >> np.uint32(8)) ^ _CRC_TABLE[(crc ^ buf[starts + j]) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


def crc32_rows(mat: np.ndarray) -> np.ndarray:
    """zlib.crc32 of each ROW of a 2-D uint8 matrix (vectorized across
    rows, one step per column)."""
    crc = np.full(mat.shape[0], 0xFFFFFFFF, dtype=np.uint32)
    for j in range(mat.shape[1]):
        crc = (crc >> np.uint32(8)) ^ _CRC_TABLE[(crc ^ mat[:, j]) & np.uint32(0xFF)]
    return crc ^ np.uint32(0xFFFFFFFF)


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


def minhash_signatures_batch(texts: list[str], a: np.ndarray, b: np.ndarray,
                             k: int = 5) -> np.ndarray:
    """MinHash signatures for a WHOLE batch of texts in one numpy pass:
    all docs' k-byte shingle windows are crc32-hashed together
    (table-driven, k vectorized steps), then per-perm (a·x+b) mod p is
    reduced per-doc with ``np.minimum.reduceat``. Bit-identical to
    ``minhash_signature(char_shingles(t, k), a, b)`` per text (duplicate
    shingles don't change a min; property-tested)."""
    num_perm = len(a)
    n = len(texts)
    sigs = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return sigs
    bufs: list[bytes] = []
    starts: list[np.ndarray] = []
    doc_of_window: list[np.ndarray] = []
    offset = 0
    short: list[tuple[int, bytes]] = []  # (row, enc) for 0 < len(text) < k
    rows_with_windows: list[int] = []
    for i, t in enumerate(texts):
        t = (t or "").lower()
        if not t:
            continue
        enc = t.encode()
        if len(t) < k:
            short.append((i, enc))
            continue
        n_win = len(enc) - k + 1
        bufs.append(enc)
        starts.append(np.arange(offset, offset + n_win, dtype=np.int64))
        doc_of_window.append(np.full(n_win, i, dtype=np.int64))
        rows_with_windows.append(i)
        offset += len(enc)
    shingle_vals: list[np.ndarray] = []
    shingle_docs: list[np.ndarray] = []
    if bufs:
        buf = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        shingle_vals.append(crc32_windows(buf, np.concatenate(starts), k))
        shingle_docs.append(np.concatenate(doc_of_window))
    if short:
        shingle_vals.append(np.array([zlib.crc32(e) for _, e in short], dtype=np.uint32))
        shingle_docs.append(np.array([i for i, _ in short], dtype=np.int64))
    if not shingle_vals:
        return sigs
    x = np.concatenate(shingle_vals).astype(np.uint64)
    docs = np.concatenate(shingle_docs)
    order = np.argsort(docs, kind="stable")
    x, docs = x[order], docs[order]
    present, seg_starts = np.unique(docs, return_index=True)
    for p in range(num_perm):
        v = (a[p] * x) % _MERSENNE
        v = (v + b[p]) % _MERSENNE
        sigs[present, p] = np.minimum.reduceat(v, seg_starts)
    return sigs


def lsh_band_keys_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """LSH band keys for a signature MATRIX (n_docs × num_perm):
    per-band crc32 over the band's signature bytes, vectorized across
    docs. Same values as ``lsh_band_keys`` per row."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    as_bytes = np.ascontiguousarray(sigs).view(np.uint8).reshape(n, num_perm * 8)
    keys = np.empty((n, bands), dtype=np.int64)
    for i in range(bands):
        band = np.ascontiguousarray(as_bytes[:, i * rows * 8 : (i + 1) * rows * 8])
        keys[:, i] = crc32_rows(band).astype(np.int64) | (i << 32)
    return keys


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


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """SimHash64 for a whole batch in one pass: every token is hashed
    ONCE per batch (np.unique over all docs' tokens → one crc32 pair per
    distinct token), then each doc's accumulator is a single vectorized
    gather+sum over its token rows. Bit-identical to ``simhash64`` per
    text (property-tested)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    toks_per_doc: list[list[str]] = []
    all_toks: list[str] = []
    for t in texts:
        toks = [w.lower() for w in WORD_RE.findall(t or "")]
        toks_per_doc.append(toks)
        all_toks.extend(toks)
    if not all_toks:
        return out
    uniq, inverse = np.unique(np.array(all_toks, dtype=object), return_inverse=True)
    h = np.empty(len(uniq), dtype=np.uint64)
    for i, tok in enumerate(uniq):
        h[i] = np.uint64(zlib.crc32(tok.encode())) | (
            np.uint64(zlib.crc32(tok[::-1].encode() + b"#")) << np.uint64(32)
        )
    # (n_uniq × 64) ±1 sign matrix
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    signs = np.where(bits == 1, np.int64(1), np.int64(-1))
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    pos = 0
    for d, toks in enumerate(toks_per_doc):
        m = len(toks)
        if m == 0:
            continue
        acc = signs[inverse[pos : pos + m]].sum(axis=0)
        pos += m
        value = int(weights[acc > 0].sum())
        out[d] = value - (1 << 64) if value >= (1 << 63) else value
    return out
