"""URL canonicalization + hashing (SURVEY.md §2.8 F12, north-rule stage).

The reference only imports ``urljoin``/``urlparse``
(``pacong/scrapers/generic_scraper.py:9``) and validates URLs via
``urlparse(value).netloc`` (``generic_scraper.py:370-371``); the
canonicalize-and-hash stage is target-only (BASELINE.json north rule).

Canonical form (idempotent — canon(canon(u)) == canon(u), test-pinned):
- scheme and host lowercased;
- default ports stripped (``:80`` http, ``:443`` https);
- fragment removed;
- dot-segments resolved (RFC 3986 §5.2.4);
- empty path → ``/``;
- query preserved verbatim (no param reordering — over-normalizing
  merges distinct resources).
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit, urljoin

import numpy as np
import pyarrow as pa

from .hashing import hash64_batch

_DEFAULT_PORT = {"http": "80", "https": "443"}


def _resolve_dot_segments(path: str) -> str:
    if "." not in path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    resolved = "/".join(out)
    if path.endswith(("/.", "/..", "/")) and not resolved.endswith("/"):
        resolved += "/"
    if not resolved.startswith("/"):
        resolved = "/" + resolved
    return resolved


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL; returns "" for unparseable/relative input."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https") or not parts.hostname:
        return ""
    host = parts.hostname.lower()
    port = parts.port
    netloc = host if port is None or str(port) == _DEFAULT_PORT.get(scheme) else f"{host}:{port}"
    path = _resolve_dot_segments(parts.path) or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def join_url(base: str, link: str) -> str:
    """Resolve an outlink against its page URL (reference: urljoin import,
    generic_scraper.py:9)."""
    try:
        return urljoin(base, link)
    except ValueError:
        return ""


class CanonicalizeAndHash:
    """map_batches stage: url → (url canonical, host, url_hash, host_hash).

    Stateless but shipped as a class so the per-actor setup cost of
    nothing today (compiled tables tomorrow) is amortized; usable with
    tasks too. Arrow in / Arrow out, drops rows that fail to parse.
    """

    def __init__(self, url_col: str = "url"):
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch[self.url_col].to_pylist()
        canon = [canonicalize_url(u) if u else "" for u in urls]
        keep = np.fromiter((bool(c) for c in canon), dtype=bool, count=len(canon))
        hosts = [host_of(c) if c else "" for c in canon]
        batch = batch.set_column(
            batch.schema.get_field_index(self.url_col), self.url_col, pa.array(canon, pa.string())
        )
        batch = batch.append_column("host", pa.array(hosts, pa.string()))
        batch = batch.append_column("url_hash", pa.array(hash64_batch(canon), pa.uint64()))
        batch = batch.append_column("host_hash", pa.array(hash64_batch(hosts), pa.uint64()))
        if not keep.all():
            batch = batch.filter(pa.array(keep))
        return batch
