"""Deterministic synthetic fixtures (FIXTURES.md tables 1-6).

Everything is a pure function of an integer seed + size parameters —
no wall clock, no global RNG — so the sequential reference-semantics
oracle and the Ray pipeline see byte-identical inputs, and the same
tables regenerate identically at any parallelism level (the north
rule's cross-cluster-size determinism hinges on this).

Shardability: per-page content is keyed by ``default_rng((seed,
page_id))`` and host assignment is a pure hash→inverse-CDF function of
the page id, so any row range can be generated independently —
``gen_page_store_range`` runs inside ``map_batches`` over
``ray.data.range(n_pages)`` for large tiers; the monolithic helpers are
small-tier conveniences over the same per-row functions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import decode_image, encode_image, phash64
from .hashing import hash64, hash64_batch

SOURCE_TYPES = ["commodity", "forex", "api", "webpage", "excel"]

# vocabulary exercising F4/F5 (aliases, keywords, noise)
COMMODITY_NAMES = [
    "Gold", "Silver", "Copper", "Oil (WTI)", "Oil (Brent)", "Natural Gas",
    "Corn", "Wheat", "Soybean", "Coffee", "Live Cattle", "Platinum",
    "Aluminum", "Zinc", "RBOB Gasoline", "Heating Oil", "Sugar", "Cotton",
]
PRICE_FORMS = ["{:.2f}", "{:,.2f}", "$ {:.2f}", "{:.2f} USD", "€{:,.2f}"]
CAPTION_WORDS = ["黄金", "白银", "原油", "market", "daily", "chart", "价格", "走势", "index", "close"]


_HOSTS_MEMO: dict[int, list] = {}


def hosts_list(n_hosts: int) -> list[str]:
    # plain-dict memo (NOT lru_cache — see zipf_cdf note): page_meta
    # calls this once per page, and rebuilding n_hosts f-strings per
    # call was ~80% of the synthetic-fetch kernel's cost
    cached = _HOSTS_MEMO.get(n_hosts)
    if cached is None:
        cached = _HOSTS_MEMO[n_hosts] = [f"h{k}.example.test" for k in range(n_hosts)]
    return cached


_ZIPF_MEMO: dict[tuple[int, float], np.ndarray] = {}


def zipf_cdf(n_hosts: int, s: float = 1.2) -> np.ndarray:
    """Cumulative Zipf(s) weights over host ranks — one hot host (rank 0)
    takes ~20-40% of URLs, forcing the hot-host salting path. Memoized
    with a plain dict (page_meta calls this once per page otherwise) —
    NOT functools.lru_cache, whose wrapper pickles by qualified name and
    breaks cloudpickle's register_pickle_by_value shipping to workers."""
    key = (n_hosts, s)
    cached = _ZIPF_MEMO.get(key)
    if cached is None:
        w = np.arange(1, n_hosts + 1, dtype=np.float64) ** (-s)
        w /= w.sum()
        cached = _ZIPF_MEMO[key] = np.cumsum(w)
    return cached


def host_ids_for_pages(page_ids: np.ndarray, n_hosts: int, seed: int) -> np.ndarray:
    """Pure hash-based Zipf host assignment (shard-safe, no RNG stream)."""
    cdf = zipf_cdf(n_hosts)
    u = np.array(
        [hash64(f"host:{seed}:{int(i)}") / 2.0**64 for i in page_ids], dtype=np.float64
    )
    return np.searchsorted(cdf, u, side="right").clip(0, n_hosts - 1)


def universe_url(page_id: int, host: str) -> str:
    return f"https://{host}/p/{page_id}"


def gen_seeds(n_seeds: int, n_hosts: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §1 — seed list = universe pages 0..n_seeds-1 (host
    assignment shared with the page store via host_ids_for_pages)."""
    ids = np.arange(n_seeds, dtype=np.int64)
    host_ids = host_ids_for_pages(ids, n_hosts, seed)
    hosts = hosts_list(n_hosts)
    rng = np.random.default_rng(seed)
    prio = rng.random(n_seeds).astype(np.float32)
    types = rng.integers(0, len(SOURCE_TYPES), size=n_seeds)
    return pa.table(
        {
            "seed_id": pa.array(ids),
            "url": pa.array([universe_url(i, hosts[h]) for i, h in zip(ids, host_ids)], pa.string()),
            "host": pa.array([hosts[h] for h in host_ids], pa.string()),
            "priority": pa.array(prio, pa.float32()),
            "type": pa.array([SOURCE_TYPES[t] for t in types], pa.string()),
        }
    )


def _mutate_url(rng: np.random.Generator, url: str) -> str:
    """Emit a non-canonical variant ~20% of the time (FIXTURES §2:
    exercises canonicalize+hash and the seen set)."""
    r = rng.random()
    if r < 0.80:
        return url
    scheme, rest = url.split("://", 1)
    host, path = rest.split("/", 1)
    if r < 0.85:
        return f"HTTPS://{host}/{path}"
    if r < 0.90:
        return f"https://{host}:443/{path}"
    if r < 0.95:
        return f"https://{host}/./{path}"
    return f"https://{host}/{path}#frag{int(r * 1000)}"


def _html_table_body(rng: np.random.Generator) -> bytes:
    n_rows = int(rng.integers(2, 6))
    rows = ["<tr><th>Commodity</th><th>Price</th><th>Change</th></tr>"]
    for _ in range(n_rows):
        name = COMMODITY_NAMES[int(rng.integers(len(COMMODITY_NAMES)))]
        form = PRICE_FORMS[int(rng.integers(len(PRICE_FORMS)))]
        price = form.format(float(rng.random() * 3000))
        change = f"{'+' if rng.random() < 0.5 else '-'}{float(rng.random() * 5):.2f}%"
        rows.append(f"<tr><td>{name}</td><td>{price}</td><td>{change}</td></tr>")
    return ("<html><body><table>" + "".join(rows) + "</table></body></html>").encode()


def _jsonp_body(rng: np.random.Generator) -> bytes:
    pairs = ["fx_scnytwd", "fx_susdcny", "fx_seurusd"]
    key = pairs[int(rng.integers(len(pairs)))]
    bid = float(rng.random() * 2)
    return (
        f'var hq_str_{key}="人民币对,{bid:.4f},{bid + 0.001:.4f},{bid + 0.0005:.4f},'
        f'2024-01-22,15:30:00";'
    ).encode()


def page_meta(pid: int, n_pages: int, n_hosts: int, seed: int, max_outlinks: int = 20) -> dict:
    """Status / content-type / outlinks for one page — independent RNG
    streams per aspect so body generation can be skipped (synthetic
    fetch mode) without perturbing the link graph."""
    rs = np.random.default_rng((seed, pid, 0))
    r = rs.random()
    status = 200 if r < 0.92 else (404 if r < 0.95 else (429 if r < 0.97 else 500))
    fetch_ms = int(rs.integers(5, 51))
    ct = rs.random()
    content_type = "text/html" if ct < 0.75 else ("application/json" if ct < 0.9 else "application/jsonp")
    rl = np.random.default_rng((seed, pid, 2))
    k = int(rl.integers(0, max_outlinks + 1))
    if k == 0 or status != 200:
        links: list[str] = []
    else:
        hosts = hosts_list(n_hosts)
        tgt = rl.integers(0, n_pages, size=k)
        tgt_hosts = host_ids_for_pages(tgt, n_hosts, seed)
        links = [
            _mutate_url(rl, universe_url(int(j), hosts[th]))
            for j, th in zip(tgt.tolist(), tgt_hosts.tolist())
        ]
    return {"status": status, "fetch_ms": fetch_ms, "content_type": content_type, "outlinks": links}


def page_body(pid: int, seed: int, content_type: str) -> bytes:
    rb = np.random.default_rng((seed, pid, 1))
    if content_type == "text/html":
        return _html_table_body(rb)
    if content_type == "application/json":
        return b'{"data": {"commodities": [{"name": "Gold", "price": 2345.1}]}}'
    return _jsonp_body(rb)


def gen_page_store_range(
    lo: int, hi: int, n_pages: int, n_hosts: int, seed: int = 42,
    max_outlinks: int = 20, with_body: bool = True,
) -> pa.Table:
    """FIXTURES.md §2 — the synthetic web (fetch stand-in + link graph)
    for page ids [lo, hi). Closed graph: every outlink targets a
    universe page id < n_pages. Shard-safe: each page's content depends
    only on (seed, page_id)."""
    ids = np.arange(lo, hi, dtype=np.int64)
    host_ids = host_ids_for_pages(ids, n_hosts, seed)
    hosts = hosts_list(n_hosts)

    urls, statuses, content_types, bodies, outlinks, fetch_ms = [], [], [], [], [], []
    for pid, hid in zip(ids.tolist(), host_ids.tolist()):
        urls.append(universe_url(pid, hosts[hid]))
        meta = page_meta(pid, n_pages, n_hosts, seed, max_outlinks)
        statuses.append(meta["status"])
        fetch_ms.append(meta["fetch_ms"])
        content_types.append(meta["content_type"])
        outlinks.append(meta["outlinks"])
        if with_body:
            bodies.append(page_body(pid, seed, meta["content_type"]))

    cols = {
        "page_id": pa.array(ids),
        "url": pa.array(urls, pa.string()),
        "url_hash": pa.array(hash64_batch(urls), pa.uint64()),
        "host": pa.array([hosts[h] for h in host_ids], pa.string()),
        "status": pa.array(statuses, pa.int32()),
        "content_type": pa.array(content_types, pa.string()),
        "outlinks": pa.array(outlinks, pa.list_(pa.string())),
        "fetch_ms": pa.array(fetch_ms, pa.int32()),
    }
    if with_body:
        cols["body"] = pa.array(bodies, pa.binary())
    return pa.table(cols)


def gen_page_store(
    n_pages: int, n_hosts: int, seed: int = 42, max_outlinks: int = 20, with_body: bool = True
) -> pa.Table:
    return gen_page_store_range(0, n_pages, n_pages, n_hosts, seed, max_outlinks, with_body)


def gen_page_store_distributed(
    n_pages: int, n_hosts: int, out_dir: str, seed: int = 42,
    max_outlinks: int = 20, with_body: bool = True, num_shards: int = 32,
) -> str:
    """Generate the page store with Ray workers (one task per shard over
    ``gen_page_store_range``) and write partitioned parquet — the form a
    10^10-row dimension table must take (the monolithic generator is a
    small-tier convenience; both produce identical rows, test-pinned)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        tables = [
            gen_page_store_range(
                shard * n_pages // num_shards,
                (shard + 1) * n_pages // num_shards,
                n_pages, n_hosts, seed, max_outlinks, with_body,
            )
            for shard in batch["id"].to_pylist()
        ]
        return pa.concat_tables(tables)

    rd.range(num_shards, override_num_blocks=num_shards).map_batches(
        gen, batch_size=1, batch_format="pyarrow"
    ).write_parquet(out_dir)
    return out_dir


def page_pixels(url_hash: int, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic pixels for a page's image: a 16×16 random core
    tiled up to (h, w). Bounded entropy (~768 B) regardless of size —
    like real photos, the stored bytes compress, so the sink measures
    compute + realistic IO rather than raw-noise disk bandwidth."""
    rng = np.random.default_rng(url_hash & 0x7FFFFFFF)
    core = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    reps = (-(-h // 16), -(-w // 16), 1)
    return np.tile(core, reps)[:h, :w, :]


def image_for_page_full(
    url_hash: int, w: int = 32, h: int = 32
) -> tuple[bytes, str, str, int, np.ndarray, np.ndarray]:
    """Deterministic image+caption payload for a fetched page (the
    crawl sink's input_hint row), plus the decoded payload and source
    pixels so the sink can validate WITHOUT a second decode. Pure
    function of url_hash.

    phash is computed from the DECODED payload, not the source pixels:
    lossy jpeg quantization flips phash64(pixels) for ~5% of payloads,
    and the sink's north-rule invariant is
    phash64(decode(bytes)) == stored."""
    rng = np.random.default_rng((url_hash & 0x7FFFFFFF) ^ 0x5A5A)
    pixels = page_pixels(url_hash, w, h)
    fmt = "jpeg" if url_hash & 1 else "png"
    data = encode_image(pixels, fmt)
    words = [CAPTION_WORDS[int(rng.integers(len(CAPTION_WORDS)))] for _ in range(4)]
    caption = " ".join(words) + f" #{url_hash & 0xFFFF}"
    # decode BOTH formats: the sink's "every stored row decodes"
    # invariant must actually exercise the PNG path too (returning the
    # source pixels as 'decoded' would make (decoded == src).all()
    # trivially true for PNG rows).
    decoded = decode_image(data)
    return data, fmt, caption, phash64(decoded), decoded, pixels


def image_for_page(url_hash: int, w: int = 32, h: int = 32) -> tuple[bytes, str, str, int]:
    """Payload-only view of :func:`image_for_page_full`."""
    data, fmt, caption, ph, _, _ = image_for_page_full(url_hash, w, h)
    return data, fmt, caption, ph


def gen_images(n: int, seed: int = 42, dup_rate: float = 0.01) -> pa.Table:
    """FIXTURES.md §3 — image+caption corpus in the exact input_hint
    schema (image_id, bytes, w, h, fmt, caption, phash); ~dup_rate
    deliberate duplicates for near-dup tests."""
    rng = np.random.default_rng(seed)
    sizes = np.array([32, 64, 128])
    recs = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
    prev: list[tuple] = []
    for i in range(n):
        if prev and rng.random() < dup_rate:
            data, fmt, caption, ph, w, h = prev[int(rng.integers(len(prev)))]
        else:
            w = int(sizes[int(rng.integers(3))])
            h = int(sizes[int(rng.integers(3))])
            pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = "jpeg" if rng.random() < 0.5 else "png"
            data = encode_image(pixels, fmt)
            caption = " ".join(
                CAPTION_WORDS[int(rng.integers(len(CAPTION_WORDS)))] for _ in range(5)
            )
            # stored phash must hold for the decoded payload (see image_for_page)
            ph = phash64(decode_image(data)) if fmt == "jpeg" else phash64(pixels)
            prev.append((data, fmt, caption, ph, w, h))
            if len(prev) > 64:
                prev.pop(0)
        recs["image_id"].append(f"img-{i:08d}")
        recs["bytes"].append(data)
        recs["w"].append(w)
        recs["h"].append(h)
        recs["fmt"].append(fmt)
        recs["caption"].append(caption)
        recs["phash"].append(ph)
    return pa.table(
        {
            "image_id": pa.array(recs["image_id"], pa.string()),
            "bytes": pa.array(recs["bytes"], pa.binary()),
            "w": pa.array(recs["w"], pa.int32()),
            "h": pa.array(recs["h"], pa.int32()),
            "fmt": pa.array(recs["fmt"], pa.string()),
            "caption": pa.array(recs["caption"], pa.string()),
            "phash": pa.array(recs["phash"], pa.int64()),
        }
    )


def image_record(i: int, seed: int = 42, dup_rate: float = 0.01) -> dict:
    """One image+caption row as a PURE function of its index — the
    shardable analogue of ``gen_images`` (whose dup chain is sequential).
    A ~dup_rate slice of indices reuses the payload of a deterministic
    earlier index, so phash-dup groups exist at any parallelism."""
    h = int(hash64(f"imgdup-{seed}-{i}"))
    eff = i
    if i > 0 and (h % 10_000) < int(dup_rate * 10_000):
        eff = i - 1 - ((h >> 16) % min(i, 64))
    rng = np.random.default_rng((seed << 20) ^ eff)
    sizes = (32, 64, 128)
    w = int(sizes[int(rng.integers(3))])
    hh = int(sizes[int(rng.integers(3))])
    # full-rank random pixels (NOT a tiled core): phash needs distinct
    # low-frequency content per image, and tiling collapses it
    pixels = rng.integers(0, 256, size=(hh, w, 3), dtype=np.uint8)
    fmt = "jpeg" if rng.random() < 0.5 else "png"
    data = encode_image(pixels, fmt)
    caption = " ".join(
        CAPTION_WORDS[int(rng.integers(len(CAPTION_WORDS)))] for _ in range(5)
    )
    ph = phash64(decode_image(data)) if fmt == "jpeg" else phash64(pixels)
    return {"image_id": f"img-{i:08d}", "bytes": data, "w": w, "h": hh,
            "fmt": fmt, "caption": caption, "phash": ph}


def gen_images_ds(n: int, seed: int = 42, dup_rate: float = 0.01, blocks: int | None = None):
    """Distributed image corpus: generation runs INSIDE map_batches over
    ``ray.data.range(n)`` (per-index pure function), so fixture
    construction scales with the cluster instead of serializing on the
    driver. Same schema as ``gen_images``."""
    import ray.data as rd

    from .config import auto_blocks

    def gen(batch: pa.Table) -> pa.Table:
        rows = [image_record(int(i), seed, dup_rate) for i in batch["id"].to_pylist()]
        return pa.table(
            {
                "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
                "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
                "w": pa.array([r["w"] for r in rows], pa.int32()),
                "h": pa.array([r["h"] for r in rows], pa.int32()),
                "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
                "caption": pa.array([r["caption"] for r in rows], pa.string()),
                "phash": pa.array([r["phash"] for r in rows], pa.int64()),
            }
        )

    return rd.range(n, override_num_blocks=blocks or auto_blocks()).map_batches(
        gen, batch_format="pyarrow"
    )


def gen_robots(n_hosts: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §6 — per-host crawl delay + disallow prefixes."""
    rng = np.random.default_rng(seed + 1)
    hosts = hosts_list(n_hosts)
    delays = rng.choice([0, 500, 2000], size=n_hosts, p=[0.3, 0.4, 0.3]).astype(np.int32)
    prefixes = []
    for _ in range(n_hosts):
        k = int(rng.integers(0, 4))
        # /p/<digit> disallows ~10% of a host's pages when present
        prefixes.append([f"/p/{int(rng.integers(10))}" for _ in range(k)])
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "crawl_delay_ms": pa.array(delays),
            "disallow_prefixes": pa.array(prefixes, pa.list_(pa.string())),
        }
    )


def gen_forex_quotes(n: int, seed: int = 42) -> pa.Table:
    """Forex quote corpus for F9 derivations + V3 business rules
    (pacong/data/models.py:140-222 shape): bid/ask pairs including
    deliberate bid>ask and spread>10%·bid violations."""
    rng = np.random.default_rng(seed + 3)
    pairs = [("CNY", "TWD"), ("USD", "CNY"), ("EUR", "USD"), ("GBP", "JPY")]
    base, quote, bids, asks = [], [], [], []
    for _ in range(n):
        b, q = pairs[int(rng.integers(len(pairs)))]
        base.append(b)
        quote.append(q)
        mid = float(rng.random() * 10 + 0.1)
        spread = mid * float(rng.random() * 0.02)
        r = rng.random()
        if r < 0.05:  # bid > ask violation
            bids.append(mid + spread)
            asks.append(mid - spread)
        elif r < 0.10:  # spread too wide
            bids.append(mid)
            asks.append(mid * 1.2)
        else:
            bids.append(mid - spread / 2)
            asks.append(mid + spread / 2)
    return pa.table(
        {
            "quote_id": pa.array(np.arange(n, dtype=np.int64)),
            "base_currency": pa.array(base, pa.string()),
            "quote_currency": pa.array(quote, pa.string()),
            "bid_price": pa.array(bids, pa.float64()),
            "ask_price": pa.array(asks, pa.float64()),
        }
    )


def gen_raw_records(n: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §4 — edge-case scraped-row corpus for the
    clean/validate/dedup operators (F1-F5, V1-V3, D1)."""
    rng = np.random.default_rng(seed + 2)
    price_pool = ["1,234.56", "1.234,56", "4,09", "$70.12/bbl", "", "n/a", "70.25", "1 234,5"]
    change_pool = ["+1.23%", "-0,5%", "250%", "+0.8", "", "-51.0%"]
    sym_pool = ["GC1:COM", "XAUUSD:CUR", "GC1", "AB", "??", ""]
    name_pool = COMMODITY_NAMES + ["", "Commodity", "Price", "AB", "Oil   (WTI)"]
    base = np.datetime64("2024-01-22T12:00:00", "us")
    # vectorized column draws (same pools/distributions as the original
    # per-row loop, ~70× faster at bench sizes)
    names = np.array(name_pool, dtype=object)[rng.integers(0, len(name_pool), size=n)]
    symbols = np.array(sym_pool, dtype=object)[rng.integers(0, len(sym_pool), size=n)]
    prices = np.array(price_pool, dtype=object)[rng.integers(0, len(price_pool), size=n)]
    changes = np.array(change_pool, dtype=object)[rng.integers(0, len(change_pool), size=n)]
    sources = np.array([f"src{k}" for k in range(4)], dtype=object)[rng.integers(0, 4, size=n)]
    jitter = rng.integers(-60 * 3600, 60 * 3600, size=n)  # ±60 h: trips TimestampRule
    ts = base + jitter.astype("timedelta64[s]")
    return pa.table(
        {
            "name": pa.array(list(names), pa.string()),
            "symbol": pa.array(list(symbols), pa.string()),
            "price": pa.array(list(prices), pa.string()),
            "change": pa.array(list(changes), pa.string()),
            "source": pa.array(list(sources), pa.string()),
            "timestamp": pa.array(ts, pa.timestamp("us")),
        }
    )
