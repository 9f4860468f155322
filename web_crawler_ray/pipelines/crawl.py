"""The Ray-Data-native crawl frontier + fetch scheduler (north rule).

Driver-orchestrated BFS rounds (SURVEY.md §3.4) — Ray Data has no
native iteration, so each round is one Dataset execution and the round
boundary is the checkpoint boundary:

    frontier_r ─ canonicalize+hash ─ round-dedup(url_hash)
        ─ URL-seen probe/insert (sharded cuckoo actors)
        ─ groupby(host) politeness+robots gate (virtual clock)
        ─ granted ⋈ page_store (hash join = the fetch)
        ─ outlink explode → frontier_{r+1};  image rows → Lance-like sink
        ─ order + metrics tables

Determinism (the north rule's cross-cluster-size ordering match):
every ordering-relevant decision is a pure function of the data —
round-dedup keeps (max priority, min depth, min seed_id); the per-host
schedule is a min-heap on (-priority, url_hash); virtual fetch time is
round*budget + slot*delay; the global crawl order is the sort
(round, fetch_ts_ms, host, url_hash). Task completion order never
matters; ``preserve_order`` is unnecessary because order is recomputed
from columns, not stream position.

Seen-set exactness: duplicates are collapsed per round BEFORE probing,
so each url_hash hits its shard exactly once per round and the final
seen set is order-independent. Shards are cuckoo-filter-fronted exact
stores (state/cuckoo.py) checkpointed as bytes per round.

Scale notes: frontier lives in parquet between rounds (never a driver
list); the host groupby is the one big shuffle per round; the
politeness budget caps any single host's granted rows per round, which
bounds hot-host group size (the Zipf head) — the residual skew lives in
the *deferred* rows, which are written back to parquet without further
per-host work. Fetch mode "synth" regenerates page metadata from
(seed, page_id) as a pure map (no join) for scheduler-throughput
benches; mode "join" does the honest frontier⋈page_store hash join.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..codecs import decode_image, phash64, psnr
from ..hashing import fingerprint_bytes, hash64, hash64_batch
from ..io import lancelike
from ..state.cuckoo import SeenShardState
from ..state.politeness import DEFAULT_DELAY_MS, HostRules, build_robots_map, schedule_host_batch
from ..synth import gen_robots, image_for_page, image_for_page_full, page_meta, page_pixels
from ..urls import CanonicalizeAndHash

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.float32()),
        ("seed_id", pa.int64()),
        ("admitted", pa.bool_()),
    ]
)


@dataclass
class CrawlConfig:
    n_pages: int
    n_hosts: int
    seed: int = 42
    max_rounds: int = 4
    max_depth: int = 8
    round_budget_ms: int = 60_000
    n_seen_shards: int = 8
    # per-shard cuckoo capacity. Size for ≤~70% load at the expected
    # seen-set size: past ~85% load cuckoo inserts degrade into long
    # eviction chains (observed 5× round slowdown at 88% load). 1<<20
    # slots ≈ 2 MiB/shard — memory is the cheap axis here.
    seen_shard_capacity: int = 1 << 20
    # optional exact-store disk spill (ExactPages memmap pages) — set to
    # a directory to bound shard RAM regardless of seen-set size
    seen_spill_dir: str | None = None
    priority_decay: float = 0.85
    fetch_mode: str = "join"  # "join" | "synth"
    checkpoint_dir: str = "/tmp/crawl_ckpt"
    write_images: bool = True
    image_px: int = 32
    num_blocks: int = 16
    # hot-host salting (SURVEY §2.12.3): a host whose frontier share
    # exceeds hot_host_factor × (frontier / num_blocks) gets its
    # dedup+probe spread over hot_salt_factor url-hash-salted
    # partitions; only its (much smaller, budget-bound) survivors are
    # re-shuffled to the host's home task for the politeness decision —
    # the next-allowed clock stays authoritative per host.
    salt_hot_hosts: bool = True
    hot_host_factor: float = 1.0
    hot_salt_factor: int = 8
    # robots rule distribution: "broadcast" ships the whole map once via
    # the object store; "sliced" shards it by host_hash % num_blocks so
    # each schedule task reads only its partition's slice (the
    # 10^7-hosts path — per-task payload stops growing with host count);
    # "dimension" keeps the rules a DATASET that rides the politeness
    # shuffle itself (rule rows co-partition with their host's URLs, a
    # hot host's rules follow its survivors to the home task) — the
    # 10^9-hosts path: no driver-held map, no per-task slice refs,
    # per-task rule payload ∝ hosts-in-partition. Results are
    # identical across all three modes (test-pinned).
    robots_mode: str = "broadcast"
    # granted sets at or below this size take the single-driver-pass
    # order write (one traversal, single file); larger sets stream a
    # distributed sort + directory write
    driver_order_rows: int = 1 << 18
    # order-push: schedule tasks piggyback their granted order rows on
    # the per-task stats RPC, so the driver writes the round's order
    # file without a SECOND Dataset execution (filter + pull) over the
    # materialized schedule. None = auto: enabled iff the politeness
    # bound Σ_hosts max(1, budget//delay) — a hard cap on granted rows
    # per round, known before the round runs — fits
    # order_push_bound_rows (~100 B/row worst case through one actor).
    order_push: bool | None = None
    order_push_bound_rows: int = 1 << 19
    # execution mode. "rounds" (default): one Dataset execution per
    # BFS stage for schedule, plus separate traversals for order and
    # fetch — the materialize barrier between schedule and fetch is
    # the checkpoint story. "streaming": the round-5 prototype — ONE
    # fused Dataset execution per budget window (schedule →
    # fetch/sink/explode → next-frontier write in a single streaming
    # DAG), so granted batches flow into the fetch stage as soon as
    # their politeness partition finishes instead of waiting for every
    # partition; order rows ride the existing order-push RPC.
    # Constraints (prototype): fetch_mode="synth" (the join fetch
    # needs the granted-hash broadcast, which is a barrier) and order
    # push must fit its bound. Hot-host salting works in-DAG: a second
    # host-keyed exchange co-locates each hot host's survivors at a
    # home task (the politeness decision needs all of them, so exactly
    # those rows barrier); order/seen digests match the round model
    # exactly with salting on or off (test-pinned).
    mode: str = "rounds"
    # join-mode page-store cache gate: at or below this many rows the
    # pruned store is materialized ONCE in the object store and reused
    # across rounds; above it every round re-scans the parquet through
    # the streaming semi-filter (a 100-TB page store must never be
    # pinned whole in the object store)
    page_store_cache_rows: int = 10_000_000
    # streaming-mode join fetch: number of page-store shard actors.
    # The fused DAG can't broadcast the granted-hash set (knowing ALL
    # granted rows is exactly the barrier streaming removes), so the
    # lookup is INVERTED: the store is hash-partitioned by
    # url_hash % page_shards once (hive parquet, a layout a 100-TB
    # store would already live in), one actor per shard, and granted
    # batches PROBE the actors as they arrive — RPC volume is bounded
    # by the politeness budget, never by store size.
    page_shards: int = 8

    def to_json(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


@ray.remote
class SeenShardActor:
    """One URL-seen shard (SURVEY §2.3 T7). Batch RPCs only."""

    def __init__(self, shard_id: int, capacity: int, spill_dir: str | None = None):
        self.state = SeenShardState(
            shard_id, capacity,
            spill_dir=None if spill_dir is None else os.path.join(
                spill_dir, f"shard-{shard_id:03d}"),
        )

    def probe_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.state.probe_and_add(hashes)

    def snapshot(self) -> dict:
        return self.state.snapshot()

    def checkpoint_to(self, path: str) -> int:
        """Write this shard's own checkpoint file (per-partition
        checkpointing, north rule) — all shards write in parallel, the
        driver only barriers on completion."""
        snap = self.state.snapshot()
        # uncompressed outer container: the cuckoo bytes inside are
        # already zlib-compressed by serialize(), and recompressing the
        # 8 MB bucket arrays cost more per round than writing them
        np.savez(path, **{k: v for k, v in snap.items() if v is not None},
                            has_bloom=np.bool_(snap["bloom"] is not None))
        return len(self.state.exact)

    def restore_from(self, path: str) -> int:
        loaded = np.load(path, allow_pickle=False)
        snap = {
            "shard_id": int(loaded["shard_id"]),
            "cuckoo": bytes(loaded["cuckoo"]),
            "bloom": bytes(loaded["bloom"]) if bool(loaded["has_bloom"]) else None,
            "exact": loaded["exact"],
            "fp_hits": int(loaded["fp_hits"]),
        }
        self.state = SeenShardState.restore(snap)
        return len(self.state.exact)

    def restore(self, snap: dict) -> None:
        self.state = SeenShardState.restore(snap)

    def seen_array(self) -> np.ndarray:
        return self.state.seen_array()

    def seen_digest(self) -> str:
        """Digest of this shard's sorted seen keys — lets two runs be
        compared for seen-set equality without shipping any keys."""
        return hashlib.md5(self.state.seen_array().tobytes()).hexdigest()

    def stats(self) -> dict:
        return {"n": len(self.state.exact), "fp_hits": self.state.fp_hits,
                "cuckoo_count": self.state.cuckoo.count,
                "bloom_spilled": self.state.bloom is not None}



def _stats_call(ref):
    """EXPERIMENT KNOB: block on stats RPCs (default, retry-safe) or
    fire-and-forget when WCR_STATS_NOWAIT=1 (contention measurement)."""
    if os.environ.get("WCR_STATS_NOWAIT") != "1":
        ray.get(ref)

def round_dedup_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Collapse same-url_hash rows within one hash partition: keep max
    priority, tie → min depth, then min seed_id (pure, order-independent).
    Vectorized sort + drop_duplicates — NEVER one call per URL: the
    groupby key is a coarse hash partition (url_hash % P), not url_hash
    itself, so there are P pandas calls per round, each O(n log n)."""
    df = df.sort_values(
        ["url_hash", "priority", "depth", "seed_id"],
        ascending=[True, False, True, True],
        kind="mergesort",
    )
    # OR the admitted flag across duplicates BEFORE picking the winner:
    # a politeness-deferred row (admitted=True, already seen-marked) that
    # loses dedup to a higher-priority duplicate child must not hand the
    # url to the seen probe — the child would be dropped as "seen" and
    # the URL silently never fetched. The winner inherits admission.
    df = df.assign(
        admitted=df.groupby("url_hash", sort=False)["admitted"].transform("max")
    )
    return df.drop_duplicates(subset="url_hash", keep="first")


def seen_probe(batch: pa.Table, shards: list, n_shards: int) -> pa.Table:
    """map_batches stage (stateless task — actor handles travel in the
    closure, so no per-round pool spin-up): route url_hashes to their
    shard actors in one RPC per (batch, shard); keep admitted rows and
    new rows."""
    if batch.num_rows == 0:
        return batch
    hashes = batch["url_hash"].to_numpy(zero_copy_only=False)
    admitted = batch["admitted"].to_numpy(zero_copy_only=False)
    probe_mask = ~admitted
    keep = admitted.copy()
    if probe_mask.any():
        idx = np.nonzero(probe_mask)[0]
        shard_of = (hashes[idx] % np.uint64(n_shards)).astype(np.int64)
        futures, positions = [], []
        for s in range(n_shards):
            pos = idx[shard_of == s]
            if len(pos):
                futures.append(shards[s].probe_and_add.remote(hashes[pos]))
                positions.append(pos)
        for pos, new_mask in zip(positions, ray.get(futures)):
            keep[pos] = new_mask
    return batch.filter(pa.array(keep))


def synthetic_fetch(batch: pa.Table, n_pages: int, n_hosts: int, seed: int) -> pa.Table:
    """Pure-function fetch (mode="synth"): page metadata from
    (seed, page_id) parsed out of the canonical URL — no join, no I/O.
    The scheduler-throughput bench path. Stateless task."""
    urls = batch["url"].to_pylist()
    status, outlinks, fetch_ms = [], [], []
    for u in urls:
        try:
            pid = int(u.rsplit("/p/", 1)[1])
        except (IndexError, ValueError):
            status.append(404); outlinks.append([]); fetch_ms.append(0)
            continue
        meta = page_meta(pid, n_pages, n_hosts, seed)
        status.append(meta["status"])
        outlinks.append(meta["outlinks"])
        fetch_ms.append(meta["fetch_ms"])
    return (
        batch.append_column("status", pa.array(status, pa.int32()))
        .append_column("outlinks", pa.array(outlinks, pa.list_(pa.string())))
        .append_column("fetch_ms", pa.array(fetch_ms, pa.int32()))
    )


@ray.remote
class CrawlStatsActor:
    """Per-round counters fed from inside map tasks (SURVEY §2.3 T5:
    metrics as an actor, not mutable globals). Calls are ray.get-ed by
    the emitting task so all adds land before the round barrier."""

    def __init__(self):
        self.counts: dict[tuple[int, str], int] = {}
        # (round, key) -> {batch_tag: n}; set_tagged OVERWRITES per tag,
        # so a Ray task retry / speculative re-execution of the same
        # block lands on the same tag instead of double-counting.
        self.tagged: dict[tuple[int, str], dict[int, int]] = {}
        # (round, key) -> first time.monotonic() an event of that key
        # arrived — CLOCK_MONOTONIC is system-wide on Linux, so the
        # driver can subtract its own round-start stamp to measure
        # pipeline latency (e.g. first fetch completion vs the round
        # barrier) on this single-node sandbox.
        self.first_ts: dict[tuple[int, str], float] = {}

    def add(self, round_index: int, key: str, n: int) -> None:
        self.counts[(round_index, key)] = self.counts.get((round_index, key), 0) + n

    def set_tagged(self, round_index: int, key: str, tag: int, n: int) -> None:
        self.first_ts.setdefault((round_index, key), time.monotonic())
        self.tagged.setdefault((round_index, key), {})[tag] = n

    def set_tagged_many(self, round_index: int, tag: int,
                        counts: dict[str, int]) -> None:
        """All of one task's tagged counters in ONE roundtrip (the fetch
        path used to pay three blocking RPCs per task — measured ~7% of
        32-CPU streaming-window wall). Same overwrite-on-retry rule."""
        for key, n in counts.items():
            self.set_tagged(round_index, key, tag, n)

    def first_time(self, round_index: int, key: str) -> float | None:
        return self.first_ts.get((round_index, key))

    def set_disp(self, round_index: int, tag: int, counts: dict) -> None:
        """Per-task disposition histogram, folded into the schedule pass
        so no separate counting traversal of the scheduled dataset is
        needed. Tagged (overwrite-on-retry) like set_tagged."""
        self.tagged.setdefault((round_index, "__disp"), {})[tag] = dict(counts)

    def set_sched(self, round_index: int, tag: int, counts: dict, order) -> None:
        """Combined per-task schedule report: disposition histogram +
        (order-push mode) the task's granted order rows as one Arrow
        table — one actor roundtrip per task, overwrite-on-retry. The
        pushed payload is politeness-bounded (Σ max(1, budget//delay)
        over the task's hosts), never frontier-sized."""
        self.tagged.setdefault((round_index, "__disp"), {})[tag] = dict(counts)
        if order is not None:
            self.tagged.setdefault((round_index, "__order"), {})[tag] = order

    def order_chunks(self, round_index: int) -> list:
        return list(self.tagged.get((round_index, "__order"), {}).values())

    def drop_order(self, round_index: int) -> None:
        self.tagged.pop((round_index, "__order"), None)

    def disp_counts(self, round_index: int) -> dict:
        out: dict[str, int] = {}
        for c in self.tagged.get((round_index, "__disp"), {}).values():
            for k, v in c.items():
                out[k] = out.get(k, 0) + int(v)
        return out

    def get(self, round_index: int, key: str) -> int:
        return self.counts.get((round_index, key), 0) + sum(
            self.tagged.get((round_index, key), {}).values()
        )


def fetch_sink_explode(
    batch: pa.Table,
    *,
    fetch_mode: str,
    n_pages: int,
    n_hosts: int,
    seed: int,
    decay: float,
    max_depth: int,
    frag_dir: str | None,
    image_px: int,
    round_index: int,
    stats,
) -> pa.Table:
    """One streaming pass per granted batch: fetch (synth mode) →
    keep 200s → encode+write image rows (side-effect parquet file per
    batch, deterministic name from the batch's min url_hash) → explode
    outlinks into next-round frontier rows. Collapses what were four
    per-round Dataset executions into one."""
    if batch.num_rows == 0:
        return pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
    # deterministic batch tag (url_hashes are unique post-dedup, so the
    # min over a block identifies it): retries overwrite, not accumulate
    btag = int(pc.min(batch["url_hash"]).as_py())
    if fetch_mode == "synth":
        batch = synthetic_fetch(batch, n_pages, n_hosts, seed)
    ok = batch.filter(pc.equal(batch["status"], 200))
    pend = {"fetched_ok": ok.num_rows}
    if frag_dir is not None and ok.num_rows:
        # image generation + inline invariant enforcement (north rule:
        # every stored row decodes; PSNR≥40 dB for lossy; phash of the
        # decoded payload matches stored) in ONE pass — the stored
        # phash comes from the decoded payload (image_for_page_full),
        # so generation and validation share a single decode per row.
        # NOTE: image_for_page_full/psnr must be imported at MODULE
        # top: a runtime `from ..x import y` inside this
        # by-value-shipped function would try a real package import in
        # the worker.
        ids, datas, fmts, caps, phs = [], [], [], [], []
        n_invalid = 0
        for uh in ok["url_hash"].to_pylist():
            uh = int(uh)
            try:
                data, fmt, caption, ph, decoded, src = image_for_page_full(
                    uh, image_px, image_px
                )
                ok_row = (decoded == src).all() if fmt == "png" else psnr(decoded, src) >= 40.0
            except Exception:
                ok_row = False
            if not ok_row:
                n_invalid += 1
                continue
            ids.append(f"img-{uh:016x}")
            datas.append(data)
            fmts.append(fmt)
            caps.append(caption)
            phs.append(ph)
        img = pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(datas, pa.binary()),
                "w": pa.array([image_px] * len(ids), pa.int32()),
                "h": pa.array([image_px] * len(ids), pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(phs, pa.int64()),
            }
        )
        pend["invalid_images"] = n_invalid
        tag = int(pc.min(ok["url_hash"]).as_py())
        pq.write_table(img, os.path.join(frag_dir, f"part-{tag:016x}.parquet"))
        pend["images"] = img.num_rows
    if stats is not None:
        # ONE blocking roundtrip per task (after the fragment write, so
        # the counters still land before the round barrier sees them)
        _stats_call(stats.set_tagged_many.remote(round_index, btag, pend))
    return explode_outlinks(ok, decay, max_depth)


def _parquet_rows(path: str) -> int:
    """Row count of a parquet file/dir from footer metadata only (no scan)."""
    if os.path.isdir(path):
        return sum(
            pq.read_metadata(os.path.join(path, f)).num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.read_metadata(path).num_rows


def pack_outlinks(batch: pa.Table) -> pa.Table:
    """list<string> outlinks → newline-joined string (Ray's hash join
    rejects list-typed non-key columns; URLs cannot contain newlines)."""
    packed = ["\n".join(links) for links in batch["outlinks"].to_pylist()]
    idx = batch.schema.get_field_index("outlinks")
    return batch.set_column(idx, "outlinks", pa.array(packed, pa.string()))


_PAGE_COLS = ["url_hash", "status", "outlinks", "fetch_ms"]


def _ensure_page_shards(page_store_path: str, n_shards: int,
                        scratch_dir: str) -> str:
    """Hash-partition the page store by ``url_hash % n_shards`` into
    hive parquet (``shard=K/``) — ONE streaming pass, NO shuffle
    (``write_parquet(partition_cols=...)`` splits each block locally),
    column-pruned to the 4 fetch columns. Idempotent per
    (store, n_shards): a ``_SUCCESS`` marker skips the rebuild on
    resume. At 100 TB the store would already be STORED in this
    layout, so the pass amortizes to zero; here it's built under the
    crawl's checkpoint dir (pid/run-scoped, no cross-harness sharing)."""
    root = os.path.join(scratch_dir, f"page_shards-{n_shards}")
    done = os.path.join(root, "_SUCCESS")
    if os.path.exists(done):
        return root
    if os.path.exists(root):
        shutil.rmtree(root)  # crashed-attempt leftovers

    def add_shard(batch: pa.Table) -> pa.Table:
        uh = batch["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sh = (uh % np.uint64(n_shards)).astype(np.int32)
        return batch.append_column("shard", pa.array(sh))

    (rd.read_parquet(page_store_path, columns=_PAGE_COLS)
     .map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(root, partition_cols=["shard"]))
    open(done, "w").close()
    return root


@ray.remote
class PageStoreShardActor:
    """One url_hash shard of the page store for streaming-mode join
    fetch (SURVEY §2.10; the probe-side inversion of the rounds-mode
    broadcast semi-join at crawl.py::run_crawl). Mirrors
    ``SeenShardActor``: batch RPCs only, state built once in
    ``__init__``. The shard slice here is held as a sorted Arrow table
    (bench store ≈ MBs/shard); a 100-TB deployment keeps only the
    sorted url_hash array (8 B/row) in memory and ``take``s attribute
    rows from its parquet partition on demand — same probe contract."""

    def __init__(self, shard_dir: str):
        if os.path.isdir(shard_dir):
            t = pack_outlinks(pq.read_table(shard_dir, columns=_PAGE_COLS))
        else:  # a shard value no store row hashed to: empty shard
            t = pa.table({"url_hash": pa.array([], pa.uint64()),
                          "status": pa.array([], pa.int32()),
                          "outlinks": pa.array([], pa.string()),
                          "fetch_ms": pa.array([], pa.int32())})
        uh = t["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(uh)
        self._uh = uh[order]
        self._tab = t.take(pa.array(order))

    def probe(self, hashes: np.ndarray) -> pa.Table:
        """Rows for the url_hashes present in this shard. Misses return
        nothing — the caller's attach step drops them, preserving the
        rounds-mode INNER-join semantics exactly."""
        if len(self._uh) == 0 or len(hashes) == 0:
            return self._tab.slice(0, 0)
        pos = np.searchsorted(self._uh, hashes)
        pos = np.minimum(pos, len(self._uh) - 1)
        mask = self._uh[pos] == hashes
        return self._tab.take(pa.array(pos[mask]))


def probe_fetch_attach(granted: pa.Table, actors: list,
                       n_shards: int) -> pa.Table:
    """Attach (status, outlinks, fetch_ms) to granted rows by probing
    the page-store shard actors — the streaming-window replacement for
    the rounds-mode ``granted ⋈ page_store`` join. One RPC per touched
    shard per batch (granted batches are politeness-partition-sized, so
    RPC count ≤ n_shards and payload is budget-bounded). Vectorized
    throughout; granted url_hashes missing from the store are DROPPED
    (inner-join semantics, identical to the rounds path)."""
    uh = granted["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sh = (uh % np.uint64(n_shards)).astype(np.int64)
    futs = [actors[int(k)].probe.remote(uh[sh == k]) for k in np.unique(sh)]
    hits = pa.concat_tables(ray.get(futs))
    if hits.num_rows == 0:
        return granted.slice(0, 0).drop_columns(["disposition"]).append_column(
            "status", pa.array([], pa.int32())).append_column(
            "outlinks", pa.array([], pa.string())).append_column(
            "fetch_ms", pa.array([], pa.int32()))
    huh = hits["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(huh)
    huh = huh[order]
    pos = np.searchsorted(huh, uh)
    pos = np.minimum(pos, len(huh) - 1)
    found = huh[pos] == uh
    out = granted.filter(pa.array(found)).drop_columns(["disposition"])
    take = pa.array(order[pos[found]])
    for col in ("status", "outlinks", "fetch_ms"):
        out = out.append_column(col, hits[col].take(take))
    return out


def explode_outlinks(batch: pa.Table, decay: float, max_depth: int) -> pa.Table:
    """Fetched pages → child frontier rows (priority decays, depth+1).
    Accepts list<string> or packed-string outlinks. Fully vectorized
    (the crawl hot path runs this for every fetched page every round):
    list offsets drive an ``np.repeat`` of the parent columns and a
    ``flatten()`` of the link values — C kernels, zero Python per row —
    same output order as the row loop it replaced (parents in batch
    order, links in list order)."""
    import pyarrow.compute as pc

    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "depth": pa.array([], pa.int32()),
            "priority": pa.array([], pa.float32()),
            "seed_id": pa.array([], pa.int64()),
            "admitted": pa.array([], pa.bool_()),
        }
    )
    if not batch.num_rows:
        return empty
    col = batch["outlinks"]
    packed = pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
    # drop ineligible parents up front: depth+1 past the horizon, and
    # (packed form) the empty string — which split_pattern would turn
    # into one "" link instead of zero
    keep = pc.less_equal(batch["depth"], max_depth - 1)
    if packed:
        keep = pc.and_kleene(keep, pc.not_equal(col, ""))
    batch = batch.filter(pc.fill_null(keep, False))
    if not batch.num_rows:
        return empty
    col = batch["outlinks"].combine_chunks()
    arr = pc.split_pattern(col, "\n") if packed else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.LargeListArray):
        arr = arr.cast(pa.list_(arr.type.value_type))
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    if arr.null_count:
        lengths = np.where(~np.asarray(arr.is_null()), lengths, 0)
    rep = np.repeat(np.arange(batch.num_rows), lengths)
    urls = arr.flatten()
    if pa.types.is_large_string(urls.type):
        urls = urls.cast(pa.string())
    depths = batch["depth"].to_numpy(zero_copy_only=False)[rep] + np.int32(1)
    # multiply in float64 THEN cast to float32 — bit-identical to the
    # former Python-float row loop (a float32×float32 multiply rounds
    # differently and would shift the crawl order digest)
    prios = (batch["priority"].to_numpy(zero_copy_only=False)
             .astype(np.float64)[rep] * float(decay))
    seeds = batch["seed_id"].to_numpy(zero_copy_only=False)[rep]
    return pa.table(
        {
            "url": urls,
            "depth": pa.array(depths.astype(np.int32), pa.int32()),
            "priority": pa.array(prios.astype(np.float32), pa.float32()),
            "seed_id": pa.array(seeds.astype(np.int64), pa.int64()),
            "admitted": pa.array(np.zeros(len(rep), dtype=bool)),
        }
    )


class ImageRows:
    """Fetched page → input_hint image+caption row (deterministic payload
    per url_hash; SURVEY §2.1 K4). Small batches: binary rows are wide."""

    def __init__(self, px: int = 32):
        self.px = px

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, datas, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
        for uh in batch["url_hash"].to_pylist():
            data, fmt, caption, ph = image_for_page(int(uh), self.px, self.px)
            ids.append(f"img-{int(uh):016x}")
            datas.append(data)
            ws.append(self.px)
            hs.append(self.px)
            fmts.append(fmt)
            caps.append(caption)
            phs.append(ph)
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "bytes": pa.array(datas, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
                "caption": pa.array(caps, pa.string()),
                "phash": pa.array(phs, pa.int64()),
            }
        )


def _round_dir(cfg: CrawlConfig, r: int) -> str:
    return os.path.join(cfg.checkpoint_dir, f"round-{r:03d}")


def run_crawl(cfg: CrawlConfig, seeds_table: pa.Table, page_store_path: str | None = None,
              robots_table: pa.Table | None = None, resume: bool = False,
              collect_seen: bool = False) -> dict:
    """Run (or resume) the crawl. Returns summary dict with paths.

    ``seeds_table``: FIXTURES §1 table. ``page_store_path``: parquet of
    gen_page_store (required for fetch_mode="join").
    """
    if robots_table is None:
        robots_table = gen_robots(cfg.n_hosts, cfg.seed)
    robots_map_full = (build_robots_map(robots_table)
                       if cfg.robots_mode != "dimension" else {})
    robots_ref = None
    robots_slice_refs: list | None = None
    if cfg.robots_mode == "sliced":
        # partition-local robots slices (the 10^7-host path): rules are
        # sharded by the SAME host_hash % num_blocks key the politeness
        # shuffle uses, so each schedule task fetches only its
        # partition's slice — per-task payload ∝ hosts / num_blocks
        # instead of the whole rules map.
        slices: list[dict] = [{} for _ in range(cfg.num_blocks)]
        for host, rules in robots_map_full.items():
            slices[int(hash64(host)) % cfg.num_blocks][host] = rules
        robots_slice_refs = [ray.put(s) for s in slices]
    elif cfg.robots_mode == "dimension":
        pass  # rules ride the politeness shuffle as a Dataset (below)
    else:
        robots_ref = ray.put(robots_map_full)
    robots_dim_ds = None
    if cfg.robots_mode == "dimension":
        # rules as a DATASET co-shuffled with the frontier (the
        # 10^9-host path): one frontier-schema row per host carrying
        # its serialized rules; unioned into the canon stream each
        # round so the ONE politeness shuffle co-locates every host's
        # rules with its URLs. No driver-held map exists in this mode:
        # even the order-push BOUND is one distributed map+sum over
        # this Dataset (below).
        def _rules_rows(tab: pa.Table) -> pa.Table:
            hosts = tab["host"].to_pylist()
            delays = tab["crawl_delay_ms"].to_pylist()
            prefs = tab["disallow_prefixes"].to_pylist()
            rjs = [
                json.dumps([int(d) if d else DEFAULT_DELAY_MS,
                            list(p or ())])
                for d, p in zip(delays, prefs)
            ]
            hh = hash64_batch(hosts)
            n = len(hosts)
            return pa.table({
                "url": pa.array([""] * n, pa.string()),
                "depth": pa.array([0] * n, pa.int32()),
                "priority": pa.array([0.0] * n, pa.float32()),
                "seed_id": pa.array([-1] * n, pa.int64()),
                "admitted": pa.array([False] * n, pa.bool_()),
                "host": pa.array(hosts, pa.string()),
                "url_hash": pa.array(hh, pa.uint64()),
                "host_hash": pa.array(hh, pa.uint64()),
                "rules_json": pa.array(rjs, pa.string()),
            })

        robots_dim_ds = (
            rd.from_arrow(robots_table)
            .map_batches(_rules_rows, batch_format="pyarrow")
            .materialize()
        )

    shards = [
        SeenShardActor.remote(i, cfg.seen_shard_capacity, cfg.seen_spill_dir)
        for i in range(cfg.n_seen_shards)
    ]
    stats_actor = CrawlStatsActor.remote()

    # order-push gate: granted rows per round are hard-capped by the
    # politeness budget, computable from the robots rules BEFORE any
    # round runs. Only when that cap fits the driver threshold do
    # schedule tasks piggyback order rows on their stats RPC.
    order_push = cfg.order_push
    if order_push is None:
        if robots_dim_ds is not None:
            # dimension mode: the bound is one distributed map+sum over
            # the rules Dataset — the driver never folds the host map
            budget_ms = cfg.round_budget_ms

            def per_host_bound(b: pa.Table) -> pa.Table:
                delays = np.array([json.loads(rj)[0]
                                   for rj in b["rules_json"].to_pylist()],
                                  dtype=np.int64)
                g = np.maximum(1, budget_ms // np.maximum(delays, 1))
                return pa.table({"g": pa.array([int(g.sum())], pa.int64())})

            granted_bound = int(
                robots_dim_ds.map_batches(
                    per_host_bound, batch_format="pyarrow").sum("g") or 0)
            n_ruled_hosts = robots_dim_ds.count()
        else:
            granted_bound = sum(
                max(1, cfg.round_budget_ms // max(rules.delay_ms, 1))
                for rules in robots_map_full.values()
            )
            n_ruled_hosts = len(robots_map_full)
        granted_bound += max(0, cfg.n_hosts - n_ruled_hosts) * max(
            1, cfg.round_budget_ms // DEFAULT_DELAY_MS
        )
        order_push = granted_bound <= cfg.order_push_bound_rows

    streaming = cfg.mode == "streaming"
    if streaming:
        if cfg.fetch_mode not in ("synth", "join"):
            raise NotImplementedError(
                "streaming mode supports fetch_mode='synth' and 'join' "
                "(shard-actor probe); 'hashjoin' repartitions the full "
                "store per round — a barrier the fused DAG removes")
        if not order_push:
            raise NotImplementedError(
                "streaming mode needs order-push (the per-round granted "
                "bound exceeds order_push_bound_rows, or order_push was "
                "forced off): without it the order write would "
                "re-traverse the fused pipeline")

    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    start_round = 0
    if resume:
        for r in range(cfg.max_rounds):
            meta_path = os.path.join(_round_dir(cfg, r), "meta.json")
            if os.path.exists(meta_path) and json.load(open(meta_path)).get("done"):
                start_round = r + 1
            else:
                break
        if start_round > 0:
            seen_dir = os.path.join(_round_dir(cfg, start_round - 1), "seen")
            ray.get(
                [
                    s.restore_from.remote(os.path.join(seen_dir, f"shard-{i:03d}.npz"))
                    for i, s in enumerate(shards)
                ]
            )
    elif os.path.exists(cfg.checkpoint_dir):
        shutil.rmtree(cfg.checkpoint_dir)
        os.makedirs(cfg.checkpoint_dir)

    page_store_ds = None
    if cfg.fetch_mode == "join":
        assert page_store_path, "join fetch mode needs a page_store parquet"

    page_shard_actors = None
    if streaming and cfg.fetch_mode == "join":
        # probe-side join: partition the store once (or find it already
        # partitioned), one shard actor per partition. Actor init reads
        # ONLY its shard=K/ dir (partition-pruned).
        shard_root = _ensure_page_shards(
            page_store_path, cfg.page_shards, cfg.checkpoint_dir)
        page_shard_actors = [
            PageStoreShardActor.remote(os.path.join(shard_root, f"shard={k}"))
            for k in range(cfg.page_shards)
        ]

    metrics_rows: list[dict] = []
    t_start = time.monotonic()

    for r in range(start_round, cfg.max_rounds):
        rdir = _round_dir(cfg, r)
        os.makedirs(rdir, exist_ok=True)
        # every round we enter is NOT committed (meta.json done rounds are
        # skipped via start_round); a crashed attempt may have left
        # uniquely-named part files in the distributed-write dirs, which
        # would be read/counted alongside the new attempt's files — clear
        # them like frag_dir below.
        for stale in ("order", "frontier_out"):
            sdir = os.path.join(rdir, stale)
            if os.path.isdir(sdir):
                shutil.rmtree(sdir)
        if r == 0:
            frontier_tab = pa.table(
                {
                    "url": seeds_table["url"],
                    "depth": pa.array([0] * seeds_table.num_rows, pa.int32()),
                    "priority": seeds_table["priority"],
                    "seed_id": seeds_table["seed_id"],
                    "admitted": pa.array([False] * seeds_table.num_rows, pa.bool_()),
                }
            )
            frontier = rd.from_arrow(frontier_tab).repartition(cfg.num_blocks)
        else:
            prev = os.path.join(_round_dir(cfg, r - 1), "frontier_out")
            if not os.path.exists(prev) or not any(
                f.endswith(".parquet") for f in os.listdir(prev)
            ):
                break
            frontier = rd.read_parquet(prev)
            if frontier.count() == 0:
                break

        # 1. canonicalize + hash (stateless map)
        canon = frontier.map_batches(CanonicalizeAndHash(), batch_format="pyarrow")
        dimension_mode = cfg.robots_mode == "dimension"
        if dimension_mode:
            # rules rows join the stream BEFORE the one politeness
            # shuffle: a null rules_json column marks URL rows, and the
            # union makes every host's rules land in the same partition
            # as its URLs (same host_hash key). Zero extra exchanges.
            canon = canon.map_batches(
                lambda b: b.append_column(
                    "rules_json", pa.nulls(b.num_rows, pa.string())),
                batch_format="pyarrow",
            ).union(robots_dim_ds)

        # 2-4. ONE shuffle per round for the cold path: partition by
        # host_hash % P, then inside each partition (vectorized):
        # round-dedup on url_hash (valid under host partitioning — one
        # URL belongs to exactly one host), URL-seen shard probes
        # (batch RPCs to the cuckoo actors), per-host politeness
        # scheduling. HOT hosts (Zipf head; frontier share > factor ×
        # average partition) are salted: their dedup+probe spreads over
        # hot_salt_factor url-hash partitions, and only the survivors —
        # bounded by dedup + seen filtering — take a second, narrow
        # shuffle to one home task per hot host where the politeness
        # clock decides. Results are identical with salting on or off
        # (every step is a pure per-host/per-url function); salting
        # only changes WHERE the work runs (test-pinned).
        # handles only — tasks ray.get rules from the object store (once
        # per worker, shared memory), instead of pickling the map into
        # every task closure. In "sliced" mode a task resolves its
        # partition's slice from any of its hosts (all hosts in a
        # partition share host_hash % num_blocks by construction).
        robots_handle = robots_ref
        slice_handles = robots_slice_refs
        dim_mode = dimension_mode
        n_blocks_cfg = cfg.num_blocks
        budget, rnd = cfg.round_budget_ms, r
        push_order = order_push
        n_parts = cfg.num_blocks
        shard_handles = shards
        n_shards = cfg.n_seen_shards

        hot_hosts: dict[str, int] = {}
        if cfg.salt_hot_hosts:
            # Hot-host DETECTION is a placement heuristic only (salting
            # is result-invariant, test-pinned), so it counts hosts on
            # the RAW frontier — no canon.materialize() copy of the
            # whole frontier in the object store, just a cheap counting
            # pass whose shuffle payload is one row per (host, batch).
            # Host extraction is a vectorized Arrow regex (the handful
            # of URLs where this differs from full canonicalization only
            # shifts the heuristic, never the results).
            def host_partial(batch: pa.Table) -> pa.Table:
                # deterministic 1-in-8 stride sample: the detection is a
                # placement heuristic (salting is result-invariant), and
                # a uniform sample preserves the Zipf head while cutting
                # the per-round extra pass's regex work 8×
                if batch.num_rows > 64:
                    batch = batch.take(np.arange(0, batch.num_rows, 8))
                ex = pc.extract_regex(batch["url"], pattern=r"^[A-Za-z+.\-]+://(?P<host>[^/?#]+)")
                hosts = pc.utf8_lower(pc.struct_field(ex, "host"))
                vc = hosts.drop_null().value_counts()
                return pa.table({"host": vc.field("values"), "n": vc.field("counts")})

            host_counts = (
                frontier.map_batches(host_partial, batch_format="pyarrow")
                .to_pandas()  # one row per (host, batch) — tiny
                .groupby("host")["n"]
                .sum()
            )
            threshold = cfg.hot_host_factor * host_counts.sum() / n_parts
            hot_hosts = {
                h: i for i, h in enumerate(sorted(host_counts[host_counts > threshold].index))
            }

        salt = cfg.hot_salt_factor

        def add_part(batch: pa.Table) -> pa.Table:
            part = (
                batch["host_hash"].to_numpy(zero_copy_only=False) % np.uint64(n_parts)
            ).astype(np.int64)
            if hot_hosts:
                # vectorized hot-host remap (hot hosts are the HEAVY
                # rows, so a Python per-row loop here scales with the
                # Zipf head, not the tail)
                import pandas as _pd

                hot_idx = _pd.Series(
                    batch["host"].to_pandas()).map(hot_hosts).to_numpy()
                m = ~np.isnan(hot_idx)
                if m.any():
                    uh = batch["url_hash"].to_numpy(zero_copy_only=False)
                    part[m] = (n_parts + hot_idx[m].astype(np.int64) * salt
                               + (uh[m] % np.uint64(salt)).astype(np.int64))
            return batch.append_column("part", pa.array(part, pa.int64()))

        def dedup_probe(df: pd.DataFrame) -> pd.DataFrame:
            df = round_dedup_partition(df)
            tab = pa.Table.from_pandas(df, preserve_index=False)
            tab = seen_probe(tab, shard_handles, n_shards)
            return tab.to_pandas()

        _host_rules_cls = HostRules  # captured: no runtime package import in workers

        def rules_from_rows(rules_df: pd.DataFrame) -> dict:
            # (host, rules_json) rows → {host: HostRules}; the dimension
            # mode's partition-local counterpart of build_robots_map
            out = {}
            for h, rj in zip(rules_df["host"], rules_df["rules_json"]):
                delay, prefixes = json.loads(rj)
                out[h] = _host_rules_cls(int(delay), tuple(prefixes))
            return out

        def schedule_hosts(df: pd.DataFrame, robots_map: dict | None = None) -> pd.DataFrame:
            if dim_mode and robots_map is None and len(df):
                # hot-host home task: forwarded rules rows ride along —
                # split them out and build the local map from them
                rm = df["rules_json"].notna()
                robots_map = rules_from_rows(df[rm])
                df = df[~rm]
            if df.empty:
                out = df.copy()
                out["disposition"] = pd.Series([], dtype=object)
                out["fetch_ts_ms"] = pd.Series([], dtype="int64")
                return out
            if robots_map is None:
                if slice_handles is not None:
                    idx = int(hash64(df["host"].iloc[0])) % n_blocks_cfg
                    robots_map = ray.get(slice_handles[idx])
                else:
                    robots_map = ray.get(robots_handle)  # object-store read, cached per worker
            groups = [
                schedule_host_batch(g, robots_map, budget, rnd)
                for _, g in df.groupby("host", sort=True)
            ]
            out = pd.concat(groups, ignore_index=True)
            # fold the disposition histogram (and, in push mode, this
            # task's granted order rows) into this pass — tagged by min
            # url_hash (unique per task since round-dedup leaves one
            # row per url_hash, so disjoint tasks have distinct mins;
            # retry overwrites its own tag). No separate counting or
            # order traversal of `scheduled` is needed.
            if len(out):
                vc = out["disposition"].value_counts()
                order_tab = None
                if push_order:
                    g = out.loc[
                        out["disposition"] == "granted",
                        ["url", "host", "url_hash", "priority", "fetch_ts_ms"],
                    ]
                    if len(g):
                        order_tab = pa.Table.from_pandas(g, preserve_index=False)
                _stats_call(stats_actor.set_sched.remote(
                    rnd, int(out["url_hash"].min()),
                    {str(k): int(v) for k, v in vc.items()}, order_tab))
            return out

        def process_partition(df: pd.DataFrame) -> pd.DataFrame:
            is_hot = bool(df["part"].iloc[0] >= n_parts) if len(df) else False
            df = df.drop(columns=["part"])
            local_rules = None
            fwd = None
            if dim_mode:
                # split rules rows before dedup/probe (they are not
                # URLs); rules of HOT hosts forward to the home task as
                # hot_pending rows, the rest resolve right here
                rm = df["rules_json"].notna()
                rules_df = df[rm]
                df = df[~rm]
                if hot_hosts and len(rules_df):
                    is_fwd = rules_df["host"].isin(hot_hosts).to_numpy()
                    fwd = rules_df[is_fwd]
                    rules_df = rules_df[~is_fwd]
                local_rules = rules_from_rows(rules_df)
            df = dedup_probe(df)
            if is_hot:
                # politeness decided at the host's home task (2nd pass)
                df["disposition"] = "hot_pending"
                df["fetch_ts_ms"] = np.int64(-1)
                out = df
            else:
                out = schedule_hosts(df, local_rules)
            if fwd is not None and len(fwd):
                fwd = fwd.copy()
                fwd["disposition"] = "hot_pending"
                fwd["fetch_ts_ms"] = np.int64(-1)
                out = pd.concat([out, fwd], ignore_index=True)
            return out

        parted = canon.map_batches(add_part, batch_format="pyarrow")
        scheduled = parted.groupby("part").map_groups(
            process_partition, batch_format="pandas"
        )

        if streaming:
            # ===== fused streaming window: ONE Dataset execution =====
            # schedule → route (granted ⇒ fetch+sink+explode inline,
            # deferred ⇒ next-frontier rows) → frontier write. Granted
            # batches reach the fetch stage the moment their politeness
            # partition finishes — no materialize barrier, no second
            # traversal; order rows already ride the set_sched push.
            t_stage = time.monotonic()
            frontier_dir = os.path.join(rdir, "frontier_out")
            os.makedirs(frontier_dir, exist_ok=True)
            frag_dir = None
            images_root = os.path.join(cfg.checkpoint_dir, "images")
            frag_name = f"round-{r:03d}"
            if cfg.write_images:
                frag_dir = os.path.join(images_root, frag_name)
                if os.path.exists(frag_dir):
                    shutil.rmtree(frag_dir)  # crashed-attempt leftovers
                os.makedirs(frag_dir)

            fk = dict(
                fetch_mode="synth" if page_shard_actors is None
                else "pre_fetched",
                n_pages=cfg.n_pages,
                n_hosts=cfg.n_hosts, seed=cfg.seed,
                decay=cfg.priority_decay, max_depth=cfg.max_depth,
                frag_dir=frag_dir, image_px=cfg.image_px,
                round_index=r, stats=stats_actor,
            )
            probe_actors = page_shard_actors
            probe_shards = cfg.page_shards

            def route_fused(batch: pa.Table) -> pa.Table:
                disp = batch["disposition"]
                granted = batch.filter(pc.equal(disp, "granted"))
                deferred = batch.filter(pc.equal(disp, "deferred"))
                out = []
                if granted.num_rows:
                    if probe_actors is not None:
                        # join fetch without the barrier: probe the
                        # store shards for THIS batch's hashes as it
                        # arrives — no granted-set broadcast needed
                        granted = probe_fetch_attach(
                            granted, probe_actors, probe_shards)
                    out.append(fetch_sink_explode(granted, **fk))
                if deferred.num_rows:
                    d = deferred.select(["url", "depth", "priority",
                                         "seed_id"])
                    d = d.append_column("admitted", pa.array(
                        np.ones(d.num_rows, dtype=bool)))
                    out.append(d.cast(FRONTIER_SCHEMA))
                if not out:
                    return pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
                return pa.concat_tables(
                    [t.cast(FRONTIER_SCHEMA) for t in out])

            routed_src = scheduled
            if hot_hosts:
                # hot-host salting INSIDE the fused DAG: the salted
                # partitions above decided dedup+probe only and emitted
                # hot_pending survivors; a SECOND host-keyed exchange
                # co-locates each hot host's survivors (plus, in
                # dimension mode, its forwarded rules rows) at one home
                # task where the politeness clock decides, while the
                # already-decided rows ride the same exchange unchanged
                # (their key stays host-derived so it balances). This is
                # the one part of the window that cannot pipeline —
                # politeness per hot host needs ALL its survivors — so
                # the exchange is a barrier for exactly those rows;
                # results are salting-invariant (test-pinned, same
                # argument as the round model).
                hot_map = hot_hosts

                def add_part2(df: pd.DataFrame) -> pd.DataFrame:
                    part2 = (df["host_hash"].to_numpy().astype(np.uint64)
                             % np.uint64(n_parts)).astype(np.int64)
                    hot_m = (df["disposition"] == "hot_pending").to_numpy()
                    if hot_m.any():
                        idx = df.loc[hot_m, "host"].map(hot_map).to_numpy(
                            dtype=np.float64)
                        part2[hot_m] = n_parts + idx.astype(np.int64)
                    df = df.copy()
                    df["part2"] = part2
                    return df

                def second_pass(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.drop(columns=["part2"])
                    hot_m = df["disposition"] == "hot_pending"
                    if hot_m.any():
                        # a hot home task (part2 unique per hot host):
                        # every row here is this host's pending work
                        assert bool(hot_m.all())
                        df = schedule_hosts(
                            df.drop(columns=["disposition", "fetch_ts_ms"]))
                    # deterministic column order: hot and cold groups
                    # must emit schema-identical blocks
                    return df[sorted(df.columns)]

                routed_src = (scheduled
                              .map_batches(add_part2, batch_format="pandas")
                              .groupby("part2")
                              .map_groups(second_pass, batch_format="pandas"))

            # batch_size=None: whole-block batches (one per politeness
            # partition) — the default 1024-row batches would put ~2k
            # blocking stats-actor RPCs per round on the fetch path
            (routed_src.map_batches(route_fused, batch_format="pyarrow",
                                    batch_size=None)
             .write_parquet(frontier_dir))
            stage_s = {"fused_pipeline": round(time.monotonic() - t_stage, 2)}

            counts = ray.get(stats_actor.disp_counts.remote(r))
            n_frontier = int(sum(counts.values()))
            n_deferred = int(counts.get("deferred", 0))
            denied_n = int(counts.get("robots_denied", 0))
            n_granted = int(counts.get("granted", 0))
            if n_frontier == 0:
                break

            # order (push chunks were delivered during the execution)
            order_dir = os.path.join(rdir, "order")
            os.makedirs(order_dir, exist_ok=True)
            fp = None
            if n_granted:
                chunks = ray.get(stats_actor.order_chunks.remote(r))
                stats_actor.drop_order.remote(r)
                order_tab = pa.concat_tables(chunks, promote_options="default")
                assert order_tab.num_rows == n_granted, (
                    f"order-push rows {order_tab.num_rows} != granted "
                    f"{n_granted}")
                order_tab = order_tab.append_column(
                    "round",
                    pa.array(np.full(order_tab.num_rows, r, dtype=np.int32)))
                pq.write_table(
                    order_tab.sort_by(
                        [("fetch_ts_ms", "ascending"), ("host", "ascending"),
                         ("url_hash", "ascending")]),
                    os.path.join(order_dir, "part-all.parquet"))
                fp = hashlib.md5(np.sort(
                    order_tab["url_hash"].to_numpy(zero_copy_only=False)
                    .astype(np.uint64)).tobytes()).hexdigest()

            n_frontier_out = _parquet_rows(frontier_dir) if os.path.isdir(
                frontier_dir) else 0
            n_outlinks = n_frontier_out - n_deferred
            n_fetched_ok = ray.get(stats_actor.get.remote(r, "fetched_ok"))
            n_invalid_images = ray.get(
                stats_actor.get.remote(r, "invalid_images"))
            first_fetch = ray.get(
                stats_actor.first_time.remote(r, "fetched_ok"))
            if first_fetch is not None:
                stage_s["first_fetch_s"] = round(first_fetch - t_stage, 2)
            if frag_dir is not None and n_granted:
                n_imgs = _parquet_rows(frag_dir)
                lancelike.commit_dir_fragment(
                    images_root, frag_name, frag_name, n_imgs, fp,
                    extra_lineage={"round": r, "rows_in": n_granted})

            seen_dir = os.path.join(rdir, "seen")
            os.makedirs(seen_dir, exist_ok=True)
            ray.get([
                s.checkpoint_to.remote(
                    os.path.join(seen_dir, f"shard-{i:03d}.npz"))
                for i, s in enumerate(shards)
            ])
            m = {
                "round": r,
                "n_frontier": n_frontier,
                "n_granted": n_granted,
                "n_deferred": n_deferred,
                "n_robots_denied": denied_n,
                "n_fetched_ok": n_fetched_ok,
                "n_invalid_images": n_invalid_images,
                "n_outlinks": n_outlinks,
                "wall_s": round(time.monotonic() - t_start, 3),
                "stage_s": stage_s,
            }
            metrics_rows.append(m)
            with open(os.path.join(rdir, "meta.json"), "w") as f:
                json.dump({**m, "done": True, "config": cfg.to_json()}, f,
                          indent=1)
            if n_frontier_out == 0:
                break
            continue
            # ===== end streaming window =====

        if hot_hosts:
            scheduled = scheduled.materialize()
            cold = scheduled.filter(expr="disposition != 'hot_pending'")
            hot_sched = (
                scheduled.filter(expr="disposition == 'hot_pending'")
                .drop_columns(["disposition", "fetch_ts_ms"])
                .groupby("host")
                .map_groups(schedule_hosts, batch_format="pandas")
            )
            scheduled = cold.union(hot_sched)
        # materialize the scheduled dataset in the OBJECT STORE (it is
        # the round's ground truth for order, deferred rows and
        # metrics) — never concatenate the full frontier on the driver:
        # only the politeness-capped granted set (≤ hosts × budget
        # rows) is small enough to pull down.
        t_stage = t_round_pipeline = time.monotonic()
        scheduled = scheduled.materialize()
        stage_s = {"schedule_pipeline": round(time.monotonic() - t_stage, 2)}
        t_stage = time.monotonic()

        # disposition histogram was folded into the schedule tasks
        counts = ray.get(stats_actor.disp_counts.remote(r))
        n_frontier = int(sum(counts.values()))
        n_deferred = int(counts.get("deferred", 0))
        denied_n = int(counts.get("robots_denied", 0))
        if n_frontier == 0:
            break

        n_granted = int(counts.get("granted", 0))
        granted_ds = scheduled.filter(expr="disposition == 'granted'")

        # crawl order for this round. Size-adaptive: below the
        # threshold one driver pass over the 5 ORDER COLUMNS sorts and
        # writes a single file (and yields the url_hash broadcast array
        # for free — one traversal instead of three Dataset
        # executions); above it, a distributed sort + directory write
        # streams through the workers and the granted rows never touch
        # the driver. read_crawl_order reassembles either layout.
        order_dir = os.path.join(rdir, "order")
        os.makedirs(order_dir, exist_ok=True)
        granted_hashes = None
        if n_granted and order_push:
            # push mode: the schedule tasks already delivered their
            # granted rows with the stats RPC — assemble, sort, write.
            # No second Dataset execution touches `scheduled`.
            chunks = ray.get(stats_actor.order_chunks.remote(r))
            stats_actor.drop_order.remote(r)
            order_tab = pa.concat_tables(chunks, promote_options="default")
            assert order_tab.num_rows == n_granted, (
                f"order-push rows {order_tab.num_rows} != granted {n_granted}"
            )
            order_tab = order_tab.append_column(
                "round", pa.array(np.full(order_tab.num_rows, r, dtype=np.int32))
            )
            pq.write_table(
                order_tab.sort_by(
                    [("fetch_ts_ms", "ascending"), ("host", "ascending"),
                     ("url_hash", "ascending")]
                ),
                os.path.join(order_dir, "part-all.parquet"),
            )
            granted_hashes = np.sort(
                order_tab["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        elif n_granted and n_granted <= cfg.driver_order_rows:
            order_tab = pa.concat_tables(
                list(
                    granted_ds.select_columns(
                        ["url", "host", "url_hash", "priority", "fetch_ts_ms"]
                    ).iter_batches(batch_size=65536, batch_format="pyarrow")
                ),
                promote_options="default",
            )
            order_tab = order_tab.append_column(
                "round", pa.array(np.full(order_tab.num_rows, r, dtype=np.int32))
            )
            pq.write_table(
                order_tab.sort_by(
                    [("fetch_ts_ms", "ascending"), ("host", "ascending"),
                     ("url_hash", "ascending")]
                ),
                os.path.join(order_dir, "part-all.parquet"),
            )
            granted_hashes = np.sort(
                order_tab["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
            )
        elif n_granted:

            def add_round(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "round", pa.array(np.full(batch.num_rows, r, dtype=np.int32))
                )

            (
                granted_ds.select_columns(
                    ["url", "host", "url_hash", "priority", "fetch_ts_ms"]
                )
                .map_batches(add_round, batch_format="pyarrow")
                .sort(["fetch_ts_ms", "host", "url_hash"])
                .write_parquet(order_dir)
            )
            # the ONLY driver pull in this branch is the url_hash
            # column (8 B/row): broadcast payload for the semi-join
            # fetch + image fragment fingerprint
            if cfg.write_images or cfg.fetch_mode == "join":
                granted_hashes = np.sort(
                    granted_ds.select_columns(["url_hash"])
                    .to_pandas()["url_hash"]
                    .to_numpy()
                    .astype(np.uint64)
                )

        stage_s["granted_order"] = round(time.monotonic() - t_stage, 2)
        t_stage = time.monotonic()

        # 5-6. fetch → 200-filter → image encode+sink → outlink explode,
        # all in ONE streaming pass over the granted rows (the image
        # parquet files are written inside the map tasks; the manifest
        # commit below is the atomic checkpoint). Join-mode fetch runs
        # the hash join first, then the same sink+explode stage.
        n_fetched_ok = n_outlinks = 0
        children_ds = None
        frag_dir = None
        fp = None
        if n_granted:
            # repartition is deliberate: the granted filter leaves many
            # small sparse blocks (one per schedule partition), and
            # consolidating to num_blocks even blocks is measurably
            # faster for the fetch/sink stage than inheriting them
            # (A/B: 54s vs 68s at sf0.1)
            granted = granted_ds.repartition(cfg.num_blocks)
            if cfg.write_images:
                images_root = os.path.join(cfg.checkpoint_dir, "images")
                frag_name = f"round-{r:03d}"
                # order-insensitive fingerprint of the granted url_hash
                # set (already sorted)
                fp = hashlib.md5(granted_hashes.tobytes()).hexdigest()
                already = lancelike.read_manifest(images_root)["fragments"].get(frag_name)
                if not (already and already["input_fingerprint"] == fp):
                    frag_dir = os.path.join(images_root, frag_name)
                    # an UNCOMMITTED fragment dir may hold stale part
                    # files from a crashed attempt; block/batch order is
                    # not deterministic across executions, so new part
                    # names can differ and read_dataset would pick up
                    # both. Clear before re-running the round.
                    if os.path.exists(frag_dir):
                        shutil.rmtree(frag_dir)
                    os.makedirs(frag_dir)
            upstream = granted
            mode = cfg.fetch_mode
            if cfg.fetch_mode in ("join", "hashjoin"):
                if page_store_ds is None:
                    page_store_ds = rd.read_parquet(
                        page_store_path,
                        columns=["url_hash", "status", "outlinks", "fetch_ms"],
                    ).map_batches(pack_outlinks, batch_format="pyarrow")
                    # size gate: only a SMALL store gets pinned in the
                    # object store for round reuse; a big one stays lazy
                    # and every round re-scans parquet through the
                    # streaming semi-filter (footer-metadata count only)
                    if _parquet_rows(page_store_path) <= cfg.page_store_cache_rows:
                        page_store_ds = page_store_ds.materialize()
                    # else: page_store_ds stays LAZY — each round's
                    # semi_filter consumption re-executes the scan
                if cfg.fetch_mode == "hashjoin":
                    # full hash join: repartitions BOTH sides every round —
                    # kept for comparison; 5× slower than the broadcast
                    # semi-join at bench scale because the big side
                    # reshuffles per round.
                    upstream = granted.drop_columns(["disposition"]).join(
                        page_store_ds,
                        join_type="inner",
                        num_partitions=cfg.num_blocks,
                        on=("url_hash",),
                    )
                else:
                    # broadcast semi-join: the granted side is ALWAYS small
                    # (politeness budget bounds it), so broadcast its hash
                    # set, membership-filter the page store with a scan
                    # (no shuffle), and map the page attributes onto the
                    # granted rows from the (small) filtered result.
                    href = ray.put(granted_hashes)

                    def semi_filter(batch: pa.Table) -> pa.Table:
                        wanted = ray.get(href)
                        uh = batch["url_hash"].to_numpy(zero_copy_only=False)
                        pos = np.searchsorted(wanted, uh)
                        pos[pos >= len(wanted)] = len(wanted) - 1
                        mask = wanted[pos] == uh
                        return batch.filter(pa.array(mask))

                    # the filtered hits stay a DATASET (page content —
                    # outlinks ≈ hundreds of bytes/row — never touches
                    # the driver); both join sides are ≤ the politeness
                    # budget, so the join shuffle is granted-sized, not
                    # page-store-sized.
                    hits_ds = page_store_ds.map_batches(
                        semi_filter, batch_format="pyarrow"
                    )
                    upstream = granted.drop_columns(["disposition"]).join(
                        hits_ds,
                        join_type="inner",
                        num_partitions=cfg.num_blocks,
                        on=("url_hash",),
                    )
                mode = "pre_fetched"
            children_ds = upstream.map_batches(
                fetch_sink_explode,
                fn_kwargs=dict(
                    fetch_mode=mode,
                    n_pages=cfg.n_pages,
                    n_hosts=cfg.n_hosts,
                    seed=cfg.seed,
                    decay=cfg.priority_decay,
                    max_depth=cfg.max_depth,
                    frag_dir=frag_dir,
                    image_px=cfg.image_px,
                    round_index=r,
                    stats=stats_actor,
                ),
                batch_format="pyarrow",
            )

        # 7. next frontier = deferred (stay admitted) + children —
        # written as a parquet DIRECTORY by the workers (distributed),
        # read back by the next round. No driver concat of the big side.
        def to_frontier(batch: pa.Table) -> pa.Table:
            batch = batch.select(["url", "depth", "priority", "seed_id"])
            batch = batch.append_column(
                "admitted", pa.array(np.ones(batch.num_rows, dtype=bool))
            )
            return batch.cast(FRONTIER_SCHEMA)

        deferred_ds = (
            scheduled.filter(expr="disposition == 'deferred'")
            .map_batches(to_frontier, batch_format="pyarrow")
            if n_deferred
            else None
        )
        frontier_dir = os.path.join(rdir, "frontier_out")
        parts = [d for d in (deferred_ds, children_ds) if d is not None]
        n_frontier_out = 0
        if parts:
            out_ds = parts[0] if len(parts) == 1 else parts[0].union(parts[1])
            out_ds = out_ds.map_batches(
                lambda b: b.cast(FRONTIER_SCHEMA), batch_format="pyarrow"
            )
            os.makedirs(frontier_dir, exist_ok=True)
            out_ds.write_parquet(frontier_dir)
            # row count from parquet footers (local metadata reads, no
            # Ray job)
            n_frontier_out = sum(
                pq.read_metadata(os.path.join(frontier_dir, f)).num_rows
                for f in os.listdir(frontier_dir)
                if f.endswith(".parquet")
            )
        n_outlinks = n_frontier_out - n_deferred
        n_fetched_ok = ray.get(stats_actor.get.remote(r, "fetched_ok"))
        n_invalid_images = ray.get(stats_actor.get.remote(r, "invalid_images"))
        first_fetch = ray.get(stats_actor.first_time.remote(r, "fetched_ok"))
        if first_fetch is not None:
            # latency from the schedule pipeline's start to the FIRST
            # fetch completion — the round model pays the full
            # materialize barrier here; the streaming mode's fused DAG
            # starts fetching as soon as one partition is scheduled
            stage_s["first_fetch_s"] = round(first_fetch - t_round_pipeline, 2)
        if frag_dir is not None:
            # row count derived from the WRITTEN files (parquet footer
            # metadata only), not task-side counters — immune to retries
            n_imgs = sum(
                pq.read_metadata(os.path.join(frag_dir, f)).num_rows
                for f in os.listdir(frag_dir)
                if f.endswith(".parquet")
            )
            lancelike.commit_dir_fragment(
                os.path.join(cfg.checkpoint_dir, "images"),
                f"round-{r:03d}", f"round-{r:03d}", n_imgs, fp,
                extra_lineage={"round": r, "rows_in": n_granted},
            )
        stage_s["frontier_out"] = round(time.monotonic() - t_stage, 2)

        # 8. seen-shard checkpoint + lineage: each shard writes its own
        # file in parallel (per-partition checkpoint; driver only
        # barriers on completion)
        seen_dir = os.path.join(rdir, "seen")
        os.makedirs(seen_dir, exist_ok=True)
        ray.get(
            [
                s.checkpoint_to.remote(os.path.join(seen_dir, f"shard-{i:03d}.npz"))
                for i, s in enumerate(shards)
            ]
        )
        m = {
            "round": r,
            "n_frontier": n_frontier,
            "n_granted": n_granted,
            "n_deferred": n_deferred,
            "n_robots_denied": denied_n,
            "n_fetched_ok": n_fetched_ok,
            "n_invalid_images": n_invalid_images,
            "n_outlinks": n_outlinks,
            "wall_s": round(time.monotonic() - t_start, 3),
            "stage_s": stage_s,
        }
        metrics_rows.append(m)
        with open(os.path.join(rdir, "meta.json"), "w") as f:
            json.dump({**m, "done": True, "config": cfg.to_json()}, f, indent=1)

        if n_frontier_out == 0:
            break

    # summary. Per-shard counts + digests are the default cross-run
    # comparison surface; the concatenated seen array is OPT-IN
    # (collect_seen=True, tests/oracle only) — at 10^10 keys pulling
    # every shard's store to the driver would be an ~80 GB allocation.
    shard_stats = ray.get([s.stats.remote() for s in shards])
    shard_digests = ray.get([s.seen_digest.remote() for s in shards])
    seen_digest = hashlib.md5("".join(shard_digests).encode()).hexdigest()
    n_seen = sum(st["n"] for st in shard_stats)
    seen = None
    if collect_seen:
        seen_arrays = ray.get([s.seen_array.remote() for s in shards])
        seen = (np.sort(np.concatenate(seen_arrays)) if seen_arrays
                else np.array([], dtype=np.uint64))
    for s in shards:
        ray.kill(s)
    ray.kill(stats_actor)
    total_granted = sum(m["n_granted"] for m in metrics_rows)
    wall = time.monotonic() - t_start
    result = {
        "checkpoint_dir": cfg.checkpoint_dir,
        "rounds": len(metrics_rows),
        "metrics": metrics_rows,
        "shard_stats": shard_stats,
        "shard_digests": shard_digests,
        "seen_digest": seen_digest,
        "n_seen": int(n_seen),
        "seen_hashes": seen,
        "total_granted": total_granted,
        "urls_per_sec": round(total_granted / wall, 1) if wall > 0 else 0.0,
        "wall_s": round(wall, 3),
    }
    with open(os.path.join(cfg.checkpoint_dir, "summary.json"), "w") as f:
        json.dump({k: v for k, v in result.items() if k != "seen_hashes"}, f, indent=1)
    return result


def read_crawl_order(checkpoint_dir: str) -> pa.Table:
    """Global crawl order: per-round order DIRECTORIES (written
    distributed by the sort stage) re-assembled in round order; the
    within-round order is recomputed from the sort columns
    (fetch_ts, host, url_hash) — content, not file layout, defines it.
    Adds a global rank column."""
    tables = []
    r = 0
    while True:
        odir = os.path.join(checkpoint_dir, f"round-{r:03d}", "order")
        legacy = os.path.join(checkpoint_dir, f"round-{r:03d}", "order.parquet")
        if os.path.isdir(odir):
            files = sorted(
                os.path.join(odir, f) for f in os.listdir(odir) if f.endswith(".parquet")
            )
            if files:
                tab = pa.concat_tables(
                    [pq.read_table(f) for f in files], promote_options="default"
                )
                tables.append(
                    tab.sort_by(
                        [("fetch_ts_ms", "ascending"), ("host", "ascending"),
                         ("url_hash", "ascending")]
                    )
                )
        elif os.path.exists(legacy):
            tables.append(pq.read_table(legacy))
        else:
            break
        r += 1
    if not tables:
        return pa.table({"rank": pa.array([], pa.int64()), "url": pa.array([], pa.string())})
    tab = pa.concat_tables(tables, promote_options="default")
    return tab.append_column("rank", pa.array(np.arange(tab.num_rows, dtype=np.int64)))
