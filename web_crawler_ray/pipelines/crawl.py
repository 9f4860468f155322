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

import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..hashing import fingerprint_bytes
from ..io import lancelike
from ..state.cuckoo import SeenShardState
from ..state.politeness import build_robots_map, schedule_host_batch
from ..synth import gen_robots, image_for_page, page_meta
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
    seen_shard_capacity: int = 1 << 16
    priority_decay: float = 0.85
    fetch_mode: str = "join"  # "join" | "synth"
    checkpoint_dir: str = "/tmp/crawl_ckpt"
    write_images: bool = True
    num_blocks: int = 16

    def to_json(self) -> dict:
        return {k: getattr(self, k) for k in self.__dataclass_fields__}


@ray.remote
class SeenShardActor:
    """One URL-seen shard (SURVEY §2.3 T7). Batch RPCs only."""

    def __init__(self, shard_id: int, capacity: int):
        self.state = SeenShardState(shard_id, capacity)

    def probe_and_add(self, hashes: np.ndarray) -> np.ndarray:
        return self.state.probe_and_add(hashes)

    def snapshot(self) -> dict:
        return self.state.snapshot()

    def restore(self, snap: dict) -> None:
        self.state = SeenShardState.restore(snap)

    def seen_array(self) -> np.ndarray:
        return self.state.seen_array()

    def stats(self) -> dict:
        return {"n": len(self.state.exact), "fp_hits": self.state.fp_hits,
                "cuckoo_count": self.state.cuckoo.count,
                "bloom_spilled": self.state.bloom is not None}


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


def pack_outlinks(batch: pa.Table) -> pa.Table:
    """list<string> outlinks → newline-joined string (Ray's hash join
    rejects list-typed non-key columns; URLs cannot contain newlines)."""
    packed = ["\n".join(links) for links in batch["outlinks"].to_pylist()]
    idx = batch.schema.get_field_index("outlinks")
    return batch.set_column(idx, "outlinks", pa.array(packed, pa.string()))


def explode_outlinks(batch: pa.Table, decay: float, max_depth: int) -> pa.Table:
    """Fetched pages → child frontier rows (priority decays, depth+1).
    Accepts list<string> or packed-string outlinks."""
    raw = batch["outlinks"].to_pylist()
    urls, depths, prios, seeds = [], [], [], []
    for links, depth, prio, seed_id in zip(
        raw,
        batch["depth"].to_pylist(),
        batch["priority"].to_pylist(),
        batch["seed_id"].to_pylist(),
    ):
        if isinstance(links, str):
            links = links.split("\n") if links else []
        if depth + 1 > max_depth or not links:
            continue
        for link in links:
            urls.append(link)
            depths.append(depth + 1)
            prios.append(prio * decay)
            seeds.append(seed_id)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "depth": pa.array(depths, pa.int32()),
            "priority": pa.array(prios, pa.float32()),
            "seed_id": pa.array(seeds, pa.int64()),
            "admitted": pa.array([False] * len(urls), pa.bool_()),
        }
    )


class ImageRows:
    """Fetched page → input_hint image+caption row (deterministic payload
    per url_hash; SURVEY §2.1 K4). Small batches: binary rows are wide."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, datas, ws, hs, fmts, caps, phs = [], [], [], [], [], [], []
        for uh in batch["url_hash"].to_pylist():
            data, fmt, caption, ph = image_for_page(int(uh))
            ids.append(f"img-{int(uh):016x}")
            datas.append(data)
            ws.append(32)
            hs.append(32)
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


def _fingerprint_table(table: pa.Table, cols: list[str]) -> str:
    """Order-insensitive fingerprint of selected columns (sorted rows)."""
    sub = table.select(cols)
    df = sub.to_pandas().sort_values(cols, kind="mergesort")
    return fingerprint_bytes(df.to_csv(index=False).encode())


def run_crawl(cfg: CrawlConfig, seeds_table: pa.Table, page_store_path: str | None = None,
              robots_table: pa.Table | None = None, resume: bool = False) -> dict:
    """Run (or resume) the crawl. Returns summary dict with paths.

    ``seeds_table``: FIXTURES §1 table. ``page_store_path``: parquet of
    gen_page_store (required for fetch_mode="join").
    """
    if robots_table is None:
        robots_table = gen_robots(cfg.n_hosts, cfg.seed)
    robots_ref = ray.put(build_robots_map(robots_table))

    shards = [
        SeenShardActor.remote(i, cfg.seen_shard_capacity) for i in range(cfg.n_seen_shards)
    ]

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
            snaps = np.load(
                os.path.join(_round_dir(cfg, start_round - 1), "seen_shards.npz"),
                allow_pickle=True,
            )["snaps"]
            ray.get([s.restore.remote(snap) for s, snap in zip(shards, snaps)])
    elif os.path.exists(cfg.checkpoint_dir):
        shutil.rmtree(cfg.checkpoint_dir)
        os.makedirs(cfg.checkpoint_dir)

    page_store_ds = None
    if cfg.fetch_mode == "join":
        assert page_store_path, "join fetch mode needs a page_store parquet"

    metrics_rows: list[dict] = []
    t_start = time.monotonic()

    for r in range(start_round, cfg.max_rounds):
        rdir = _round_dir(cfg, r)
        os.makedirs(rdir, exist_ok=True)
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
            prev = os.path.join(_round_dir(cfg, r - 1), "frontier_out.parquet")
            if not os.path.exists(prev):
                break
            frontier = rd.read_parquet(prev)
            if frontier.count() == 0:
                break

        # 1. canonicalize + hash (stateless map)
        canon = frontier.map_batches(CanonicalizeAndHash(), batch_format="pyarrow")
        # 2. round-dedup on url_hash (shuffle #1 — fixed-width keys only);
        # partition key is url_hash % P so the dedup is vectorized per
        # partition instead of one task per distinct URL
        n_dedup_parts = cfg.num_blocks

        def add_pk(batch: pa.Table) -> pa.Table:
            pk = (batch["url_hash"].to_numpy(zero_copy_only=False) % np.uint64(n_dedup_parts)).astype(np.int64)
            return batch.append_column("pk", pa.array(pk, pa.int64()))

        deduped = (
            canon.map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk")
            .map_groups(round_dedup_partition, batch_format="pandas")
            .drop_columns(["pk"])
        )
        # 3. URL-seen probe/insert (sharded exact-cuckoo actors; probe
        # runs as stateless tasks carrying the actor handles)
        survivors = deduped.map_batches(
            seen_probe,
            fn_kwargs={"shards": shards, "n_shards": cfg.n_seen_shards},
            batch_format="pyarrow",
        )
        # 4. politeness + robots gate (shuffle #2: groupby host)
        robots_map_local = ray.get(robots_ref)
        budget, rnd = cfg.round_budget_ms, r
        scheduled = survivors.groupby("host").map_groups(
            lambda g: schedule_host_batch(g, robots_map_local, budget, rnd),
            batch_format="pandas",
        )
        # materialize the scheduled table once per round: it is the
        # round's ground truth for order, deferred rows and metrics.
        sched_batches = list(scheduled.iter_batches(batch_size=65536, batch_format="pyarrow"))
        if not sched_batches:
            break
        scheduled_tab = pa.concat_tables(sched_batches, promote_options="default")

        granted_tab = scheduled_tab.filter(pc.equal(scheduled_tab["disposition"], "granted"))
        deferred_tab = scheduled_tab.filter(pc.equal(scheduled_tab["disposition"], "deferred"))
        denied_n = scheduled_tab.num_rows - granted_tab.num_rows - deferred_tab.num_rows

        # crawl order for this round (pure sort on data columns)
        order_tab = granted_tab.select(["url", "host", "url_hash", "priority", "fetch_ts_ms"])
        order_tab = order_tab.append_column("round", pa.array([r] * order_tab.num_rows, pa.int32()))
        order_sorted = order_tab.sort_by(
            [("fetch_ts_ms", "ascending"), ("host", "ascending"), ("url_hash", "ascending")]
        )
        pq.write_table(order_sorted, os.path.join(rdir, "order.parquet"))

        # 5. fetch
        granted = (
            rd.from_arrow(granted_tab).repartition(cfg.num_blocks)
            if granted_tab.num_rows
            else None
        )
        n_fetched_ok = n_outlinks = 0
        if granted is not None:
            if cfg.fetch_mode == "synth":
                fetched = granted.map_batches(
                    synthetic_fetch,
                    fn_kwargs={"n_pages": cfg.n_pages, "n_hosts": cfg.n_hosts, "seed": cfg.seed},
                    batch_format="pyarrow",
                )
            else:
                if page_store_ds is None:
                    page_store_ds = (
                        rd.read_parquet(
                            page_store_path,
                            columns=["url_hash", "status", "outlinks", "fetch_ms"],
                        )
                        .map_batches(pack_outlinks, batch_format="pyarrow")
                        .materialize()
                    )
                fetched = granted.drop_columns(["disposition"]).join(
                    page_store_ds,
                    join_type="inner",
                    num_partitions=cfg.num_blocks,
                    on=("url_hash",),
                )
            # materialize once: image sink, outlink explode and the count
            # all consume it (bounded: ≤ per-round politeness budget rows)
            ok = fetched.filter(expr="status == 200").materialize()

            # 6a. image sink (input_hint rows, Lance-like fragments)
            if cfg.write_images:
                images = ok.map_batches(ImageRows(), batch_format="pyarrow", batch_size=256)
                img_tab_batches = list(images.iter_batches(batch_size=4096, batch_format="pyarrow"))
                img_tab = (
                    pa.concat_tables(img_tab_batches, promote_options="default")
                    if img_tab_batches
                    else None
                )
                if img_tab is not None and img_tab.num_rows:
                    fp = _fingerprint_table(granted_tab, ["url_hash"])
                    img_tab = img_tab.sort_by("image_id")
                    lancelike.write_fragment(
                        os.path.join(cfg.checkpoint_dir, "images"), img_tab,
                        partition_id=0, round_index=r, input_fingerprint=fp,
                        extra_lineage={"round": r, "rows_in": granted_tab.num_rows},
                    )

            # 6b. outlink explode → next frontier
            children = ok.map_batches(
                lambda b: explode_outlinks(b, cfg.priority_decay, cfg.max_depth),
                batch_format="pyarrow",
            )
            child_batches = list(children.iter_batches(batch_size=65536, batch_format="pyarrow"))
            child_tab = (
                pa.concat_tables(child_batches, promote_options="default")
                if child_batches
                else pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)
            )
            n_fetched_ok = ok.count()
            n_outlinks = child_tab.num_rows
        else:
            child_tab = pa.Table.from_pylist([], schema=FRONTIER_SCHEMA)

        # 7. next frontier = deferred (stay admitted) + children
        deferred_next = deferred_tab.select(["url", "depth", "priority", "seed_id"])
        deferred_next = deferred_next.append_column(
            "admitted", pa.array([True] * deferred_next.num_rows, pa.bool_())
        )
        frontier_out = pa.concat_tables(
            [deferred_next.cast(FRONTIER_SCHEMA), child_tab.cast(FRONTIER_SCHEMA)],
            promote_options="default",
        )
        pq.write_table(frontier_out, os.path.join(rdir, "frontier_out.parquet"))

        # 8. seen-shard checkpoint + lineage
        snaps = ray.get([s.snapshot.remote() for s in shards])
        np.savez_compressed(
            os.path.join(rdir, "seen_shards.npz"), snaps=np.array(snaps, dtype=object)
        )
        m = {
            "round": r,
            "n_frontier": scheduled_tab.num_rows,
            "n_granted": granted_tab.num_rows,
            "n_deferred": deferred_tab.num_rows,
            "n_robots_denied": denied_n,
            "n_fetched_ok": n_fetched_ok,
            "n_outlinks": n_outlinks,
            "wall_s": round(time.monotonic() - t_start, 3),
        }
        metrics_rows.append(m)
        with open(os.path.join(rdir, "meta.json"), "w") as f:
            json.dump({**m, "done": True, "config": cfg.to_json()}, f, indent=1)

        if frontier_out.num_rows == 0:
            break

    # summary
    shard_stats = ray.get([s.stats.remote() for s in shards])
    seen_arrays = ray.get([s.seen_array.remote() for s in shards])
    seen = np.sort(np.concatenate(seen_arrays)) if seen_arrays else np.array([], dtype=np.uint64)
    for s in shards:
        ray.kill(s)
    total_granted = sum(m["n_granted"] for m in metrics_rows)
    wall = time.monotonic() - t_start
    result = {
        "checkpoint_dir": cfg.checkpoint_dir,
        "rounds": len(metrics_rows),
        "metrics": metrics_rows,
        "shard_stats": shard_stats,
        "n_seen": int(len(seen)),
        "seen_hashes": seen,
        "total_granted": total_granted,
        "urls_per_sec": round(total_granted / wall, 1) if wall > 0 else 0.0,
        "wall_s": round(wall, 3),
    }
    with open(os.path.join(cfg.checkpoint_dir, "summary.json"), "w") as f:
        json.dump({k: v for k, v in result.items() if k != "seen_hashes"}, f, indent=1)
    return result


def read_crawl_order(checkpoint_dir: str) -> pa.Table:
    """Global crawl order: per-round order files concatenated in round
    order (each already sorted by (fetch_ts, host, url_hash)) with a
    global rank column."""
    tables = []
    r = 0
    while True:
        path = os.path.join(checkpoint_dir, f"round-{r:03d}", "order.parquet")
        if not os.path.exists(path):
            break
        tables.append(pq.read_table(path))
        r += 1
    if not tables:
        return pa.table({"rank": pa.array([], pa.int64()), "url": pa.array([], pa.string())})
    tab = pa.concat_tables(tables, promote_options="default")
    return tab.append_column("rank", pa.array(np.arange(tab.num_rows, dtype=np.int64)))
