"""Sequential pure-Python crawl oracle (SURVEY.md §5.2).

Replays the crawl semantics — the generalization of the reference's
sequential source loop (pacong/core/base_scraper.py:93-150: iterate
sources in order, sleep rate_limit_delay between fetches) — in one
process with plain dicts/heaps, no Ray. The Ray pipeline
(pipelines/crawl.py) must produce the SAME crawl order and URL-seen
set under the same seed list + politeness budget (north rule).

Shared spec functions: canonicalize_url (urls.py) and
schedule_host_batch (state/politeness.py) are the semantic definitions
used by both sides; what this oracle independently re-implements is
the ORCHESTRATION — round loop, dedup rule, seen set, fetch, link
explosion — i.e. exactly the parts the distributed engine could get
wrong (shuffles, actor sharding, ordering).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..hashing import hash64
from ..state.politeness import build_robots_map, schedule_host_heap
from ..synth import page_meta
from ..urls import canonicalize_url, host_of


def crawl_oracle(
    seeds_table: pa.Table,
    robots_table: pa.Table,
    n_pages: int,
    n_hosts: int,
    seed: int,
    max_rounds: int,
    max_depth: int = 8,
    round_budget_ms: int = 60_000,
    priority_decay: float = 0.85,
    page_lookup: dict | None = None,
) -> dict:
    """Returns {"order": [(round, fetch_ts, host, url_hash, url)...],
    "seen": set[int], "metrics": [...]}.

    ``page_lookup`` (url_hash → {status, outlinks}) overrides the
    synthetic page function when the Ray side uses join-mode fetch over
    a materialized page store (identical content either way)."""
    robots = build_robots_map(robots_table)

    frontier = [
        {
            "url": url,
            "depth": 0,
            "priority": float(prio),
            "seed_id": int(sid),
            "admitted": False,
        }
        for url, prio, sid in zip(
            seeds_table["url"].to_pylist(),
            seeds_table["priority"].to_pylist(),
            seeds_table["seed_id"].to_pylist(),
        )
    ]
    seen: set[int] = set()
    order: list[tuple] = []
    metrics = []

    for r in range(max_rounds):
        if not frontier:
            break
        # canonicalize + hash
        rows = []
        for row in frontier:
            canon = canonicalize_url(row["url"])
            if not canon:
                continue
            rows.append({**row, "url": canon, "host": host_of(canon), "url_hash": hash64(canon)})
        # round-dedup: same rule as pipelines/crawl.round_dedup
        best: dict[int, dict] = {}
        for row in rows:
            cur = best.get(row["url_hash"])
            if cur is None:
                best[row["url_hash"]] = dict(row)
                continue
            key = (-row["priority"], row["depth"], row["seed_id"])
            # admitted is OR-ed across duplicates (same rule as
            # round_dedup_partition): the winner inherits admission so a
            # deferred row shadowed by a fresh duplicate child is still
            # exempt from the seen probe.
            if key < (-cur["priority"], cur["depth"], cur["seed_id"]):
                row = dict(row)
                row["admitted"] = row["admitted"] or cur["admitted"]
                best[row["url_hash"]] = row
            else:
                cur["admitted"] = cur["admitted"] or row["admitted"]
        rows = list(best.values())
        # seen probe (admitted rows skip)
        survivors = []
        for row in rows:
            if row["admitted"]:
                survivors.append(row)
            elif row["url_hash"] not in seen:
                seen.add(row["url_hash"])
                survivors.append(row)
        if not survivors:
            metrics.append({"round": r, "n_granted": 0})
            break
        # politeness per host (shared spec function)
        df = pd.DataFrame(survivors)
        scheduled = (
            df.groupby("host", group_keys=False, sort=True)
            .apply(lambda g: schedule_host_heap(g, robots, round_budget_ms, r))
            .reset_index(drop=True)
        )
        granted = scheduled[scheduled["disposition"] == "granted"]
        deferred = scheduled[scheduled["disposition"] == "deferred"]
        granted_sorted = granted.sort_values(
            ["fetch_ts_ms", "host", "url_hash"], kind="mergesort"
        )
        for _, g in granted_sorted.iterrows():
            order.append((r, int(g["fetch_ts_ms"]), g["host"], int(g["url_hash"]), g["url"]))
        # fetch + explode
        children = []
        n_ok = 0
        for _, g in granted_sorted.iterrows():
            if page_lookup is not None:
                page = page_lookup.get(int(g["url_hash"]))
                if page is None:
                    continue
                status, outlinks = page["status"], page["outlinks"]
            else:
                try:
                    pid = int(g["url"].rsplit("/p/", 1)[1])
                except (IndexError, ValueError):
                    continue
                meta = page_meta(pid, n_pages, n_hosts, seed)
                status, outlinks = meta["status"], meta["outlinks"]
            if status != 200:
                continue
            n_ok += 1
            if g["depth"] + 1 > max_depth:
                continue
            for link in outlinks:
                children.append(
                    {
                        "url": link,
                        "depth": int(g["depth"]) + 1,
                        "priority": float(g["priority"]) * priority_decay,
                        "seed_id": int(g["seed_id"]),
                        "admitted": False,
                    }
                )
        metrics.append(
            {
                "round": r,
                "n_granted": len(granted),
                "n_deferred": len(deferred),
                "n_fetched_ok": n_ok,
                "n_outlinks": len(children),
            }
        )
        frontier = [
            {
                "url": row["url"],
                "depth": int(row["depth"]),
                "priority": float(row["priority"]),
                "seed_id": int(row["seed_id"]),
                "admitted": True,
            }
            for _, row in deferred.iterrows()
        ] + children

    return {"order": order, "seen": seen, "metrics": metrics}
