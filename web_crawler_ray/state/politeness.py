"""Per-host politeness scheduling + robots gating
(north rule; SURVEY.md §2.3 T8/T9, §2.9 V6).

The reference's politeness is a 2.0 s sleep between sources
(pacong/core/base_scraper.py:117-119, settings.yaml:17); the engine
generalizes it to per-host virtual-time scheduling:

- Each crawl round spans ``round_budget_ms`` of virtual time.
- A host with crawl delay d may fetch K = max(1, round_budget_ms // d)
  URLs in a round, at virtual times j*d (j = 0..K-1).
- Within a host, candidate URLs are ordered by a min-heap keyed
  (-priority, url_hash) — the frontier priority queue (O4). Ties and
  everything else are data-pure, so the granted set, the virtual fetch
  times, and therefore the GLOBAL crawl order
  (round, fetch_ts, host, -priority, url_hash) are identical at any
  parallelism level — the scheduling-independence the north rule's
  cross-cluster-size ordering match requires.
- robots: a URL whose path starts with a disallowed prefix for its
  host is dropped (status 'robots_denied'); ungranted survivors are
  deferred to the next round.

``schedule_host_batch`` is the pure function; it runs inside
``groupby("host").map_groups`` (the big shuffle: groupby-on-host-hash
before the politeness stage, with hot hosts bounded by K so one
mega-host cannot serialize a partition — the budget IS the salt cap).
The same function is reused verbatim by the sequential oracle.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import pandas as pd

DEFAULT_DELAY_MS = 2000  # reference rate_limit_delay=2.0s (settings.yaml:17)


@dataclass(frozen=True)
class HostRules:
    delay_ms: int
    disallow_prefixes: tuple[str, ...]


def build_robots_map(robots_table) -> dict[str, HostRules]:
    """robots fixture table (FIXTURES.md §6) → {host: HostRules}.
    crawl_delay_ms == 0 means 'unspecified' → reference default 2.0 s."""
    out: dict[str, HostRules] = {}
    cols = robots_table.to_pydict() if hasattr(robots_table, "to_pydict") else robots_table
    for host, delay, prefixes in zip(cols["host"], cols["crawl_delay_ms"], cols["disallow_prefixes"]):
        out[host] = HostRules(int(delay) if delay else DEFAULT_DELAY_MS, tuple(prefixes or ()))
    return out


def path_of(url: str) -> str:
    try:
        rest = url.split("://", 1)[1]
        slash = rest.find("/")
        return rest[slash:] if slash >= 0 else "/"
    except IndexError:
        return "/"


def robots_allowed(url: str, rules: HostRules | None) -> bool:
    if rules is None or not rules.disallow_prefixes:
        return True
    p = path_of(url)
    return not any(p.startswith(pref) for pref in rules.disallow_prefixes)


def schedule_host_heap(
    group: pd.DataFrame,
    robots: dict[str, HostRules],
    round_budget_ms: int,
    round_index: int,
) -> pd.DataFrame:
    """Min-heap SPEC implementation of per-host scheduling (the frontier
    priority queue, SURVEY §2.6 O4) — used by the sequential oracle.
    The engine's vectorized ``schedule_host_batch`` must match it
    exactly (asserted in tests)."""
    host = group["host"].iloc[0]
    rules = robots.get(host)
    delay = rules.delay_ms if rules else DEFAULT_DELAY_MS
    budget = max(1, round_budget_ms // max(delay, 1))

    heap: list[tuple[float, int, int]] = []
    for idx, (prio, uh) in enumerate(zip(group["priority"].to_numpy(), group["url_hash"].to_numpy())):
        heapq.heappush(heap, (-float(prio), int(uh), idx))

    disposition = np.full(len(group), "deferred", dtype=object)
    fetch_ts = np.full(len(group), -1, dtype=np.int64)
    urls = group["url"].tolist()
    granted = 0
    base = round_index * round_budget_ms
    while heap:
        _, _, idx = heapq.heappop(heap)
        if not robots_allowed(urls[idx], rules):
            disposition[idx] = "robots_denied"
            continue
        if granted < budget:
            disposition[idx] = "granted"
            fetch_ts[idx] = base + granted * delay
            granted += 1
        # else stays deferred

    out = group.copy()
    out["disposition"] = disposition
    out["fetch_ts_ms"] = fetch_ts
    return out


_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"


def schedule_host_batch(
    group: pd.DataFrame,
    robots: dict[str, HostRules],
    round_budget_ms: int,
    round_index: int,
) -> pd.DataFrame:
    """Vectorized per-host scheduling (engine hot path): identical
    semantics to ``schedule_host_heap`` — the heap order
    (-priority, url_hash) is exactly a sort, robots-denied rows do not
    consume budget slots. Output: rows + disposition ∈
    {granted, deferred, robots_denied} and fetch_ts_ms (virtual:
    round_index*budget + slot*delay)."""
    host = group["host"].iloc[0]
    rules = robots.get(host)
    delay = rules.delay_ms if rules else DEFAULT_DELAY_MS
    budget = max(1, round_budget_ms // max(delay, 1))
    base = round_index * round_budget_ms

    order = group.sort_values(["priority", "url_hash"], ascending=[False, True], kind="mergesort")
    if rules is not None and rules.disallow_prefixes:
        paths = order["url"].str.replace(_PATH_RE, "", regex=True, n=1)
        allowed = np.ones(len(order), dtype=bool)
        for pref in rules.disallow_prefixes:
            allowed &= ~paths.str.startswith(pref).to_numpy()
    else:
        allowed = np.ones(len(order), dtype=bool)

    slot = np.cumsum(allowed) - 1  # rank among allowed rows
    granted_mask = allowed & (slot < budget)
    disposition = np.where(granted_mask, "granted", np.where(allowed, "deferred", "robots_denied"))
    fetch_ts = np.where(granted_mask, base + slot * delay, -1).astype(np.int64)

    out = order.copy()
    out["disposition"] = disposition
    out["fetch_ts_ms"] = fetch_ts
    return out


class PolitenessGate:
    """Actor-pool form for map_groups via functools: holds the broadcast
    robots map (fetched once per actor from the object store)."""

    def __init__(self, robots_ref, round_budget_ms: int):
        import ray

        self.robots = ray.get(robots_ref)
        self.round_budget_ms = round_budget_ms
        self.round_index = 0

    def set_round(self, r: int) -> None:
        self.round_index = r

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        return schedule_host_batch(group, self.robots, self.round_budget_ms, self.round_index)
