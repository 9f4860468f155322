"""Unit tests for URL-seen structures (cuckoo/bloom/shard) and
politeness scheduling (heap spec vs vectorized engine form)."""

import numpy as np
import pandas as pd
import pytest

from web_crawler_ray.state.cuckoo import BloomFilter, CuckooFilter, SeenShardState
from web_crawler_ray.state.politeness import (
    HostRules,
    build_robots_map,
    robots_allowed,
    schedule_host_batch,
    schedule_host_heap,
)
from web_crawler_ray.synth import gen_robots


def test_cuckoo_insert_contains_serialize():
    cf = CuckooFilter(capacity=4096, seed=1)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**63, size=2000, dtype=np.uint64)
    for k in keys:
        assert cf.insert(int(k))
    assert cf.contains_batch(keys).all()
    # false-positive rate on fresh keys is small
    fresh = rng.integers(0, 2**63, size=2000, dtype=np.uint64)
    fpr = cf.contains_batch(fresh).mean()
    assert fpr < 0.01, fpr
    # byte-exact roundtrip
    cf2 = CuckooFilter.restore(cf.serialize())
    assert (cf2.buckets == cf.buckets).all() and cf2.count == cf.count
    assert cf2.contains_batch(keys).all()


def test_bloom_filter():
    bf = BloomFilter(capacity=5000)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    bf.add_batch(keys)
    assert bf.contains_batch(keys).all()
    fresh = rng.integers(0, 2**63, size=5000, dtype=np.uint64)
    assert bf.contains_batch(fresh).mean() < 0.01
    bf2 = BloomFilter.restore(bf.serialize())
    assert bf2.contains_batch(keys).all()


def test_seen_shard_exact_and_overflow():
    # tiny cuckoo capacity forces the bloom spill path; exactness must hold
    shard = SeenShardState(0, capacity=64)
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 2**63, size=500, dtype=np.uint64)
    first = shard.probe_and_add(keys)
    assert first.all()  # all new
    again = shard.probe_and_add(keys)
    assert not again.any()  # all seen — exact, even past cuckoo capacity
    assert shard.bloom is not None  # spilled
    snap = shard.snapshot()
    restored = SeenShardState.restore(snap)
    assert not restored.probe_and_add(keys[:50]).any()
    assert set(restored.exact) == set(shard.exact)


def test_schedule_vectorized_matches_heap():
    rng = np.random.default_rng(3)
    robots = build_robots_map(gen_robots(10, 42))
    for host in ["h0.example.test", "h3.example.test", "h9.example.test"]:
        n = 40
        df = pd.DataFrame(
            {
                "url": [f"https://{host}/p/{i}" for i in range(n)],
                "host": host,
                "url_hash": rng.integers(0, 2**63, size=n, dtype=np.uint64),
                "priority": rng.random(n).astype(np.float32),
                "depth": 0,
                "seed_id": range(n),
            }
        )
        for r in (0, 2):
            a = schedule_host_heap(df, robots, 60_000, r).sort_values("url_hash", kind="mergesort")
            b = schedule_host_batch(df, robots, 60_000, r).sort_values("url_hash", kind="mergesort")
            assert list(a["disposition"]) == list(b["disposition"])
            assert list(a["fetch_ts_ms"]) == list(b["fetch_ts_ms"])


def test_robots_allowed():
    rules = HostRules(2000, ("/p/1", "/admin"))
    assert robots_allowed("https://h/x", rules)
    assert not robots_allowed("https://h/p/12", rules)  # prefix match
    assert not robots_allowed("https://h/admin/x", rules)
    assert robots_allowed("https://h/p/2", rules)
    assert robots_allowed("https://h/anything", None)


def test_exact_pages_disk_spill(tmp_path):
    """ExactPages with a tiny spill threshold behaves identically to the
    in-RAM store and actually memmaps its merged pages to disk."""
    import os

    from web_crawler_ray.state.cuckoo import ExactPages

    rng = np.random.default_rng(5)
    keys = rng.choice(np.arange(1_000_000, dtype=np.uint64), size=60_000, replace=False)

    ram = ExactPages()
    spill = ExactPages(spill_dir=str(tmp_path / "spill"), spill_threshold=10_000)
    spill.BUF_CAP = ram.BUF_CAP = 1024  # force many flushes + merges
    for chunk in np.array_split(keys, 37):
        ram.add(chunk)
        spill.add(chunk)
    probe = np.concatenate([keys[:500], np.arange(2_000_000, 2_000_500, dtype=np.uint64)])
    assert (ram.contains(probe) == spill.contains(probe)).all()
    assert spill.contains(probe)[:500].all()
    assert not spill.contains(probe)[500:].any()
    assert len(spill) == len(keys)
    assert (ram.array() == spill.array()).all()
    spill_files = os.listdir(tmp_path / "spill")
    assert spill_files, "expected memmapped page files on disk"


def test_seen_shard_with_spill_matches_plain(tmp_path):
    from web_crawler_ray.state.cuckoo import SeenShardState

    rng = np.random.default_rng(6)
    keys = rng.integers(0, 2**63, size=5_000, dtype=np.uint64)
    plain = SeenShardState(0, capacity=1 << 14)
    spilled = SeenShardState(0, capacity=1 << 14,
                             spill_dir=str(tmp_path / "s"), spill_threshold=1_000)
    spilled.exact.BUF_CAP = 512
    for chunk in np.array_split(keys, 9):
        a = plain.probe_and_add(chunk)
        b = spilled.probe_and_add(chunk)
        assert (a == b).all()
    assert (plain.seen_array() == spilled.seen_array()).all()
