"""Crawl end-to-end (SURVEY.md §5.2, §5.5, north rule):

- the Ray pipeline's crawl ORDER and final URL-seen SET match the
  sequential reference-semantics oracle exactly under the same seed
  list + politeness budget;
- join-mode fetch (frontier ⋈ page_store) equals synthetic fetch;
- a killed-and-resumed run is byte-identical to an uninterrupted one;
- every stored image row satisfies the input_hint invariant
  (decode, PSNR≥40 dB for lossy, caption equality).
"""

import hashlib
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from web_crawler_ray.codecs import decode_image, psnr
from web_crawler_ray.io import lancelike
from web_crawler_ray.pipelines.crawl import CrawlConfig, read_crawl_order, run_crawl
from web_crawler_ray.pipelines.oracle import crawl_oracle
from web_crawler_ray.synth import gen_page_store, gen_robots, gen_seeds, image_for_page

N_PAGES, N_HOSTS, SEED = 1000, 15, 42
N_SEEDS, ROUNDS = 120, 3


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl")
    seeds = gen_seeds(N_SEEDS, N_HOSTS, SEED)
    robots = gen_robots(N_HOSTS, SEED)
    ps_path = str(root / "page_store.parquet")
    pq.write_table(gen_page_store(N_PAGES, N_HOSTS, SEED, with_body=False), ps_path)
    return {"root": str(root), "seeds": seeds, "robots": robots, "ps_path": ps_path}


@pytest.fixture(scope="module")
def ray_run(fixtures):
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=os.path.join(fixtures["root"], "synth"),
        num_blocks=4,
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    order = read_crawl_order(cfg.checkpoint_dir)
    return {"cfg": cfg, "res": res, "order": order}


def _order_tuples(order_tab):
    return list(
        zip(
            order_tab["round"].to_pylist(),
            order_tab["fetch_ts_ms"].to_pylist(),
            order_tab["host"].to_pylist(),
            [int(x) for x in order_tab["url_hash"].to_pylist()],
            order_tab["url"].to_pylist(),
        )
    )


def test_order_and_seen_match_oracle(fixtures, ray_run):
    oracle = crawl_oracle(
        fixtures["seeds"], fixtures["robots"], N_PAGES, N_HOSTS, SEED, max_rounds=ROUNDS
    )
    assert _order_tuples(ray_run["order"]) == oracle["order"]
    assert set(int(x) for x in ray_run["res"]["seen_hashes"]) == oracle["seen"]
    assert ray_run["res"]["total_granted"] == len(oracle["order"])


def test_salting_invariance(fixtures, ray_run):
    """Hot-host salting only moves work, never changes results: order
    and seen set identical with salting disabled."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=os.path.join(fixtures["root"], "unsalted"),
        num_blocks=4, write_images=False, salt_hot_hosts=False,
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_streaming_mode_equals_rounds(fixtures, ray_run):
    """mode='streaming' (the fused one-execution-per-window prototype:
    schedule → fetch/sink/explode → frontier write in a single
    streaming DAG) produces the identical crawl order, seen set, and
    committed image fragments as the round model — the round barrier
    disappears from the execution, not from the semantics."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth",
        checkpoint_dir=os.path.join(fixtures["root"], "streaming"),
        num_blocks=4, mode="streaming",
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )
    # image sink parity with the round model's committed fragments
    rows_stream = lancelike.read_dataset(
        os.path.join(cfg.checkpoint_dir, "images"))
    rows_rounds = lancelike.read_dataset(
        os.path.join(ray_run["cfg"].checkpoint_dir, "images"))
    key = lambda t: sorted(t["image_id"].to_pylist())  # noqa: E731
    assert key(rows_stream) == key(rows_rounds)
    # per-round metrics recorded the pipelining latency probe
    assert all("fused_pipeline" in m["stage_s"] for m in res["metrics"])


def test_streaming_mode_constraints(fixtures):
    """The fused window fails fast outside its envelope: hashjoin fetch
    (a full-store repartition per round is exactly the barrier the DAG
    removes) and order-push off."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=1,
        fetch_mode="hashjoin",
        checkpoint_dir=os.path.join(fixtures["root"], "stream_bad"),
        num_blocks=4, mode="streaming",
    )
    with pytest.raises(NotImplementedError, match="hashjoin"):
        run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                  page_store_path=fixtures["ps_path"])
    cfg2 = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=1,
        fetch_mode="synth",
        checkpoint_dir=os.path.join(fixtures["root"], "stream_bad2"),
        num_blocks=4, mode="streaming", order_push=False,
    )
    with pytest.raises(NotImplementedError, match="order-push"):
        run_crawl(cfg2, fixtures["seeds"], robots_table=fixtures["robots"])


def test_order_push_equals_pull(fixtures, ray_run):
    """order_push=False (driver pulls granted rows from the scheduled
    dataset) produces the identical order file and seen set as the
    default push mode (tasks piggyback order rows on the stats RPC) —
    the two paths are interchangeable layouts of the same rows. Also
    pins that the auto gate enabled push for this shape (the politeness
    bound fits driver_order_rows)."""
    from web_crawler_ray.pipelines.crawl import DEFAULT_DELAY_MS  # gate sanity

    assert N_HOSTS * (60_000 // DEFAULT_DELAY_MS) <= CrawlConfig.order_push_bound_rows
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=os.path.join(fixtures["root"], "pullorder"),
        num_blocks=4, write_images=False, order_push=False,
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_sliced_robots_equals_broadcast(fixtures, ray_run):
    """robots_mode='sliced' (partition-local rule slices, the
    10^7-hosts path) produces identical order and seen set."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=os.path.join(fixtures["root"], "sliced"),
        num_blocks=4, write_images=False, robots_mode="sliced",
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_join_mode_equals_synth(fixtures, ray_run):
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="join", checkpoint_dir=os.path.join(fixtures["root"], "join"),
        num_blocks=4, write_images=False,
    )
    res = run_crawl(cfg, fixtures["seeds"], page_store_path=fixtures["ps_path"],
                    robots_table=fixtures["robots"], collect_seen=True)
    order = read_crawl_order(cfg.checkpoint_dir)
    assert order.equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_streaming_join_equals_rounds(fixtures, ray_run):
    """mode='streaming' + fetch_mode='join' (page-store shard actors
    probed per granted batch — the barrier-free inversion of the
    rounds-mode broadcast semi-join) produces the identical crawl
    order and seen set as the synth rounds oracle."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="join",
        checkpoint_dir=os.path.join(fixtures["root"], "stream_join"),
        num_blocks=4, write_images=False, mode="streaming", page_shards=5,
    )
    res = run_crawl(cfg, fixtures["seeds"], page_store_path=fixtures["ps_path"],
                    robots_table=fixtures["robots"], collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_page_shard_actor_probe_semantics(fixtures):
    """Unit contract of the probe path: misses drop (inner join), an
    actor on a never-written shard dir is a valid empty shard, and
    attach preserves granted row order."""
    import numpy as np
    import pyarrow as pa

    from web_crawler_ray.pipelines.crawl import (PageStoreShardActor,
                                                 probe_fetch_attach)

    import ray as _ray
    empty = PageStoreShardActor.remote(
        os.path.join(fixtures["root"], "no_such_shard_dir"))
    out = _ray.get(empty.probe.remote(np.array([1, 2], dtype=np.uint64)))
    assert out.num_rows == 0

    # one real shard covering every hash (n_shards=1) + a granted table
    # holding one store hit and one miss
    store = pq.read_table(fixtures["ps_path"],
                          columns=["url_hash", "status", "outlinks",
                                   "fetch_ms"])
    shard_dir = os.path.join(fixtures["root"], "unit_shard")
    os.makedirs(shard_dir, exist_ok=True)
    pq.write_table(store, os.path.join(shard_dir, "part-0.parquet"))
    actor = PageStoreShardActor.remote(shard_dir)
    hit = int(store["url_hash"][0].as_py())
    granted = pa.table({
        "url_hash": pa.array([12345, hit], pa.uint64()),  # miss first
        "url": pa.array(["http://miss/", "http://hit/"]),
        "disposition": pa.array(["granted", "granted"]),
    })
    out = probe_fetch_attach(granted, [actor], 1)
    assert out.num_rows == 1
    assert int(out["url_hash"][0].as_py()) == hit
    assert out["url"][0].as_py() == "http://hit/"
    assert "disposition" not in out.column_names
    assert {"status", "outlinks", "fetch_ms"} <= set(out.column_names)


def test_join_mode_rescan_gate_equals_cached(fixtures, ray_run):
    """page_store_cache_rows=0 forces the lazy re-scan path (no
    whole-store materialize — the 100-TB shape); results identical to
    the cached path and the synth oracle."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="join", checkpoint_dir=os.path.join(fixtures["root"], "rescan"),
        num_blocks=4, write_images=False, page_store_cache_rows=0,
    )
    res = run_crawl(cfg, fixtures["seeds"], page_store_path=fixtures["ps_path"],
                    robots_table=fixtures["robots"], collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_hashjoin_mode_equals_synth(fixtures, ray_run):
    """The full-Dataset.join fetch path (kept for comparison) produces
    the same crawl as the broadcast semi-join and synthetic fetch."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="hashjoin", checkpoint_dir=os.path.join(fixtures["root"], "hashjoin"),
        num_blocks=4, write_images=False,
    )
    run_crawl(cfg, fixtures["seeds"], page_store_path=fixtures["ps_path"],
              robots_table=fixtures["robots"])
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])


def test_other_politeness_budget_matches_oracle(fixtures):
    """Order/seen equality must hold under a different politeness budget
    (the budget changes grant counts, deferral waves and ordering)."""
    budget = 20_000
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        round_budget_ms=budget, fetch_mode="synth",
        checkpoint_dir=os.path.join(fixtures["root"], "budget20"),
        num_blocks=4, write_images=False,
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    oracle = crawl_oracle(
        fixtures["seeds"], fixtures["robots"], N_PAGES, N_HOSTS, SEED,
        max_rounds=ROUNDS, round_budget_ms=budget,
    )
    assert _order_tuples(read_crawl_order(cfg.checkpoint_dir)) == oracle["order"]
    assert set(int(x) for x in res["seen_hashes"]) == oracle["seen"]


def test_resume_byte_identical(fixtures, ray_run):
    ckpt = os.path.join(fixtures["root"], "resume")
    cfg_short = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS - 1,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    run_crawl(cfg_short, fixtures["seeds"], robots_table=fixtures["robots"])
    cfg_full = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    res = run_crawl(cfg_full, fixtures["seeds"], robots_table=fixtures["robots"], resume=True)
    assert res["rounds"] == 1  # only the missing round executed
    # content-identical resume: the global order table AND each round's
    # reassembled order digest match the uninterrupted run exactly
    # (order is defined by the sort columns, not file layout — the
    # order write is a distributed directory)
    assert read_crawl_order(ckpt).equals(ray_run["order"])

    def round_digest(ckpt_dir, r):
        df = read_crawl_order(ckpt_dir).to_pandas()
        sub = df[df["round"] == r]
        return hashlib.md5(sub.to_csv(index=False).encode()).hexdigest()

    for r in range(ROUNDS):
        assert round_digest(ray_run["cfg"].checkpoint_dir, r) == round_digest(ckpt, r)


def test_streaming_resume_cross_mode(fixtures, ray_run):
    """The checkpoint story is MODE-PORTABLE: a run checkpointed under
    the round model resumes under mode='streaming' (and vice versa is
    implied — both write the same round-boundary meta/seen/fragment
    layout) and the final order table is identical to the
    uninterrupted round-model run."""
    ckpt = os.path.join(fixtures["root"], "resume_xmode")
    cfg_short = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS - 1,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    run_crawl(cfg_short, fixtures["seeds"], robots_table=fixtures["robots"])
    cfg_stream = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
        mode="streaming",
    )
    res = run_crawl(cfg_stream, fixtures["seeds"],
                    robots_table=fixtures["robots"], resume=True)
    assert res["rounds"] == 1  # only the missing round executed
    assert read_crawl_order(ckpt).equals(ray_run["order"])


def test_resume_after_midround_crash(fixtures, ray_run):
    """Crash BETWEEN the schedule materialize and the sink commit: the
    crashed attempt leaves uniquely-named part files in the round's
    order/ + frontier_out/ dirs and in an UNCOMMITTED images fragment
    dir (not in the manifest). Resume must discard all of them and
    produce output identical to the uninterrupted run — order table,
    committed manifest fragments, and the image rows themselves."""
    import pyarrow as pa

    ckpt = os.path.join(fixtures["root"], "midcrash")
    r = ROUNDS - 1
    cfg_short = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=r,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    run_crawl(cfg_short, fixtures["seeds"], robots_table=fixtures["robots"])

    # fabricate the crashed attempt at round r: stale distributed-write
    # outputs + a stale uncommitted image part file (lancelike commit
    # never ran, so the manifest has no round-{r} fragment)
    rdir = os.path.join(ckpt, f"round-{r:03d}")
    bogus = pa.table({"junk": pa.array([1, 2, 3], pa.int64())})
    for sub in ("order", "frontier_out"):
        os.makedirs(os.path.join(rdir, sub), exist_ok=True)
        pq.write_table(bogus, os.path.join(rdir, sub, "part-dead.parquet"))
    stale_frag = os.path.join(ckpt, "images", f"round-{r:03d}")
    os.makedirs(stale_frag, exist_ok=True)
    pq.write_table(bogus, os.path.join(stale_frag, "part-deadbeef.parquet"))
    manifest_before = lancelike.read_manifest(os.path.join(ckpt, "images"))
    assert f"round-{r:03d}" not in manifest_before["fragments"]

    cfg_full = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    res = run_crawl(cfg_full, fixtures["seeds"], robots_table=fixtures["robots"],
                    resume=True)
    assert res["rounds"] == 1  # only the crashed round re-executed
    # stale artifacts are gone
    assert not os.path.exists(os.path.join(rdir, "order", "part-dead.parquet"))
    assert not os.path.exists(
        os.path.join(stale_frag, "part-deadbeef.parquet"))
    # order identical to the uninterrupted run
    assert read_crawl_order(ckpt).equals(ray_run["order"])
    # committed manifests agree fragment-by-fragment (rows + lineage
    # fingerprint); image ROWS byte-identical modulo file layout
    base_root = os.path.join(ray_run["cfg"].checkpoint_dir, "images")
    m_base = lancelike.read_manifest(base_root)["fragments"]
    m_res = lancelike.read_manifest(os.path.join(ckpt, "images"))["fragments"]
    assert set(m_base) == set(m_res)
    for name in m_base:
        assert m_base[name]["rows"] == m_res[name]["rows"]
        assert m_base[name]["input_fingerprint"] == m_res[name]["input_fingerprint"]

    def image_rows(root):
        t = lancelike.read_dataset(root)
        df = t.to_pandas().sort_values("image_id", kind="mergesort")
        return [tuple(x) for x in df[["image_id", "bytes", "caption",
                                      "phash"]].to_numpy()]

    assert image_rows(base_root) == image_rows(os.path.join(ckpt, "images"))


def test_image_sink_invariant(ray_run):
    """Every stored row decodes; PSNR≥40 dB for jpeg (vs the pixels the
    deterministic generator produces for that url_hash); caption equal."""
    images = lancelike.read_dataset(os.path.join(ray_run["cfg"].checkpoint_dir, "images"))
    assert images.num_rows > 0
    assert images.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    for row in images.slice(0, 50).to_pylist():
        uh = int(row["image_id"].replace("img-", ""), 16)
        expected_bytes, fmt, caption, ph = image_for_page(uh)
        decoded = decode_image(row["bytes"])
        reference = decode_image(expected_bytes)
        assert row["caption"] == caption
        assert row["phash"] == ph
        if row["fmt"] == "png":
            assert (decoded == reference).all()
        else:
            assert psnr(decoded, reference) >= 40.0
    # lineage sidecars exist per committed fragment
    manifest = lancelike.read_manifest(os.path.join(ray_run["cfg"].checkpoint_dir, "images"))
    assert manifest["fragments"]
    for name in manifest["fragments"]:
        assert os.path.exists(
            os.path.join(ray_run["cfg"].checkpoint_dir, "images", name + ".lineage.json")
        )


def test_metrics_lineage(ray_run):
    ms = ray_run["res"]["metrics"]
    assert len(ms) == ROUNDS
    for m in ms:
        assert m["n_granted"] <= m["n_frontier"]
        assert m["n_granted"] + m["n_deferred"] + m["n_robots_denied"] == m["n_frontier"]
        # the stored-phash invariant holds by construction (phash is
        # computed from the DECODED payload), so the sink must never
        # drop a row as invalid
        assert m["n_invalid_images"] == 0
    stats = ray_run["res"]["shard_stats"]
    assert sum(s["n"] for s in stats) == ray_run["res"]["n_seen"]


def test_no_rows_dropped_by_sink(ray_run):
    """Every granted 200-fetch lands in the image sink: rows in the
    committed fragments == sum of per-round n_fetched_ok."""
    images = lancelike.read_dataset(os.path.join(ray_run["cfg"].checkpoint_dir, "images"))
    total_ok = sum(m["n_fetched_ok"] for m in ray_run["res"]["metrics"])
    assert images.num_rows == total_ok


def test_seen_digest_matches_collected_set(ray_run):
    """The per-shard digest surface (the at-scale comparison path) is
    consistent with the opt-in collected seen array."""
    import hashlib as _h
    res = ray_run["res"]
    assert res["n_seen"] == len(res["seen_hashes"])
    assert len(res["shard_digests"]) > 0
    assert res["seen_digest"] == _h.md5("".join(res["shard_digests"]).encode()).hexdigest()


def test_crashed_attempt_stale_files_cleared(fixtures, ray_run):
    """A crashed mid-round attempt leaves uniquely-named part files in
    the round's order/ and frontier_out/ dirs; re-running the round
    must clear them (not read/count them alongside the new attempt's
    files) and still produce the exact pull-run order."""
    import pyarrow as pa

    ckpt = os.path.join(fixtures["root"], "crashed")
    cfg_short = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS - 1,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    run_crawl(cfg_short, fixtures["seeds"], robots_table=fixtures["robots"])
    # fabricate a crashed attempt of the NEXT (uncommitted) round:
    # stale part files with names a fresh attempt would never reuse
    rdir = os.path.join(ckpt, f"round-{ROUNDS - 1:03d}")
    for sub in ("order", "frontier_out"):
        os.makedirs(os.path.join(rdir, sub), exist_ok=True)
        pq.write_table(
            pa.table({"url": ["https://stale.example/x"],
                      "url_hash": pa.array([1], pa.uint64())}),
            os.path.join(rdir, sub, "part-deadbeefdeadbeef.parquet"),
        )
    cfg_full = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth", checkpoint_dir=ckpt, num_blocks=4,
    )
    res = run_crawl(cfg_full, fixtures["seeds"], robots_table=fixtures["robots"],
                    resume=True, collect_seen=True)
    assert read_crawl_order(ckpt).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_dimension_robots_equals_broadcast(fixtures, ray_run):
    """robots_mode='dimension' (rules ride the politeness shuffle as a
    Dataset — the 10^9-hosts path: no driver-held map, no slice refs)
    produces identical order and seen set, including hot-host rules
    forwarding to the home task."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth",
        checkpoint_dir=os.path.join(fixtures["root"], "dimension"),
        num_blocks=4, write_images=False, robots_mode="dimension",
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )


def test_dimension_robots_with_forced_hot_host(fixtures, tmp_path):
    """Force hot-host salting (factor 0 => every host hot) under
    dimension mode: every rules row must forward to its home task and
    the result must equal the broadcast run with the same forcing."""
    outs = {}
    for mode in ("broadcast", "dimension"):
        cfg = CrawlConfig(
            n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=2,
            fetch_mode="synth",
            checkpoint_dir=str(tmp_path / f"hot_{mode}"),
            num_blocks=4, write_images=False, robots_mode=mode,
            hot_host_factor=0.0,
        )
        res = run_crawl(cfg, fixtures["seeds"],
                        robots_table=fixtures["robots"], collect_seen=True)
        outs[mode] = (read_crawl_order(cfg.checkpoint_dir),
                      set(int(x) for x in res["seen_hashes"]))
    assert outs["broadcast"][0].equals(outs["dimension"][0])
    assert outs["broadcast"][1] == outs["dimension"][1]


@pytest.mark.parametrize("robots_mode", ["broadcast", "dimension"])
def test_streaming_with_forced_hot_hosts(fixtures, ray_run, tmp_path,
                                         robots_mode):
    """Hot-host salting INSIDE the fused streaming DAG (factor 0 =>
    every host hot, so every URL takes the salted dedup+probe path and
    the second host-keyed exchange to its home task — and in dimension
    mode every rules row forwards): order and seen set must equal the
    round model's exactly."""
    cfg = CrawlConfig(
        n_pages=N_PAGES, n_hosts=N_HOSTS, seed=SEED, max_rounds=ROUNDS,
        fetch_mode="synth",
        checkpoint_dir=str(tmp_path / f"stream_hot_{robots_mode}"),
        num_blocks=4, write_images=False, mode="streaming",
        robots_mode=robots_mode, hot_host_factor=0.0,
    )
    res = run_crawl(cfg, fixtures["seeds"], robots_table=fixtures["robots"],
                    collect_seen=True)
    assert read_crawl_order(cfg.checkpoint_dir).equals(ray_run["order"])
    assert set(int(x) for x in res["seen_hashes"]) == set(
        int(x) for x in ray_run["res"]["seen_hashes"]
    )
