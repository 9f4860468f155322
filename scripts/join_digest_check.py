"""Pin: fetch_mode='join' reproduces the bench-shape order digest."""
import hashlib, os, sys, time
import pyarrow.parquet as pq
import ray

ray.data.DataContext.get_current().enable_progress_bars = False
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
import __ray_entry__  # noqa: F401 (pickle-by-value bootstrap)
from web_crawler_ray.pipelines.crawl import CrawlConfig, read_crawl_order, run_crawl
from web_crawler_ray.synth import gen_page_store_distributed, gen_robots, gen_seeds

SEEDS, HOSTS, PAGES, ROUNDS = 400_000, 6000, 4_000_000, 3
ps_dir = f"/tmp/wcr_join_ps_{PAGES}_{HOSTS}_42"
if not os.path.isdir(ps_dir):
    t0 = time.monotonic()
    gen_page_store_distributed(PAGES, HOSTS, ps_dir, seed=42, with_body=False)
    print(f"page store gen: {time.monotonic()-t0:.1f}s")

seeds_path = f"/tmp/wcr_bench_seeds_{SEEDS}_{HOSTS}_42.parquet"
robots_path = f"/tmp/wcr_bench_robots_{HOSTS}_42.parquet"
if not os.path.exists(seeds_path):
    pq.write_table(gen_seeds(SEEDS, HOSTS, 42), seeds_path)
if not os.path.exists(robots_path):
    pq.write_table(gen_robots(HOSTS, 42), robots_path)

cfg = CrawlConfig(
    n_pages=PAGES, n_hosts=HOSTS, seed=42, max_rounds=ROUNDS,
    round_budget_ms=60_000, n_seen_shards=8, fetch_mode="join",
    checkpoint_dir="/tmp/wcr_join_digest_ck", num_blocks=64,
    write_images=False,
)
t0 = time.monotonic()
res = run_crawl(cfg, pq.read_table(seeds_path), robots_table=pq.read_table(robots_path),
                page_store_path=ps_dir)
wall = time.monotonic() - t0
order = read_crawl_order(cfg.checkpoint_dir)
digest = hashlib.md5(",".join(map(str, order["url_hash"].to_pylist())).encode()).hexdigest()
processed = sum(m["n_frontier"] for m in res["metrics"])
print(f"join-mode: digest={digest} expect=2ae417c325faa42b6779ade31315bc96 "
      f"match={digest=='2ae417c325faa42b6779ade31315bc96'} wall={wall:.1f}s "
      f"frontier_urls_per_sec={processed/wall:.0f} granted={res['total_granted']}")
ray.shutdown()
