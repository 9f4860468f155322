"""Crawl CLI — the ``ray job submit`` entrypoint (north rule).

On a real cluster:

    ray job submit --working-dir . -- python scripts/run_crawl.py \
        --seeds 1000000 --hosts 20000 --rounds 5 --ckpt /data/crawl \
        [--resume] [--fetch-mode join --page-store /data/page_store]

In this sandbox it runs against a local session (RAY_ADDRESS=local).
Owns its Ray session (the only scripts allowed to: bench.py, CLIs, and
the test fixture); always shuts down so the next run starts clean.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description="Ray-Data crawl frontier runner")
    p.add_argument("--seeds", type=int, default=10_000)
    p.add_argument("--hosts", type=int, default=500)
    p.add_argument("--pages-factor", type=int, default=10,
                   help="universe size = seeds * factor")
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--ckpt", default="/tmp/wcr_cli_crawl")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--fetch-mode", choices=["synth", "join"], default="synth")
    p.add_argument("--page-store", default=None)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    p.add_argument("--num-blocks", type=int, default=None)
    p.add_argument("--no-images", action="store_true")
    p.add_argument("--image-px", type=int, default=32)
    p.add_argument("--robots-mode", choices=["broadcast", "sliced", "dimension"],
                   default="broadcast")
    args = p.parse_args()

    import ray

    ray.data.DataContext.get_current().enable_progress_bars = False
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from ray import cloudpickle as rcp

        import web_crawler_ray

        rcp.register_pickle_by_value(web_crawler_ray)
        from web_crawler_ray.pipelines.crawl import CrawlConfig, run_crawl
        from web_crawler_ray.synth import gen_robots, gen_seeds

        cfg = CrawlConfig(
            n_pages=args.seeds * args.pages_factor,
            n_hosts=args.hosts,
            seed=args.seed,
            max_rounds=args.rounds,
            fetch_mode=args.fetch_mode,
            checkpoint_dir=args.ckpt,
            write_images=not args.no_images,
            image_px=args.image_px,
            num_blocks=args.num_blocks or max(16, args.num_cpus * 2),
            robots_mode=args.robots_mode,
        )
        result = run_crawl(
            cfg,
            gen_seeds(args.seeds, cfg.n_hosts, cfg.seed),
            page_store_path=args.page_store,
            robots_table=gen_robots(cfg.n_hosts, cfg.seed),
            resume=args.resume,
        )
        print(json.dumps({k: v for k, v in result.items() if k != "seen_hashes"}, default=str))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
