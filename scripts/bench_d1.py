"""Micro-bench: D1 latest-wins vectorized partition pass vs the
per-group grouped_apply formulation, on a high-cardinality fixture
(~10^6 distinct keys). Round-3 VERDICT item 3 evidence.

Usage: python scripts/bench_d1.py [n_rows] [n_keys]
"""
import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

sys.path.insert(0, "/root/repo")

import web_crawler_ray
from ray import cloudpickle as _rcp

_rcp.register_pickle_by_value(web_crawler_ray)

from web_crawler_ray.stages.dedup import dedup_latest_wins, latest_wins_reducer
from web_crawler_ray.stages.grouped import grouped_apply


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "sym": rng.integers(0, n_keys, n).astype("int64"),
            "ts": rng.integers(0, 10, n).astype("int64"),
            "uid": np.arange(n, dtype="int64"),
            "source": rng.choice(["alpha", "beta", ""], n),
        }
    )
    ds = rd.from_pandas(df).repartition(32).materialize()

    t0 = time.monotonic()
    fast = dedup_latest_wins(ds, ["sym"], "ts", "uid", "source").materialize()
    t_fast = time.monotonic() - t0

    t0 = time.monotonic()
    slow = grouped_apply(
        ds, ["sym"], lambda g: latest_wins_reducer(g, "ts", "uid", "source")
    ).materialize()
    t_slow = time.monotonic() - t0

    n_fast, n_slow = fast.count(), slow.count()
    assert n_fast == n_slow, (n_fast, n_slow)
    print(
        {
            "rows": n,
            "distinct_keys": int(df["sym"].nunique()),
            "vectorized_s": round(t_fast, 2),
            "per_group_s": round(t_slow, 2),
            "speedup": round(t_slow / t_fast, 2),
            "out_rows": n_fast,
        }
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
