"""Similarity-search operators: exact top-k vs a numpy oracle, the
fused IVF path vs the materialized hive-partitioned index path."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.stages.similarity import (
    cosine_topk,
    ivf_build_index,
    ivf_cosine_topk,
    ivf_query_index,
)

DIM = 16
N = 400


def _corpus(seed=3):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((N, DIM)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(range(N), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs]),
    }), vecs


def test_cosine_topk_matches_numpy(ray_session):
    tab, vecs = _corpus()
    q = vecs[7]
    out = cosine_topk(rd.from_arrow(tab).repartition(4), [7], [list(map(float, q))],
                      k=5).to_pandas().sort_values("rank")
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = nv @ (q / np.linalg.norm(q))
    expect = np.argsort(-np.round(scores, 6), kind="stable")[:5]
    assert list(out["vec_id"]) == list(expect)
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_ivf_index_equals_fused(ray_session, tmp_path):
    """The materialized hive-partitioned index (build once, read only
    probed partitions) returns exactly what the fused assign→filter
    path returns for the same codebook/params."""
    tab, vecs = _corpus()
    q = list(map(float, vecs[0]))
    ds = rd.from_arrow(tab).repartition(4)
    fused = ivf_cosine_topk(ds, [0], [q], dim=DIM, k=8, n_buckets=8,
                            n_probe=4).to_pandas().sort_values("rank").reset_index(drop=True)
    path = ivf_build_index(rd.from_arrow(tab).repartition(4), dim=DIM,
                           path=str(tmp_path / "ivf"), n_buckets=8)
    indexed = ivf_query_index(path, [0], [q], dim=DIM, k=8, n_buckets=8,
                              n_probe=4).to_pandas().sort_values("rank").reset_index(drop=True)
    assert fused.equals(indexed)
    # the index is genuinely partitioned: one dir per populated bucket
    import os
    parts = [d for d in os.listdir(path) if d.startswith("ivf_bucket=")]
    assert len(parts) > 1
