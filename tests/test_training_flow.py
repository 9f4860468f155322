"""Capstone integration: the full training-data flow composed from the
engine's stages — quality gate → exact dedup → sequence packing →
epoch-shuffle plan → WebDataset export → streamed readback — each
boundary verified by conservation properties."""

import numpy as np
import pandas as pd
import ray.data as rd


def test_end_to_end_training_data_flow(ray_session, tmp_path):
    from web_crawler_ray.io.wds import read_wds_shards, write_wds_shards
    from web_crawler_ray.stages.aggregate import quantile_gate
    from web_crawler_ray.stages.dedup import dedup_exact
    from web_crawler_ray.stages.packing import chunk_documents
    from web_crawler_ray.stages.sampling import epoch_shuffle_plan

    src = "/root/testdata/sf0.001/documents.parquet"
    docs = rd.read_parquet(src, columns=["doc_id", "text", "n_chars"])
    n_src = docs.count()

    # 1. quality gate: keep docs at/above the p25 of n_chars
    kept = quantile_gate(docs, "n_chars", 0.25, keep="ge")
    n_kept = kept.count()
    assert 0 < n_kept <= n_src

    # 2. exact dedup on text (min-doc_id winner)
    deduped = dedup_exact(kept, text_col="text", id_col="doc_id")
    surv = deduped.select_columns(["doc_id", "text"])
    n_surv = surv.count()
    assert 0 < n_surv <= n_kept

    # 3. fixed-window chunking into 32-token training rows
    chunks = chunk_documents(surv, window=32, stride=32).materialize()
    cdf = chunks.to_pandas()
    assert (cdf["n_tokens"] > 0).all() and (cdf["n_tokens"] <= 32).all()
    # every surviving doc with >=1 token contributes its full tokens
    assert set(cdf["doc_id"]) <= set(surv.to_pandas()["doc_id"])

    # 4. epoch-shuffle plan addresses every chunk exactly once
    cdf["chunk_uid"] = cdf["doc_id"] * 10_000 + cdf["chunk_idx"]
    plan = epoch_shuffle_plan(rd.from_pandas(cdf[["chunk_uid"]]),
                              "chunk_uid", num_shards=4, seed=3).to_pandas()
    assert len(plan) == len(cdf)
    assert set(plan["chunk_uid"]) == set(cdf["chunk_uid"])
    for _, g in plan.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))

    # 5. export chunk texts as WDS shards, stream back, verify bytes
    keyed = cdf.assign(key=cdf["chunk_uid"].map("{:016d}".format),
                       payload=cdf["chunk_text"].str.encode("utf-8"))
    write_wds_shards(rd.from_pandas(keyed[["key", "payload"]]),
                     str(tmp_path / "wds"), "key", "payload",
                     max_shard_bytes=1 << 16)
    back = read_wds_shards(str(tmp_path / "wds")).to_pandas()
    assert len(back) == len(cdf)
    total_in = int(keyed["payload"].map(len).sum())
    total_out = int(back["payload"].map(len).sum())
    assert total_in == total_out
