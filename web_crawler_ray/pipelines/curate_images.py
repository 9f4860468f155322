"""Image-corpus curation flagship — the image-axis counterpart of
``pipelines/curate.py`` (text): decode-validate → quality gate → exact
perceptual-hash dedup → near-dup prune, composed from the reusable
stages so the whole chain stays streaming and bucketed.

Shape at 100 TB: the decode runs in an actor pool over small batches
(payload-heavy rows); everything after it carries only metadata
(iid, phash, dims) — the image bytes never enter a shuffle. Exact
dedup is one coarse hash-partitioned shuffle with a map-side combiner;
the near-dup prune ships 4 band keys per survivor and the pair set it
produces is bounded by the true near-dup density, so materializing it
for the anti-join is cheap by construction (documented gate below).

Curation rule (deliberately SQL-expressible so the oracle can replay
it row-level): keep an image iff
  1. it decodes and its stored phash matches the decoded pixels,
  2. w·h ≥ min_pixels,
  3. it is the min-iid owner of its exact phash, and
  4. no SURVIVING smaller-iid image is within hamming ≤ 3 of it
     (pairwise-to-smaller prune over the exact-dedup survivor set —
     exact because the banded pairs are exact for hamming ≤ 3).
"""

from __future__ import annotations

import pandas as pd

from ..stages.dedup import hash_near_dup_pairs
from ..stages.grouped import partitioned_drop_duplicates
from ..stages.joins import anti_join

META_COLS = ["iid", "phash", "w", "h"]


def curate_hashed(ds, min_pixels: int = 0, max_hamming: int = 3,
                  n_rows_hint: int | None = None):
    """Steps 2–4 over a metadata table with (iid:int64, phash:int64,
    w, h) columns — shared by the real-pixels pipeline and the SQL
    oracle sibling."""
    def gate(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["w"].astype("int64") * batch["h"].astype("int64")
                     >= min_pixels]

    gated = ds.map_batches(gate, batch_format="pandas")
    # survivors are metadata-only (no payload bytes) and are consumed
    # TWICE (LSH pair generation + the final anti-join): materialize so
    # the upstream decode/dedup DAG runs once, not per consumer. At a
    # scale where even the metadata can't sit in the object store,
    # write survivors to partitioned parquet here instead (resumable).
    survivors = partitioned_drop_duplicates(
        gated, ["phash"], sort_keys=["phash", "iid"],
        n_rows_hint=n_rows_hint, pre_dedup=True,
    ).materialize()
    # pair set is small by construction (near-dup density bound);
    # materialize so the emptiness gate doesn't re-execute the LSH
    pairs = hash_near_dup_pairs(
        survivors.select_columns(["iid", "phash"]), "phash", "iid",
        max_hamming=max_hamming, n_rows_hint=n_rows_hint,
    ).materialize()
    if pairs.count() == 0:
        return survivors
    return anti_join(survivors, pairs.select_columns(["id_b"]),
                     on="iid", right_on="id_b")


def curate_images(images_ds, min_pixels: int = 0, max_hamming: int = 3,
                  batch_size: int = 128, concurrency=None,
                  n_rows_hint: int | None = None):
    """Full pipeline over input_hint-schema image rows (image_id:string,
    bytes:binary, w, h, fmt, caption, phash): decode-validate in an
    actor pool, then the metadata-only curation chain. Returns curated
    rows without the payload bytes (metadata projection — re-join on
    image_id to recover payloads)."""
    from ..config import auto_concurrency
    from ..stages.multimodal import DecodeAndValidate

    validated = images_ds.map_batches(
        DecodeAndValidate, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or auto_concurrency(0.5),
    )

    def add_iid(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["decode_ok"] & batch["phash_ok"]].copy()
        batch["iid"] = batch["image_id"].str.slice(4).astype("int64")
        return batch[["iid", "image_id", "phash", "w", "h", "fmt", "caption"]]

    meta = validated.map_batches(add_iid, batch_format="pandas")
    return curate_hashed(meta, min_pixels=min_pixels, max_hamming=max_hamming,
                         n_rows_hint=n_rows_hint)
