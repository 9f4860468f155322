"""WebDataset-style tar shard sink + streaming reader (stdlib tarfile).

The standard interchange format for 100-TB image/caption training
corpora is a directory of size-bounded ``.tar`` shards where each
sample is a pair of members ``{key}.{ext}`` (payload bytes) and
``{key}.json`` (metadata) — readers stream one shard per task, so a
fixed-size cluster scales by shard count, not corpus size.

Write path (distributed, deterministic, resumable):
  * ``ds.map_batches(_ShardWriter)`` — each task packs its batch into
    one-or-more tars, cutting a new shard when the cumulative payload
    exceeds ``max_shard_bytes``. Rows are sorted by key inside the
    task and the shard file is **content-addressed**
    (``shard-<crc-of-keys+bytes>.tar``), so re-running the same input
    reproduces the same file names and an interrupted run simply
    overwrites identical bytes — idempotent resume without locks
    (file-write ownership per SURVEY.md §2 T6).
  * tar metadata (mtime/uid/gid) is zeroed so shard bytes are a pure
    function of the rows — byte-identical across runs and cluster
    sizes.
  * the writer tasks RETURN manifest rows (no driver-side payload);
    the driver commits ``_manifest.json`` last (atomic rename), the
    same commit protocol as ``io/lancelike.py``.

Read path: ``read_wds_shards`` builds a Dataset of shard paths from
the manifest and ``flat_map``-style unpacks one shard per batch task —
payload bytes never transit the driver.

Reference capability analogue: the crawler persists fetched image+
caption rows to disk (pacong/core/data_saver & image store); this is
the training-data-shaped equivalent sink.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import zlib

import numpy as np
import pyarrow as pa


def _tar_bytes(keys: list[str], payloads: list[bytes], metas: list[dict], ext: str) -> bytes:
    """Deterministic tar: zeroed timestamps/owners, key-sorted members."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key, payload, meta in zip(keys, payloads, metas):
            for name, data in (
                (f"{key}.{ext}", payload),
                (f"{key}.json", json.dumps(meta, sort_keys=True).encode()),
            ):
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


class ShardWriter:
    """map_batches callable: pack one batch into content-addressed tar
    shards under ``root``; emit manifest rows."""

    def __init__(self, root: str, key_col: str, payload_col: str, ext: str,
                 meta_cols: list[str], max_shard_bytes: int):
        self.root = root
        self.key_col = key_col
        self.payload_col = payload_col
        self.ext = ext
        self.meta_cols = list(meta_cols)
        self.max_shard_bytes = max_shard_bytes
        os.makedirs(root, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = [str(k) for k in batch.column(self.key_col).to_pylist()]
        order = np.argsort(np.asarray(keys, dtype=object), kind="stable")
        payloads = batch.column(self.payload_col).to_pylist()
        metas_cols = {c: batch.column(c).to_pylist() for c in self.meta_cols}
        out = {"shard": [], "rows": [], "bytes": [], "key_lo": [], "key_hi": []}
        cur_k: list[str] = []
        cur_p: list[bytes] = []
        cur_m: list[dict] = []
        cur_bytes = 0

        def flush():
            nonlocal cur_k, cur_p, cur_m, cur_bytes
            if not cur_k:
                return
            blob = _tar_bytes(cur_k, cur_p, cur_m, self.ext)
            digest = zlib.crc32("\x00".join(cur_k).encode()) ^ zlib.crc32(blob)
            name = f"shard-{digest:08x}-{len(cur_k):06d}.tar"
            tmp = os.path.join(self.root, name + ".tmp")
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, os.path.join(self.root, name))
            out["shard"].append(name)
            out["rows"].append(len(cur_k))
            out["bytes"].append(len(blob))
            out["key_lo"].append(cur_k[0])
            out["key_hi"].append(cur_k[-1])
            cur_k, cur_p, cur_m, cur_bytes = [], [], [], 0

        for i in order:
            p = payloads[i]
            if isinstance(p, str):
                p = p.encode()
            if cur_k and cur_bytes + len(p) > self.max_shard_bytes:
                flush()
            cur_k.append(keys[i])
            cur_p.append(p)
            cur_m.append({c: metas_cols[c][i] for c in self.meta_cols})
            cur_bytes += len(p)
        flush()
        return pa.table({
            "shard": pa.array(out["shard"], pa.string()),
            "rows": pa.array(out["rows"], pa.int64()),
            "bytes": pa.array(out["bytes"], pa.int64()),
            "key_lo": pa.array(out["key_lo"], pa.string()),
            "key_hi": pa.array(out["key_hi"], pa.string()),
        })


def write_wds_shards(ds, root: str, key_col: str, payload_col: str, *,
                     ext: str = "bin", meta_cols: list[str] | None = None,
                     max_shard_bytes: int = 64 << 20, concurrency=None) -> dict:
    """Write ``ds`` as WebDataset tar shards under ``root``; commit and
    return the manifest. At 100 TB, ``max_shard_bytes`` bounds both the
    writer task heap and the reader task heap."""
    from web_crawler_ray.config import auto_concurrency

    writer = ShardWriter(root, key_col, payload_col, ext,
                         meta_cols or [], max_shard_bytes)
    frag_rows = ds.map_batches(
        writer, batch_format="pyarrow",
        concurrency=concurrency or auto_concurrency(0.5),
    ).take_all()  # manifest rows only — a few per input block
    shards = {
        r["shard"]: {"rows": int(r["rows"]), "bytes": int(r["bytes"]),
                     "key_lo": r["key_lo"], "key_hi": r["key_hi"]}
        for r in frag_rows
    }
    manifest = {"version": 1, "ext": ext, "meta_cols": meta_cols or [],
                "key_col": key_col, "payload_col": payload_col,
                "shards": shards}
    tmp = os.path.join(root, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(root, "_manifest.json"))
    return manifest


def read_wds_manifest(root: str) -> dict:
    with open(os.path.join(root, "_manifest.json")) as f:
        return json.load(f)


def _unpack_shard(path: str, ext: str, key_col: str, payload_col: str,
                  meta_cols: list[str]) -> pa.Table:
    keys, payloads, metas = [], [], {c: [] for c in meta_cols}
    with tarfile.open(path, mode="r") as tf:
        members = {m.name: m for m in tf.getmembers()}
        sample_keys = sorted(n[: -len(ext) - 1] for n in members if n.endswith("." + ext))
        for key in sample_keys:
            keys.append(key)
            payloads.append(tf.extractfile(members[f"{key}.{ext}"]).read())
            meta = json.loads(tf.extractfile(members[f"{key}.json"]).read())
            for c in meta_cols:
                metas[c].append(meta.get(c))
    cols = {key_col: pa.array(keys, pa.string()),
            payload_col: pa.array(payloads, pa.binary())}
    for c in meta_cols:
        cols[c] = pa.array(metas[c])
    return pa.table(cols)


def read_wds_shards(root: str, concurrency=None):
    """Stream committed shards back as a Dataset — one shard per task,
    payload bytes zero-copied into Arrow blocks."""
    import ray.data as rd

    from web_crawler_ray.config import auto_concurrency

    man = read_wds_manifest(root)
    paths = [os.path.join(root, s) for s in sorted(man["shards"])]
    expected = {os.path.join(root, s): v["rows"]
                for s, v in man["shards"].items()}
    ext, key_col = man["ext"], man["key_col"]
    payload_col, meta_cols = man["payload_col"], list(man["meta_cols"])

    def unpack(batch: pa.Table) -> pa.Table:
        tabs = []
        for p in batch.column("path").to_pylist():
            t = _unpack_shard(p, ext, key_col, payload_col, meta_cols)
            # tarfile treats a truncated archive as a short one — row
            # counts against the manifest turn silent data loss loud
            if t.num_rows != expected[p]:
                raise ValueError(
                    f"shard {p} yielded {t.num_rows} rows, manifest "
                    f"says {expected[p]} — corrupt or truncated shard")
            tabs.append(t)
        return pa.concat_tables(tabs)

    return (
        rd.from_items([{"path": p} for p in paths])
        .repartition(max(1, len(paths)))
        .map_batches(unpack, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency or auto_concurrency(0.5))
    )
