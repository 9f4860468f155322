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
    same input — the resume skip condition. Fragments folded into a
    merged file by :func:`compact` stay resume-skippable via the
    manifest's ``compacted`` ledger (their rows live on under the
    merged name)."""
    manifest = read_manifest(root)
    name = fragment_name(partition_id, round_index)
    frag = manifest["fragments"].get(name)
    if frag:
        return frag["input_fingerprint"] == input_fingerprint
    return manifest.get("compacted", {}).get(name) == input_fingerprint


def _resolve_format(data_format: str) -> str:
    """The library seam: ``auto`` = real Lance when importable, parquet
    lookalike otherwise — so installing ``pylance`` flips every sink in
    the repo with ZERO call-site changes. Explicit ``lance`` fails fast
    when the lib is absent (silently writing parquet instead of the
    requested format would be a lie)."""
    if data_format == "auto":
        return "lance" if HAVE_LANCE else "parquet"
    if data_format == "lance" and not HAVE_LANCE:
        raise ImportError(
            "data_format='lance' requires the 'lance' package "
            "(pip install pylance); use 'auto' to fall back to the "
            "parquet lookalike when it is absent")
    if data_format not in ("lance", "parquet"):
        raise ValueError(f"unknown data_format {data_format!r}")
    return data_format


def _write_fragment_data(root: str, name: str, table: pa.Table,
                         fmt: str) -> str:
    """Write one fragment's rows in ``fmt``; returns the file/dir name
    recorded in the manifest. Parquet commits via tmp→rename; Lance
    datasets commit via their OWN manifest (lance.write_dataset is
    atomic per version), so the directory name is recorded as-is."""
    if fmt == "lance":
        import lance

        path = os.path.join(root, name + ".lance")
        lance.write_dataset(table, path, mode="create")
        return name + ".lance"
    data_path = os.path.join(root, name + ".parquet")
    tmp_path = data_path + ".tmp"
    pq.write_table(table, tmp_path, compression="zstd")
    os.replace(tmp_path, data_path)
    return name + ".parquet"


def _read_fragment_data(path: str) -> pa.Table:
    """Read one committed fragment regardless of format — the read side
    of the seam (manifest records the extension)."""
    if path.endswith(".lance"):
        import lance

        return lance.dataset(path).to_table()
    return pq.read_table(path)


def write_fragment(
    root: str,
    table: pa.Table,
    partition_id: int,
    round_index: int,
    input_fingerprint: str,
    extra_lineage: dict | None = None,
    data_format: str = "auto",
) -> str:
    """Atomically commit one fragment + lineage; idempotent per
    (partition, round, fingerprint). ``data_format``: ``auto`` (real
    Lance when importable, parquet lookalike otherwise), ``lance``,
    or ``parquet`` — see :func:`_resolve_format`."""
    os.makedirs(root, exist_ok=True)
    fmt = _resolve_format(data_format)
    name = fragment_name(partition_id, round_index)
    if completed_fragment(root, partition_id, round_index, input_fingerprint):
        return name
    t0 = time.monotonic()
    file_name = _write_fragment_data(root, name, table, fmt)
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
        "file": file_name,
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
    workers, one file per block). The fragment records its FILE LIST at
    commit time, so readers are scoped to the committed set (stray
    files from a crashed attempt are invisible) and in-dir compaction
    can swap the list atomically."""
    if completed := (read_manifest(root)["fragments"].get(name) or None):
        if completed["input_fingerprint"] == input_fingerprint:
            return name
    files = sorted(f for f in os.listdir(os.path.join(root, dirname))
                   if f.endswith(".parquet"))
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
        "files": files,
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
            # committed file list when recorded (newer manifests);
            # directory listing for manifests written before it existed
            names = frag.get("files") or sorted(
                f for f in os.listdir(d) if f.endswith(".parquet"))
            for fname in names:
                tables.append(_read_fragment_data(os.path.join(d, fname)))
        else:
            tables.append(_read_fragment_data(os.path.join(root, frag["file"])))
    if not tables:
        raise FileNotFoundError(f"no committed fragments under {root}")
    return pa.concat_tables(tables)


def dataset_paths(root: str) -> list[str]:
    manifest = read_manifest(root)
    return [os.path.join(root, frag["file"]) for _, frag in sorted(manifest["fragments"].items())]


def _compact_dir_fragment(root: str, frag: dict, target_rows: int,
                          to_delete: list) -> dict:
    """Merge small adjacent files inside one committed dir fragment.
    Writes merged files (tmp → rename) and returns the fragment record
    with the new file list; replaced files go on ``to_delete`` for
    removal AFTER the manifest swap."""
    d = os.path.join(root, frag["dir"])
    rows_of = {f: pq.read_metadata(os.path.join(d, f)).num_rows
               for f in frag["files"]}
    new_files: list[str] = []
    group: list[str] = []
    group_rows = 0
    merged_idx = sum(1 for f in frag["files"] if f.startswith("merged-"))

    def flush_group():
        nonlocal group, group_rows, merged_idx
        if not group:
            return
        if len(group) == 1:
            new_files.append(group[0])
        else:
            merged = pa.concat_tables(
                [pq.read_table(os.path.join(d, f)) for f in group])
            name = f"merged-{merged_idx:05d}-{merged.num_rows}.parquet"
            merged_idx += 1
            tmp = os.path.join(d, name + ".tmp")
            pq.write_table(merged, tmp, compression="zstd")
            os.replace(tmp, os.path.join(d, name))
            new_files.append(name)
            to_delete.extend(os.path.join(frag["dir"], f) for f in group)
        group, group_rows = [], 0

    for f in frag["files"]:
        if rows_of[f] >= target_rows:
            flush_group()
            new_files.append(f)
            continue
        group.append(f)
        group_rows += rows_of[f]
        if group_rows >= target_rows:
            flush_group()
    flush_group()
    return {**frag, "files": new_files}


def compact(root: str, target_rows: int = 1_000_000) -> dict:
    """Small-fragment compaction: coalesce adjacent committed fragments
    (manifest order, so read order is preserved) into merged fragments
    of ~``target_rows``, then swap the manifest atomically. The 100-TB
    operational need this serves: a resumable run that commits one
    fragment per (partition, round) accumulates many small parquet
    files; readers pay per-file open cost. Compaction is idempotent —
    already-large fragments pass through untouched — and crash-safe:
    merged files are written and fsync-renamed BEFORE the manifest
    flips, and old files are removed only after the swap, so any crash
    leaves a readable table (at worst with orphaned files).

    Resume safety: every merged-away fragment's (name → fingerprint)
    moves to the manifest's ``compacted`` ledger, which
    :func:`completed_fragment` consults — a resumed run still skips
    partitions whose rows now live inside a merged file.

    Dir fragments (distributed sinks) with a committed ``files`` list
    get IN-DIR compaction: small adjacent files merge into
    ~``target_rows`` files, and because readers follow the manifest's
    file list (not a directory listing) the swap is crash-safe — the
    merged files are renamed into place before the manifest flips, and
    the replaced files are deleted only after; a crash in the window
    leaves orphans, never double rows. Legacy dir fragments without a
    file list are left untouched.

    Returns the new manifest."""
    manifest = read_manifest(root)
    compacted: dict = dict(manifest.get("compacted", {}))
    items = sorted(manifest["fragments"].items())
    new_fragments: dict = {}
    pending: list[tuple[str, dict]] = []
    pending_rows = 0
    merged_idx = 0
    to_delete: list[str] = []

    def flush_pending():
        nonlocal pending, pending_rows, merged_idx
        if not pending:
            return
        if len(pending) == 1:  # nothing to merge — keep the original
            name, frag = pending[0]
            new_fragments[name] = frag
        else:
            tables = [pq.read_table(os.path.join(root, f["file"]))
                      for _, f in pending]
            merged = pa.concat_tables(tables)
            name = f"compact-{merged_idx:05d}-{merged.num_rows}"
            merged_idx += 1
            tmp = os.path.join(root, name + ".parquet.tmp")
            pq.write_table(merged, tmp, compression="zstd")
            os.replace(tmp, os.path.join(root, name + ".parquet"))
            new_fragments[name] = {
                "rows": merged.num_rows,
                "input_fingerprint": "compact:" + "+".join(
                    n for n, _ in pending),
                "file": name + ".parquet",
            }
            to_delete.extend(f["file"] for _, f in pending)
            compacted.update(
                (n, f["input_fingerprint"]) for n, f in pending)
        pending, pending_rows = [], 0

    for name, frag in items:
        if "dir" in frag:
            flush_pending()
            if frag.get("files") and len(frag["files"]) > 1:
                frag = _compact_dir_fragment(root, frag, target_rows,
                                             to_delete)
            new_fragments[name] = frag
            continue
        if frag["file"].endswith(".lance"):
            # real-Lance fragments version themselves; their compaction
            # story is lance.optimize, not the parquet merge
            flush_pending()
            new_fragments[name] = frag
            continue
        if frag["rows"] >= target_rows:
            flush_pending()
            new_fragments[name] = frag
            continue
        pending.append((name, frag))
        pending_rows += frag["rows"]
        if pending_rows >= target_rows:
            flush_pending()
    flush_pending()

    manifest = {"version": manifest["version"] + 1,
                "fragments": new_fragments, "compacted": compacted}
    _write_manifest(root, manifest)  # atomic swap — commit point
    for fname in to_delete:
        try:
            os.remove(os.path.join(root, fname))
        except FileNotFoundError:
            pass
    return manifest
