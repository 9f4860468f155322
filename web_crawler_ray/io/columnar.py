"""Columnar interchange sources/sinks: Apache ORC and Arrow IPC
(Feather v2) — the two zero-copy-adjacent formats pyarrow ships beside
parquet. Target-side additions on the engine's source/sink surface
(SURVEY.md §2.1 covers csv/json/xlsx/parquet/fwf/wds; ORC is the
remaining Hadoop-ecosystem columnar shape, Arrow IPC the remaining
in-memory interchange shape a reference user exporting to other tools
needs).

Both directions are distributed:

* ``write_orc`` / ``write_ipc`` — one file per block (distributed
  write ownership, same rule as the parquet/csv/fwf sinks, SURVEY
  §2.5 T6): each task serialises the Arrow table it already holds —
  zero row-level work, no driver materialisation.
* ``read_orc`` / ``read_ipc`` — ``ray.data.read_binary_files`` (one
  row per file, bytes stay in the object store) then one
  ``map_batches`` that decodes each file with the pyarrow reader and
  emits its rows as an Arrow table; no per-row Python, and a 100-file
  directory decodes as 100 parallel-schedulable rows.

Contract: Arrow-expressible schemas only (ORC additionally has no
unsigned ints — callers cast first; raise, never coerce silently).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _write_files(ds, path: str, ext: str, serialise) -> None:
    """One output file per input block; the owning task serialises the
    Arrow table it holds. Filenames are (pid, task, seq)-scoped so two
    concurrent writers can never collide (T6 write-ownership rule)."""
    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "rows": pa.array([], type=pa.int64())})
        fname = f"part-{os.getpid()}-{os.urandom(6).hex()}-" \
                f"{batch.num_rows}.{ext}"
        fpath = os.path.join(path, fname)
        serialise(batch, fpath)
        return pa.table({"path": [fpath],
                         "rows": pa.array([batch.num_rows], type=pa.int64())})

    # consume the manifest (one row per file) — tiny by construction
    ds.map_batches(write_block, batch_format="pyarrow").materialize()


def write_orc(ds, path: str) -> None:
    """Write ``ds`` as a directory of ORC files, one per block."""
    from pyarrow import orc

    _write_files(ds, path, "orc",
                 lambda t, p: orc.write_table(t, p))


def write_ipc(ds, path: str) -> None:
    """Write ``ds`` as a directory of Arrow IPC (Feather v2) files."""
    from pyarrow import feather

    _write_files(ds, path, "arrow",
                 lambda t, p: feather.write_feather(t, p))


def _read_files(path: str, decode):
    import ray.data as rd

    files = rd.read_binary_files(path)

    def decode_batch(batch: pa.Table) -> pa.Table:
        tables = [decode(pa.BufferReader(b.as_py()))
                  for b in batch.column("bytes")]
        tables = [t for t in tables if t.num_rows]
        if not tables:
            return decode(pa.BufferReader(batch.column("bytes")[0].as_py())
                          ).slice(0, 0)
        return pa.concat_tables(tables)

    return files.map_batches(decode_batch, batch_format="pyarrow")


def read_orc(path: str):
    """Read a directory of ORC files as a Dataset (one decode task per
    file-group; bytes never leave the object store undecoded)."""
    from pyarrow import orc

    return _read_files(path, lambda buf: orc.ORCFile(buf).read())


def read_ipc(path: str):
    """Read a directory of Arrow IPC (Feather v2) files as a Dataset."""
    from pyarrow import feather

    return _read_files(path, lambda buf: feather.read_table(buf))
