"""Fixed-width text source + sink (the legacy-mainframe interchange
format: every column occupies a fixed byte range of the line, no
delimiters). Target-side addition on the engine's source/sink surface
(SURVEY.md §2.1 covers csv/json/xlsx/parquet; fixed-width is the
remaining plain-text shape a reference user migrating legacy feeds
needs).

Both directions are distributed and vectorized:

* ``write_fwf`` — one file per block (distributed write ownership,
  same rule as the parquet/csv sinks, SURVEY §2.5 T6): each batch is
  padded/formatted with vectorized pandas ``str`` kernels and written
  by the task that owns it.
* ``read_fwf`` — ``ray.data.read_text`` then one ``map_batches`` that
  slices the byte ranges with vectorized ``str.slice`` and casts per
  the declared schema; no per-row Python.

Contract: values must fit their widths (raise, never truncate
silently); string cells are right-padded with spaces and stripped on
read, so trailing-space payloads do not round-trip (documented —
same caveat as every fwf reader)."""

from __future__ import annotations

import os

import pandas as pd


def write_fwf(ds, path: str, widths: dict[str, int]) -> list[str]:
    """Write ``ds`` as fixed-width text, one ``part-*.txt`` per block.
    ``widths`` maps column → byte width, in output order. Returns the
    written file paths."""
    os.makedirs(path, exist_ok=True)
    cols = list(widths)

    def write_block(batch: pd.DataFrame, ctx=None) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "rows": pd.Series([], dtype="int64")})
        parts = []
        for c in cols:
            w = widths[c]
            s = batch[c].astype(str)
            too_wide = s.str.len() > w
            if bool(too_wide.any()):
                bad = s[too_wide].iloc[0]
                raise ValueError(
                    f"write_fwf: value {bad!r} exceeds width {w} of {c!r}")
            parts.append(s.str.pad(w, side="right"))
        lines = parts[0]
        for p in parts[1:]:
            lines = lines + p
        # block-owned filename: the block's content hash makes the name
        # deterministic and collision-free without driver coordination
        # (identical blocks collide onto identical bytes — harmless)
        import zlib
        payload = "\n".join(lines) + "\n"
        tag = zlib.crc32(payload.encode())
        fn = os.path.join(path, f"part-{tag:08x}-{len(lines)}.txt")
        with open(fn, "w", encoding="utf-8") as f:
            f.write(payload)
        return pd.DataFrame({"path": [fn], "rows": [len(batch)]})

    written = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return sorted(written["path"].tolist())


def read_fwf(path: str, widths: dict[str, int], dtypes: dict[str, str]):
    """Read fixed-width text written by :func:`write_fwf` (or any
    feed matching ``widths``) into a Dataset with ``dtypes`` (pandas
    dtype strings; str columns are right-stripped)."""
    import ray.data as rd

    cols = list(widths)
    offs = []
    pos = 0
    for c in cols:
        offs.append((c, pos, pos + widths[c]))
        pos += widths[c]

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        out = {}
        for c, lo, hi in offs:
            s = text.str.slice(lo, hi)
            dt = dtypes[c]
            if dt in ("str", "string", "object"):
                out[c] = s.str.rstrip()
            else:
                out[c] = s.str.strip().astype(dt)
        return pd.DataFrame(out)

    return rd.read_text(path).map_batches(parse, batch_format="pandas")
