"""Training-sequence construction over a document corpus: fixed-window
chunking (map-only) and GPT-style concat-and-chunk sequence packing
(global token prefix sum via bucketed two-pass).

No reference counterpart (the reference is a scraper) — these are the
last stages of an LLM training-data pipeline, turning curated documents
into fixed-length training sequences.

Tokenization is ``\\S+`` everywhere so the DuckDB oracles replay the
exact same token boundaries with ``regexp_extract_all``.

Scale notes:
- :func:`chunk_documents` never shuffles; output rows ≈ tokens/stride.
- :func:`pack_sequences` needs a GLOBAL exclusive prefix sum of token
  counts in doc_id order. Doing that with a full sort would be an
  all-to-all over the corpus; instead doc ids are range-bucketed
  (``doc_id >> bucket_shift``), per-bucket token totals come back from
  one metadata-only combine (16 B/doc into the shuffle, batch-local
  pre-combine), the driver prefix-sums the BUCKET totals (one int per
  4096 ids — 10^9 docs → ~244k ints) and broadcasts the bucket base
  offsets; a second metadata-only shuffle co-locates each bucket so the
  intra-bucket prefix is an in-partition sorted cumsum. Text never
  enters either shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.text import TOKEN_RE
from .grouped import partitioned_apply


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    window: int = 64, stride: int = 64):
    """Split every document into token windows of ``window`` tokens
    starting every ``stride`` tokens (stride < window → overlapping
    chunks, the usual eval-context shape). Emits one row per chunk:
    (id_col, chunk_idx, n_tokens, chunk_text). Documents with zero
    tokens emit nothing. Map-only, zero shuffle — streams at any scale.

    ``chunk_text`` is the ``' '``-join of the window's tokens (identical
    to DuckDB ``array_to_string(toks[a:b], ' ')``), so the oracle
    replays it bit-for-bit regardless of the source whitespace."""
    if stride < 1 or window < 1:
        raise ValueError("window and stride must be >= 1")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        toks_list = [TOKEN_RE.findall(t or "") for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_list], dtype=np.int64)
        n_chunks = -(-lens // stride)  # ceil(n/stride); 0 stays 0
        ids = np.repeat(batch[id_col].to_numpy(), n_chunks)
        # chunk_idx within each doc: global arange minus each doc's start
        total = int(n_chunks.sum())
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=starts[1:])
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts[:-1], n_chunks)
        doc_of = np.repeat(np.arange(len(lens)), n_chunks)
        s = idx * stride
        e = np.minimum(s + window, lens[doc_of])
        texts = [" ".join(toks_list[d][a:b])
                 for d, a, b in zip(doc_of, s, e)]
        return pd.DataFrame({
            id_col: ids,
            "chunk_idx": idx,
            "n_tokens": (e - s).astype("int64"),
            "chunk_text": pd.Series(texts, dtype="object"),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")


def _token_counts_ds(ds, text_col: str, id_col: str):
    """(id_col, n_tok) metadata dataset — one Arrow-native map pass
    (``count_substring_regex(text, '\\S+')`` ≡ ``len(findall)``)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.fill_null(batch[text_col], ""), r"\S+").cast(pa.int64())
        return pa.table({id_col: batch[id_col], "n_tok": n})

    return ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow")


def pack_sequences(ds, text_col: str = "text", id_col: str = "doc_id",
                   seq_len: int = 256, bucket_shift: int = 12,
                   num_partitions: int = 32):
    """Concat-and-chunk packing plan: documents are laid end-to-end in
    ``id_col`` order into one global token stream, which is cut into
    sequences of exactly ``seq_len`` tokens. Emits one row per
    (document, sequence) overlap: (id_col, chunk_id, n_tokens) —
    i.e. how many of the document's tokens land in each training
    sequence. Zero-token documents emit nothing.

    Requires unique integer ``id_col``. The global exclusive prefix sum
    is computed with bucket bases (see module docstring) — both passes
    ship only (id, n_tok); the text column never leaves the first map.
    """
    import ray

    # Both passes consume the (id, n_tok) metadata; materialize it once
    # so the corpus read + tokenize does NOT re-execute for pass 2
    # (16 B/doc in the object store — node-sized at any corpus scale,
    # vs re-reading the text which is the whole corpus).
    meta = _token_counts_ds(ds, text_col, id_col).materialize()

    # pass 1: per-bucket token totals (batch-local combine, coarse shuffle)
    def add_bucket(p: pd.DataFrame) -> pd.DataFrame:
        p = p.copy()
        p["__bucket"] = (p[id_col].to_numpy().astype(np.int64)
                         >> bucket_shift)
        return p

    def bucket_pre(p: pd.DataFrame) -> pd.DataFrame:
        p = add_bucket(p)
        return (p.groupby("__bucket", sort=False)["n_tok"].sum()
                .rename("n_tok").reset_index())

    def bucket_sum(p: pd.DataFrame) -> pd.DataFrame:
        return (p.groupby("__bucket", sort=True)["n_tok"].sum()
                .rename("tot").reset_index())

    parts = partitioned_apply(meta, ["__bucket"], bucket_sum,
                              num_partitions,
                              pre_combine=bucket_pre)
    # bucket totals are tiny (one row per 2^bucket_shift ids): driver
    # prefix-sum, then broadcast the base offsets once.
    acc: pd.Series | None = None
    for b in parts.iter_batches(batch_format="pandas"):
        s = b.groupby("__bucket")["tot"].sum()  # coalesced batches may
        acc = s if acc is None else acc.add(s, fill_value=0)  # repeat keys
    if acc is None or not len(acc):
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            id_col: pd.Series([], dtype="int64"),
            "chunk_id": pd.Series([], dtype="int64"),
            "n_tokens": pd.Series([], dtype="int64")}))
    acc = acc.sort_index()
    bases = acc.cumsum().shift(fill_value=0).astype(np.int64)
    base_ref = ray.put((bases.index.to_numpy(np.int64),
                        bases.to_numpy(np.int64)))

    # pass 2: co-locate each bucket, intra-bucket sorted cumsum, explode
    # (one vectorized pass per partition — no per-bucket Python)
    def explode(p: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                              "chunk_id": pd.Series([], dtype="int64"),
                              "n_tokens": pd.Series([], dtype="int64")})
        p = p.sort_values(["__bucket", id_col], kind="mergesort")
        n = p["n_tok"].to_numpy(np.int64)
        buckets = p["__bucket"].to_numpy(np.int64)
        intra = p.groupby("__bucket", sort=False)["n_tok"].cumsum().to_numpy(
            np.int64) - n
        bk, bv = ray.get(base_ref)
        off = intra + bv[np.searchsorted(bk, buckets)]
        keep = n > 0
        n, off = n[keep], off[keep]
        ids = p[id_col].to_numpy()[keep]
        if not len(n):
            return empty
        c0 = off // seq_len
        c1 = (off + n - 1) // seq_len
        reps = (c1 - c0 + 1).astype(np.int64)
        tot = int(reps.sum())
        starts = np.zeros(len(reps) + 1, dtype=np.int64)
        np.cumsum(reps, out=starts[1:])
        k = np.arange(tot, dtype=np.int64) - np.repeat(starts[:-1], reps)
        d = np.repeat(np.arange(len(reps)), reps)
        chunk = c0[d] + k
        lo = np.maximum(chunk * seq_len, off[d])
        hi = np.minimum((chunk + 1) * seq_len, off[d] + n[d])
        return pd.DataFrame({
            id_col: np.repeat(ids, reps),
            "chunk_id": chunk.astype("int64"),
            "n_tokens": (hi - lo).astype("int64"),
        })

    meta_b = meta.map_batches(add_bucket, batch_format="pandas")
    return partitioned_apply(meta_b, ["__bucket"], explode, num_partitions)
