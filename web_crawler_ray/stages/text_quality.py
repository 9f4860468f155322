"""Corpus-hygiene operators for LLM training-data curation: pattern
redaction, repeated-n-gram scoring, benchmark decontamination.

No reference counterpart (the reference is a scraper) — these are the
safety/quality stages a 100-TB pipeline runs between dedup and the
sink. All three are MAP-ONLY over the corpus: redaction and repetition
never shuffle at all; decontamination broadcasts the (benchmark-sized)
gram set once via the object store instead of shuffling the corpus.

Tokenization is ``\\S+`` — the exact expression the DuckDB oracles
replay with ``regexp_extract_all`` — and both redaction engines speak
RE2 (pyarrow and DuckDB), so pattern semantics agree by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import sql_round
from .grouped import grouped_triu
from ..functions.text import TOKEN_RE


def redact_patterns(ds, patterns: dict[str, str], text_col: str = "text",
                    out_col: str = "text_redacted"):
    """PII/pattern scrub: every match of each named RE2 pattern is
    replaced by ``[NAME]``; per-pattern match counts (on the ORIGINAL
    text) come back as ``n_<name>`` int64 columns. Patterns apply in
    sorted-name order so the engine and the SQL replay agree when
    patterns overlap. Arrow-native C++ kernels
    (``count_substring_regex`` / ``replace_substring_regex``), zero
    shuffle — streams at any scale."""
    import pyarrow.compute as pc

    names = sorted(patterns)

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        counts = {n: pc.count_substring_regex(text, patterns[n]).cast(pa.int64())
                  for n in names}
        red = text
        for n in names:
            red = pc.replace_substring_regex(red, patterns[n],
                                             f"[{n.upper()}]")
        out = batch.append_column(out_col, red)
        for n in names:
            out = out.append_column(f"n_{n}", counts[n])
        return out

    return ds.map_batches(fn, batch_format="pyarrow")


def _doc_ngrams(texts: list, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Token n-grams for a batch of documents, loop-free over grams:
    tokens are flattened once, gram strings come from ``n`` shifted
    object-array concats, and document boundaries are masked via the
    repeated doc-index array. Returns (grams, gram_doc_idx,
    tokens_per_doc)."""
    toks_list = [TOKEN_RE.findall(t or "") for t in texts]
    lens = np.array([len(t) for t in toks_list], dtype=np.int64)
    if lens.sum() < n:
        return (np.array([], dtype=object), np.array([], dtype=np.int64),
                lens)
    flat = np.concatenate([np.asarray(t, dtype=object)
                           for t in toks_list if t])
    doc_idx = np.repeat(np.arange(len(lens)), lens)
    m = len(flat) - (n - 1)
    valid = doc_idx[:m] == doc_idx[n - 1:]
    grams = flat[:m]
    for k in range(1, n):
        grams = grams + " " + flat[k:m + k]
    return grams[valid], doc_idx[:m][valid], lens


def repetition_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                     n: int = 3, ndigits: int = 6):
    """Per-document repeated-n-gram ratio, 1 − distinct/total (0.0 when
    the document has fewer than ``n`` tokens) — the boilerplate /
    template-spam quality signal. One map pass, no shuffle; emits
    (id_col, n_<n>grams, rep_ratio)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = list(batch[text_col])
        grams, gdoc, lens = _doc_ngrams(texts, n)
        total = np.maximum(lens - (n - 1), 0)
        distinct = np.zeros(len(lens), dtype=np.int64)
        if len(grams):
            uni = pd.DataFrame({"d": gdoc, "g": grams}).groupby("d")["g"].nunique()
            distinct[uni.index.to_numpy()] = uni.to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(total > 0,
                             1.0 - distinct / total.astype(np.float64), 0.0)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_trigrams" if n == 3 else f"n_{n}grams":
                total.astype("int64"),
            "rep_ratio": sql_round(pd.Series(ratio), ndigits),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")


def _doc_blocks(texts: list, block: int) -> tuple[list, np.ndarray]:
    """Disjoint ``block``-token blocks per document (trailing partial
    block included). Returns (list-of-block-strings-per-doc,
    blocks_per_doc)."""
    out, counts = [], np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = TOKEN_RE.findall(t or "")
        blks = [" ".join(toks[j:j + block])
                for j in range(0, len(toks), block)]
        counts[i] = len(blks)
        out.append(blks)
    return out, counts


def drop_duplicate_blocks(ds, text_col: str = "text", id_col: str = "doc_id",
                          block: int = 8, min_count: int = 2,
                          num_partitions: int = 32):
    """Corpus-level duplicated-span removal (the C4/CCNet "drop lines
    repeated across the corpus" stage, over disjoint ``block``-token
    blocks since the corpus is single-line text): any block whose exact
    string occurs >= ``min_count`` times ACROSS THE WHOLE CORPUS is
    removed from every document. Emits one row per document with >= 1
    block: (id_col, n_blocks, n_dup_blocks, text_deduped) where
    ``text_deduped`` is the ' '-join of the surviving blocks in order.

    Shape: pass A ships (block-string, partial count) into one coarse
    combine shuffle (batch-local pre-combine caps volume at per-batch
    distinct blocks); only blocks with global count >= min_count — the
    duplicated TAIL, tiny relative to the corpus — come back to the
    driver and broadcast once via ``ray.put``; pass B is map-only.
    Past ~10^7 duplicated blocks, swap the broadcast for a bloom probe
    + hash semi-join verify (the ``bloom_semi_join`` shape) — the text
    column never enters a shuffle either way."""
    import ray

    from .grouped import partitioned_apply

    src = ds.select_columns([id_col, text_col])

    def emit_blocks(batch: pd.DataFrame) -> pd.DataFrame:
        blks, _ = _doc_blocks(list(batch[text_col]), block)
        flat = [b for doc in blks for b in doc]
        s = pd.Series(flat, dtype="object").value_counts(sort=False)
        return pd.DataFrame({"blk": s.index.to_numpy(),
                             "n": s.to_numpy().astype("int64")})

    def count_partition(p: pd.DataFrame) -> pd.DataFrame:
        g = p.groupby("blk", sort=False)["n"].sum()
        g = g[g >= min_count]
        return pd.DataFrame({"blk": g.index.to_numpy()})

    dup_ds = partitioned_apply(src.map_batches(emit_blocks,
                                               batch_format="pandas"),
                               ["blk"], count_partition, num_partitions)
    dup_set: set = set()
    for b in dup_ds.iter_batches(batch_format="pandas"):
        dup_set.update(b["blk"])
    ref = ray.put(dup_set)

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        dset = ray.get(ref)
        blks, counts = _doc_blocks(list(batch[text_col]), block)
        ids = batch[id_col].to_numpy()
        keep = counts > 0
        n_dup = np.zeros(len(blks), dtype=np.int64)
        texts = []
        for i, doc in enumerate(blks):
            if not doc:
                texts.append("")
                continue
            survive = [b for b in doc if b not in dset]
            n_dup[i] = len(doc) - len(survive)
            texts.append(" ".join(survive))
        return pd.DataFrame({
            id_col: ids[keep],
            "n_blocks": counts[keep],
            "n_dup_blocks": n_dup[keep],
            "text_deduped": pd.Series(texts, dtype="object")[keep].to_numpy(),
        })

    return src.map_batches(scrub, batch_format="pandas")


def decontaminate(ds, bench_ds, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3):
    """Benchmark decontamination: per corpus document, how many of its
    DISTINCT token n-grams appear in the benchmark's (deduplicated)
    n-gram set. Returns (id_col, n_hits) for contaminated documents
    only.

    Shape: the benchmark grams stream batch-by-batch into one driver
    set (eval suites are small — the set is benchmark-sized, not
    corpus-sized), then broadcast ONCE via ``ray.put``; the corpus pass
    is map-only with a vectorized membership probe. Past ~10^7
    benchmark grams switch to a hash semi-join on the gram key (the
    ``bloom_semi_join`` shape) — the corpus side never shuffles either
    way."""
    import ray

    bench_grams: set = set()
    for b in bench_ds.select_columns([text_col]).map_batches(
            lambda x: pd.DataFrame(
                {"g": pd.unique(_doc_ngrams(list(x[text_col]), n)[0])}),
            batch_format="pandas").iter_batches(batch_format="pandas"):
        bench_grams.update(b["g"])
    ref = ray.put(bench_grams)

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        grams, gdoc, _ = _doc_ngrams(list(batch[text_col]), n)
        ids = batch[id_col].to_numpy()
        if not len(grams):
            return pd.DataFrame({id_col: pd.Series([], dtype=ids.dtype),
                                 "n_hits": pd.Series([], dtype="int64")})
        bset = ray.get(ref)
        pairs = pd.DataFrame({"d": gdoc, "g": grams}).drop_duplicates()
        hit = pairs[pairs["g"].isin(bset)]
        cnt = hit.groupby("d").size()
        return pd.DataFrame({id_col: ids[cnt.index.to_numpy()],
                             "n_hits": cnt.to_numpy().astype("int64")})

    return ds.select_columns([id_col, text_col]).map_batches(
        probe, batch_format="pandas")

def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, w: int = 4):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): slide a ``w``-wide window over the document's token
    ``k``-gram sequence and keep each window's MINIMUM gram — the
    selection function is lexicographic (binary-collation) min over the
    gram STRINGS instead of min-of-hash, so a DuckDB oracle can replay
    it exactly (``list_min`` compares UTF-8 bytes; Python compares code
    points — identical order). Guarantees of winnowing hold unchanged:
    any shared substring of >= w+k-1 tokens yields a shared
    fingerprint.

    Map-only, no shuffle: emits DISTINCT (id_col, fp) rows. The window
    minimum is one ``np.minimum`` reduce over ``w`` shifted views of
    the batch-flattened gram array (no per-doc loop); document
    boundaries are masked with the repeated doc-index array, the same
    kernel shape as ``_doc_ngrams``."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        d, fp = winnow_batch(list(batch[text_col]), k, w)
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({id_col: ids[d] if len(d)
                             else pd.Series([], dtype=ids.dtype),
                             "fp": fp})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pandas")


def winnow_batch(texts: list, k: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """The batch winnowing kernel (property-tested against the per-doc
    reference): returns (doc_index, fingerprint) pairs, distinct per
    document."""
    grams, gdoc, _ = _doc_ngrams(texts, k)
    m = len(grams) - (w - 1)
    if m <= 0:
        return (np.array([], dtype=np.int64), np.array([], dtype=object))
    valid = gdoc[:m] == gdoc[w - 1:]
    mins = grams[:m].copy()
    for j in range(1, w):
        np.minimum(mins, grams[j:j + m], out=mins)
    fps = pd.DataFrame({"d": gdoc[:m][valid],
                        "fp": mins[valid]}).drop_duplicates()
    return (fps["d"].to_numpy(np.int64), fps["fp"].to_numpy())


def winnow_dup_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3, w: int = 4, min_shared: int = 2,
                     max_bucket: int | None = None,
                     num_partitions: int = 32):
    """Substring-duplication candidate pairs by shared winnowing
    fingerprints: docs sharing >= ``min_shared`` distinct fingerprints.
    Returns (id_a, id_b, n_shared), id_a < id_b.

    Shape: the only payload that shuffles is (fp, doc_id) — texts never
    leave the map stage. One coarse hash partition on fp emits pairs
    per fingerprint group (vectorized triu per group, one pass per
    partition); a second partition on the pair key sums multiplicities
    into n_shared with a map-side combiner. ``max_bucket`` (None = keep
    all, required for oracle parity) drops fingerprint groups larger
    than the cap at scale — a hot fingerprint is boilerplate and a
    g**2 pair blow-up; the C4-style fix is dropping the gram, not
    pairing it."""
    from .grouped import partitioned_apply

    fps = winnow_fingerprints(ds, text_col=text_col, id_col=id_col, k=k, w=w)

    def emit_pairs(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values(["fp", id_col], kind="mergesort")
        ids = part[id_col].to_numpy()
        keys = part["fp"].to_numpy()
        # size-class triu broadcasting; oversized buckets are dropped
        # (boilerplate fingerprints — see docstring)
        ia, ib = grouped_triu(keys, max_size=max_bucket)
        if not len(ia):
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        return (pd.DataFrame({"id_a": ids[ia].astype("int64"),
                              "id_b": ids[ib].astype("int64")})
                .groupby(["id_a", "id_b"], sort=False).size()
                .rename("n").reset_index())

    pair_counts = partitioned_apply(fps, ["fp"], emit_pairs,
                                    num_partitions=num_partitions)

    def combine(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.groupby(["id_a", "id_b"], sort=False)["n"].sum()
                .reset_index())

    def finish(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(["id_a", "id_b"], sort=False)["n"].sum()
        g = g[g >= min_shared].rename("n_shared").reset_index()
        return g

    return partitioned_apply(pair_counts, ["id_a", "id_b"], finish,
                             num_partitions=8, pre_combine=combine)


def cdc_chunk_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                    k: int = 4, base: int = 31, mod: int = 1 << 20,
                    mask: int = 63):
    """Content-defined chunking statistics (the FastCDC/rsync family):
    a cut point is every position whose k-gram polynomial hash
    ``Σ code_j · base^(k-1-j) mod mod`` satisfies ``hash & mask == 0``
    — boundaries move WITH the content, so an insertion only reshapes
    the chunks around it (the property that makes storage-level dedup
    survive edits; Muthitacharoen et al., LBFS SOSP'01).

    Per batch the whole text column becomes ONE code array + doc
    offsets; the k shifted multiply-adds are vectorized across every
    document at once, windows crossing doc boundaries are masked, and
    cut counts reduce per doc — no per-char Python. Expected chunk
    length ≈ mask+1 chars. Character codes are latin-1 (== ord for
    code points < 256; the SQL replay uses ``ascii()`` which matches
    on this corpus' ASCII text). Map-only, zero shuffle; output one
    row per doc: n_chars, n_cuts, n_chunks."""
    powers = [pow(base, k - 1 - j, mod) for j in range(k)]

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = [(t or "") for t in batch[text_col]]
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        total = int(lens.sum())
        if total == 0:
            return pd.DataFrame({
                id_col: batch[id_col].astype("int64"),
                "n_chars": lens, "n_cuts": np.zeros(len(lens), np.int64),
                "n_chunks": (lens > 0).astype("int64"),
            })
        codes = np.frombuffer("".join(texts).encode("latin-1"),
                              dtype=np.uint8).astype(np.int64)
        doc_ids = np.repeat(np.arange(len(lens)), lens)
        # k-gram hash at window start positions 0..total-k
        n_win = total - k + 1
        if n_win <= 0:
            h = np.zeros(0, dtype=np.int64)
            win_doc = np.zeros(0, dtype=np.int64)
            valid = np.zeros(0, dtype=bool)
        else:
            h = np.zeros(n_win, dtype=np.int64)
            for j, p in enumerate(powers):
                h = (h + codes[j:j + n_win] * p) % mod
            # a window is in-doc iff its first and last char share a doc
            win_doc = doc_ids[:n_win]
            valid = win_doc == doc_ids[k - 1:]
        cut = valid & ((h & mask) == 0)
        n_cuts = np.bincount(win_doc[cut], minlength=len(lens)).astype(np.int64)
        return pd.DataFrame({
            id_col: batch[id_col].astype("int64"),
            "n_chars": lens,
            "n_cuts": n_cuts,
            "n_chunks": n_cuts + (lens > 0).astype(np.int64),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pandas")
