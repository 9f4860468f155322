"""Composite corpus-curation flagship: the end-to-end training-data
prep flow a 100-TB crawl feeds — quality gate → exact dedup →
stratified language rebalance → per-language corpus stats — built
entirely from the proven single-op stages and fully SQL-replayable.

Scale shape (the reason this is one pipeline, not four):

1. ``annotate`` runs per-batch and streaming: tokenize once
   (``\\S+``), md5 the text, apply the quality gate, then DROP the
   text column — everything downstream (including the only shuffle)
   carries ~50 bytes/row of fixed-width metadata, never page text.
2. The exact dedup is the single all-to-all: coarse hash partitions
   on ``content_hash`` with a map-side combiner, so the shuffle moves
   at most one row per (batch, hash).
3. The stratified sample is pure hash arithmetic per row — stateless,
   no shuffle, stable under any repartitioning.
4. The final stats are a map-side partial agg + tiny combine (one row
   per (lang, batch) crosses the wire).
"""

from __future__ import annotations

import pandas as pd

from ..functions import text as T
from ..stages.aggregate import partial_grouped_agg
from ..stages.dedup import add_content_hash
from ..stages.grouped import partitioned_drop_duplicates
from ..stages.sampling import stratified_sample
from ..functions.rounding import sql_round


def annotate_and_gate(min_tokens: int = 25, max_chars_per_token: float = 8.0,
                      text_col: str = "text"):
    """Per-batch: n_tokens (``\\S+`` count) + md5 content hash, apply
    the quality gate (enough tokens, sane chars/token ratio — the
    boilerplate/binary-junk filter), then drop the text so only
    metadata flows downstream. Arrow-native: the batch is pulled
    zero-copy from the object store, token counts come from the C++
    ``count_substring_regex`` kernel (verified identical to the former
    pandas ``str.findall().len()``), and only the kept rows'
    METADATA columns ever materialize."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    pattern = T.TOKEN_RE.pattern

    def fn(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        n_tokens = pc.count_substring_regex(text, pattern).cast(pa.int64())
        hashed = add_content_hash(pa.table({text_col: text}), text_col)
        nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
        nc = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            # NaN comparisons yield False → zero-token rows drop
            keep = (nt >= min_tokens) & (nc / nt < max_chars_per_token)
        out = batch.drop_columns([text_col])
        out = out.append_column("n_tokens", n_tokens)
        out = out.append_column("content_hash", hashed["content_hash"])
        return out.filter(pa.array(keep))

    return fn


def curate_corpus(ds, rates: dict[str, float], default_rate: float,
                  min_tokens: int = 25, max_chars_per_token: float = 8.0,
                  id_col: str = "doc_id", lang_col: str = "lang",
                  n_rows_hint: int | None = None):
    """documents(doc_id, text, lang, n_chars) → curated row-level
    dataset (doc_id, lang, n_chars, n_tokens, content_hash): quality
    gate → min-id-wins exact dedup → per-language hash downsample."""
    gated = ds.map_batches(
        annotate_and_gate(min_tokens, max_chars_per_token), batch_format="pyarrow"
    )
    deduped = partitioned_drop_duplicates(
        gated, ["content_hash"], sort_keys=["content_hash", id_col],
        pre_dedup=True, n_rows_hint=n_rows_hint,
    )
    return stratified_sample(deduped, id_col, lang_col, rates,
                             default_rate=default_rate)


def corpus_stats(curated, lang_col: str = "lang"):
    """Per-language curation report: docs kept, total tokens, avg doc
    length — the numbers a data-mixture decision reads."""
    g = partial_grouped_agg(
        curated, [lang_col],
        {"n_docs": ("count", None), "total_tokens": ("sum", "n_tokens"),
         "sum_chars": ("sum", "n_chars")},
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        batch["avg_chars"] = sql_round(batch["sum_chars"] / batch["n_docs"], 2)
        return batch.drop(columns=["sum_chars"])

    return g.map_batches(finish, batch_format="pandas")
