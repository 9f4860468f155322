"""Text-analysis map_batches stages over the documents table
(lang-ID, quality scoring, token counting, fingerprinting).

One actor-pool stage computes all per-document metrics in a single
pass (regexes compiled once per actor in __init__); emitting them
together avoids re-tokenizing per metric.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..functions import text as T


class TextMetrics:
    """documents(text, ...) → + n_tokens, n_bpe_tokens, lang_pred,
    quality, fingerprint."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        # tokenize ONCE per doc and share across metrics; quality's
        # per-char alpha ratio runs as one UTF-32 table pass over the
        # whole batch (quality_scores_batch ≡ scalar, property-tested)
        toks_list = [T.TOKEN_RE.findall(t or "") for t in texts]
        n_tok = [len(x) for x in toks_list]
        n_bpe = [T.bpe_token_count(t) for t in texts]
        langs = [T.lang_id(t) for t in texts]
        quality = T.quality_scores_batch(texts, toks_list)
        fps = [T.doc_fingerprint(t) for t in texts]
        return (
            batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))
            .append_column("lang_pred", pa.array(langs, pa.string()))
            .append_column("quality", pa.array(quality, pa.float64()))
            .append_column("fingerprint", pa.array(fps, pa.int64()))
        )


def token_count_column(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized whitespace token count matching the SQL oracle
    ``len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))``."""
    batch = batch.copy()
    batch["n_tokens"] = (
        batch[text_col].fillna("").str.findall(T.TOKEN_RE).str.len().astype("int64")
    )
    return batch
