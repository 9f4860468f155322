"""BPE tokenizer training over a document corpus, Ray-Data-first.

Classic byte-pair-encoding training (Sennrich et al. 2016, public
algorithm) operates on the WORD VOCABULARY, not the corpus: the
distributed part is a word-frequency count (map-side combiner + one
coarse hash shuffle via ``grouped_sum``), after which the merge loop
runs on the driver over the top-V vocabulary — a few thousand
(word, count) rows regardless of corpus size. That split is exactly
how production tokenizer training scales: the 100-TB pass is the
count; the merge loop is O(V · word_len · merges).

The top-V selection itself is distributed (partial top-V per batch →
one V-row merge), so the driver never sees the full vocabulary of a
web-scale corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round
from .graph import grouped_sum

_WORD_RE = re.compile(r"[a-z]+")


def word_vocab(ds, text_col: str = "text", top_v: int = 5000) -> pd.DataFrame:
    """Top-V lowercase word frequencies, ordered (count desc, word asc).

    One exploded (word, 1) pass with batch-local pre-combine, one
    coarse hash shuffle of (word, partial_count) rows, then a
    distributed top-V merge — the corpus text never shuffles.
    """

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[text_col].str.lower().str.findall(_WORD_RE).explode().dropna()
        return pd.DataFrame({"word": words.to_numpy(), "n": np.int64(1)})

    counts = grouped_sum(
        ds.select_columns([text_col]).map_batches(explode, batch_format="pandas"),
        "word", "n", "n",
    )

    def top(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(["n", "word"], ascending=[False, True],
                                  kind="mergesort")
        return batch.head(top_v)

    out = (counts.map_batches(top, batch_format="pandas")
           .repartition(1).map_batches(top, batch_format="pandas").to_pandas())
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def bpe_merges(ds, text_col: str = "text", num_merges: int = 8,
               top_v: int = 5000) -> pd.DataFrame:
    """Train ``num_merges`` BPE merges: each step picks the most
    frequent adjacent symbol pair across the (weighted) vocabulary and
    fuses it. Deterministic tie-break: highest count, then
    lexicographically smallest (left, right). Returns one row per merge
    with rank, the pair, the fused token, and the pair's frequency.
    ``</w>`` marks word ends, as in the published algorithm.
    """
    vocab = word_vocab(ds, text_col, top_v)
    words = [tuple(w) + ("</w>",) for w in vocab["word"]]
    counts = vocab["n"].to_list()

    rows = []
    for rank in range(1, num_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in zip(words, counts):
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic argmax: max count, then smallest pair
        best_n = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_n)
        fused = best[0] + best[1]
        rows.append({"rank": np.int64(rank), "left": best[0], "right": best[1],
                     "merged": fused, "n": np.int64(best_n)})
        new_words = []
        for syms in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append(tuple(out))
        words = new_words
    return pd.DataFrame(rows, columns=["rank", "left", "right", "merged", "n"])


def bpe_encode(ds, merges: pd.DataFrame, text_col: str = "text",
               id_col: str = "doc_id", ndigits: int = 6,
               extra_cols: list[str] | None = None):
    """Apply trained merges to the corpus — the inference half of the
    tokenizer (train with ``bpe_merges``). Per document emits
    (id_col, n_words, n_tokens, tokens_per_word): ``n_tokens`` is the
    post-merge symbol count (``</w>`` markers fused into their word's
    last symbol are counted once, as in the published algorithm).

    Shape: the merge table is a few-KB closure constant (broadcast by
    value with the task); each batch encodes its DISTINCT lowercase
    words once and maps counts back through the word column — encode
    cost scales with per-batch vocabulary, not token count. Map-only,
    no shuffle."""
    merge_list = list(zip(merges["left"], merges["right"], merges["merged"]))

    def encode_word(word: str) -> int:
        syms = list(word) + ["</w>"]
        for left, right, fused in merge_list:
            i, out = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        # </w> surviving unfused is a word-boundary marker, not a token
        return len(syms) - (1 if syms and syms[-1] == "</w>" else 0)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch[text_col].fillna("").str.lower().str.findall(_WORD_RE)
        flat = words.explode().dropna()
        memo: dict[str, int] = {}
        for w in pd.unique(flat):
            memo[w] = encode_word(w)
        tok = flat.map(memo).groupby(level=0).sum()
        n_words = words.str.len().astype("int64")
        n_tokens = pd.Series(np.zeros(len(batch), dtype=np.int64),
                             index=batch.index)
        n_tokens.loc[tok.index] = tok.astype("int64")
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = np.where(n_words > 0, n_tokens / n_words, 0.0)
        out = pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_words": n_words.to_numpy(),
            "n_tokens": n_tokens.to_numpy(),
            "tokens_per_word": sql_round(pd.Series(ratio), ndigits),
        })
        for c in extra_cols or []:
            out[c] = batch[c].to_numpy()
        return out

    return ds.select_columns([id_col, text_col, *(extra_cols or [])]
                             ).map_batches(fn, batch_format="pandas")
