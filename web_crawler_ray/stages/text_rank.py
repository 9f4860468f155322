"""BM25 keyword search over a document corpus — the lexical-retrieval
counterpart to ``stages/similarity.py``'s embedding ANN (training-data
pipelines filter/select corpus slices by keyword relevance all the
time; target-side addition, no reference counterpart).

Shape at 100 TB: pass 1 streams the corpus once and ships one tiny
(#terms+2)-value partial per batch (document frequencies, doc count,
total token count) — the exchanged state is O(batches × terms),
corpus-size-independent. The per-term IDFs and the average document
length are then broadcast into pass 2, which scores each batch
vectorized and emits only its local top-k; the driver merges ≤ k rows
per batch. No shuffle at all — both passes are map-only.

Tokenization is ``[a-z0-9]+`` over lowercased text, exactly
replayable in SQL as ``regexp_extract_all(lower(text), '[a-z0-9]+')``
so the whole operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..functions.rounding import sql_round

TOK_RE = re.compile(r"[a-z0-9]+")

K1 = 1.2
B = 0.75


def _term_freqs(texts: list[str], terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc term-frequency matrix (docs × terms) and doc
    lengths: one regex pass per doc, then one ``==`` mask + bincount per
    term over the flattened token array — no per-token Python."""
    toks_per_doc = [TOK_RE.findall((t or "").lower()) for t in texts]
    dl = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    n = len(texts)
    if dl.sum() == 0:
        return np.zeros((n, len(terms)), dtype=np.int64), dl
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks_per_doc if t])
    doc_ids = np.repeat(np.arange(n), dl)
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    for j, term in enumerate(terms):
        mask = flat == term
        if mask.any():
            tf[:, j] = np.bincount(doc_ids[mask], minlength=n)
    return tf, dl


def bm25_search(ds, text_col: str, id_col: str, terms: list[str], k: int = 10,
                ndigits: int = 4) -> pd.DataFrame:
    """Exact BM25 top-k (Robertson/Sparck-Jones, the `+1` idf variant):
    score(d) = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
                 · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl)).

    Two streaming map-only passes (see module docstring); ties at equal
    rounded score break by ascending ``id_col`` on both engine and
    oracle sides."""
    terms = sorted(set(terms))

    def stats_partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _term_freqs(list(batch[text_col]), terms)
        row = {"n_docs": np.int64(len(batch)), "total_len": dl.sum()}
        for j in range(len(terms)):
            row[f"df_{j}"] = np.int64((tf[:, j] > 0).sum())
        return pd.DataFrame([row])

    # prune to the columns each pass reads: the per-batch pandas
    # conversion then never touches unrelated payload columns
    stats_in = ds.select_columns([text_col])
    ds = ds.select_columns([id_col, text_col])
    totals: pd.Series | None = None
    for b in stats_in.map_batches(stats_partial, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        s = b.sum()
        totals = s if totals is None else totals + s
    n_docs = float(totals["n_docs"])
    avgdl = float(totals["total_len"]) / n_docs
    idf = np.array([
        math.log((n_docs - float(totals[f"df_{j}"]) + 0.5)
                 / (float(totals[f"df_{j}"]) + 0.5) + 1.0)
        for j in range(len(terms))
    ])

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        tf, dl = _term_freqs(list(batch[text_col]), terms)
        tf_f = tf.astype(np.float64)
        norm = K1 * (1.0 - B + B * dl[:, None] / avgdl)
        score = ((tf_f * (K1 + 1.0)) / (tf_f + norm) * idf[None, :]).sum(axis=1)
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(),
                            "score": sql_round(pd.Series(score), ndigits)})
        out = out[tf.sum(axis=1) > 0]
        return out.sort_values(["score", id_col], ascending=[False, True],
                               kind="mergesort").head(k)

    partials = ds.map_batches(score_topk, batch_format="pandas").to_pandas()
    return (partials.sort_values(["score", id_col], ascending=[False, True],
                                 kind="mergesort")
            .head(k).reset_index(drop=True))


def top_bigrams(ds, text_col: str, k: int = 20):
    """Top-k token bigrams by corpus count — n-gram statistics for
    corpus analysis / contamination checks. Per batch: one regex
    tokenize pass, bigrams by shifted object-array concat with
    document-boundary positions masked out, exact partial counts; one
    tiny combine shuffle (one row per distinct bigram per batch), then
    a driver top-k over the combined counts (bounded by distinct
    bigrams — for open-vocabulary corpora cap with heavy_hitters
    instead). Deterministic ties: ascending bigram."""
    from .graph import grouped_sum

    ds = ds.select_columns([text_col])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks_per_doc if t])
        # position of each token's doc; a bigram is valid iff both
        # halves belong to the same document
        doc_ids = np.repeat(np.arange(len(lens)), lens)
        same_doc = doc_ids[:-1] == doc_ids[1:]
        bigrams = (flat[:-1] + " " + flat[1:])[same_doc]
        vc = pd.Series(bigrams).value_counts(sort=False)
        return pd.DataFrame({"bigram": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    # coarse-partitioned sum, NOT Dataset.groupby().aggregate(): bigram
    # cardinality is vocabulary², where the native groupby's
    # per-key-task shape degrades ~100× past 10^4 keys
    combined = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"),
        "bigram", "n", "n",
    ).to_pandas()
    return (combined.sort_values(["n", "bigram"], ascending=[False, True],
                                 kind="mergesort")
            .head(k).reset_index(drop=True))


def tfidf_keywords(ds, text_col: str, id_col: str, top: int = 3,
                   ndigits: int = 6) -> "pd.DataFrame | object":
    """Per-document keyword extraction: the ``top`` tokens by
    tf·idf = tf · ln(N/df), ties by ascending token. Pass 1 computes
    exact document frequencies (one row per batch-distinct token
    crosses the combine shuffle) plus the doc count; the df table is
    broadcast (vocabulary-sized — bounded for natural-language corpora;
    for open vocabularies semi-join the df table instead) into a pass-2
    per-batch vectorized scorer that keeps each document's top ``top``.
    Map-only except the tiny df combine — output streams."""
    import math

    import ray
    from ray.data.aggregate import Sum

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [set(TOK_RE.findall((t or "").lower()))
                        for t in batch[text_col]]
        all_toks = [t for s in toks_per_doc for t in s]
        if not all_toks:
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype="int64"),
                                 "nd": pd.Series([], dtype="int64")})
        vc = pd.Series(all_toks).value_counts(sort=False)
        out = pd.DataFrame({"tok": vc.index.to_numpy(),
                            "df": vc.to_numpy().astype("int64")})
        out["nd"] = 0
        out.loc[out.index[0], "nd"] = len(batch)
        return out

    dfs = (ds.select_columns([text_col])
           .map_batches(df_partial, batch_format="pandas")
           .groupby("tok").aggregate(Sum("df", alias_name="df"),
                                     Sum("nd", alias_name="nd"))
           .to_pandas())
    n_docs = float(dfs["nd"].sum())
    vocab = dfs["tok"].to_numpy()
    order = np.argsort(vocab)
    vocab_sorted = vocab[order]
    idf_sorted = np.log(n_docs / dfs["df"].to_numpy(dtype=np.float64))[order]
    ref = ray.put((vocab_sorted, idf_sorted))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        vs, idfs = ray.get(ref)
        rows_id, rows_tok, rows_s = [], [], []
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        ids = batch[id_col].to_numpy()
        for i, toks in enumerate(toks_per_doc):
            if not toks:
                continue
            vc = pd.Series(toks).value_counts(sort=False)
            tk = vc.index.to_numpy()
            pos = np.searchsorted(vs, tk)
            s = vc.to_numpy(dtype=np.float64) * idfs[pos]
            d = pd.DataFrame({"tok": tk, "s": s}).sort_values(
                ["s", "tok"], ascending=[False, True], kind="mergesort").head(top)
            rows_id.extend([ids[i]] * len(d))
            rows_tok.extend(d["tok"])
            rows_s.extend(d["s"])
        return pd.DataFrame({id_col: pd.Series(rows_id, dtype="int64"),
                             "token": pd.Series(rows_tok, dtype=object),
                             "tfidf": sql_round(pd.Series(rows_s, dtype="float64"),
                                                ndigits)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def vocab_coverage(ds, text_col: str, id_col: str, vocab_size: int = 100,
                   ndigits: int = 6):
    """Tokenizer-prep statistics: build the top-``vocab_size`` token
    vocabulary by exact corpus count (ties: ascending token), then one
    map-only pass computing each document's out-of-vocabulary token
    fraction. Emits (id, n_tokens, n_oov, oov_ratio) for documents with
    ≥1 token.

    Shape: token counts move through ONE coarse combine shuffle (one
    row per distinct token per batch); the vocabulary — vocab_size
    rows — is broadcast once; the corpus pass never shuffles."""
    import ray

    from .graph import grouped_sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [t for txt in batch[text_col]
                for t in TOK_RE.findall((txt or "").lower())]
        vc = pd.Series(toks, dtype="object").value_counts(sort=False)
        return pd.DataFrame({"token": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = grouped_sum(
        ds.select_columns([text_col]).map_batches(partial,
                                                  batch_format="pandas"),
        "token", "n", "n").to_pandas()
    vocab = (counts.sort_values(["n", "token"], ascending=[False, True],
                                kind="mergesort")
             .head(vocab_size)["token"])
    ref = ray.put(set(vocab))

    def cover(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(ref)
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        n = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        oov = np.array([sum(1 for t in doc if t not in v)
                        for doc in toks_per_doc], dtype=np.int64)
        keep = n > 0
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_tokens": n[keep],
            "n_oov": oov[keep],
            "oov_ratio": sql_round(
                pd.Series(oov[keep] / n[keep].astype(np.float64)), ndigits),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        cover, batch_format="pandas")


def unigram_logprob(ds, text_col: str, id_col: str, vocab_size: int = 100,
                    ndigits: int = 6):
    """CCNet-style LM quality proxy: per-document mean unigram token
    log-probability under the corpus's own top-``vocab_size`` unigram
    model (OOV floored at count 1). Low scores = rare-token-heavy /
    boilerplate-ish documents — the cheap stand-in for a KenLM
    perplexity filter, exactly SQL-replayable (count ratios + ln).

    Shape mirrors :func:`vocab_coverage`: exact token counts through
    one coarse combine shuffle, the V-row model broadcast once, then a
    map-only scoring pass (flat token map + ``np.add.reduceat`` — no
    per-token Python)."""
    import ray

    from .graph import grouped_sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = [t for txt in batch[text_col]
                for t in TOK_RE.findall((txt or "").lower())]
        vc = pd.Series(toks, dtype="object").value_counts(sort=False)
        return pd.DataFrame({"token": vc.index.to_numpy(),
                             "n": vc.to_numpy().astype("int64")})

    counts = grouped_sum(
        ds.select_columns([text_col]).map_batches(partial,
                                                  batch_format="pandas"),
        "token", "n", "n").to_pandas()
    total = float(counts["n"].sum())
    vocab = counts.sort_values(["n", "token"], ascending=[False, True],
                               kind="mergesort").head(vocab_size)
    ref = ray.put((dict(zip(vocab["token"], vocab["n"].astype(float))),
                   total))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        v, nn = ray.get(ref)
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        n = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        keep = n > 0
        flat = pd.Series([t for doc in toks_per_doc for t in doc],
                         dtype="object")
        lp = np.log(flat.map(v).fillna(1.0).to_numpy(np.float64) / nn)
        starts = np.zeros(int(keep.sum()), dtype=np.int64)
        np.cumsum(n[keep][:-1], out=starts[1:])
        sums = np.add.reduceat(lp, starts) if len(lp) else np.array([])
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_tokens": n[keep],
            "logprob": sql_round(pd.Series(sums / n[keep]), ndigits),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def pmi_bigrams(ds, text_col: str, k: int = 20, min_count: int = 5,
                ndigits: int = 6) -> pd.DataFrame:
    """Top-k collocations by pointwise mutual information,
    ``pmi = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) )`` over corpus
    bigram/unigram counts (Church & Hanks 1990) — the statistic that
    separates real collocations ("hong kong") from merely-frequent
    pairs top_bigrams keeps.

    One tokenize pass emits BOTH unigram and bigram partial counts
    (kind-prefixed key so a single coarse grouped_sum combines them);
    the shuffle carries one row per (batch, distinct term). PMI is
    computed on the driver over the combined vocabulary-bounded count
    table (same boundedness note as top_bigrams; cap with
    heavy_hitters for open vocabularies). Rare pairs below
    ``min_count`` are dropped before ranking; ties break ascending by
    bigram."""
    from .graph import grouped_sum

    ds = ds.select_columns([text_col])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"key": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks_per_doc if t])
        doc_ids = np.repeat(np.arange(len(lens)), lens)
        same_doc = doc_ids[:-1] == doc_ids[1:]
        bigrams = (flat[:-1] + " " + flat[1:])[same_doc]
        uc = pd.Series(np.char.add("u\x1f", flat.astype(str))).value_counts(sort=False)
        bc = pd.Series(np.char.add("b\x1f", bigrams.astype(str))).value_counts(sort=False)
        return pd.DataFrame({
            "key": np.concatenate([uc.index.to_numpy(), bc.index.to_numpy()]),
            "n": np.concatenate([uc.to_numpy(), bc.to_numpy()]).astype("int64"),
        })

    combined = grouped_sum(
        ds.map_batches(partial, batch_format="pandas"), "key", "n", "n",
    ).to_pandas()
    kind = combined["key"].str.slice(0, 1)
    uni = combined[kind == "u"]
    unigram = dict(zip(uni["key"].str.slice(2), uni["n"].astype(float)))
    n_uni = float(uni["n"].sum())
    bi = combined[kind == "b"].copy()
    bi["bigram"] = bi["key"].str.slice(2)
    bi = bi[bi["n"] >= min_count]
    if bi.empty:
        return pd.DataFrame({"bigram": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})
    n_bi = float(combined[kind == "b"]["n"].sum())
    halves = bi["bigram"].str.split(" ", n=1, expand=True)
    ca = halves[0].map(unigram).to_numpy(np.float64)
    cb = halves[1].map(unigram).to_numpy(np.float64)
    cab = bi["n"].to_numpy(np.float64)
    pmi = np.log((cab / n_bi) / ((ca / n_uni) * (cb / n_uni)))
    out = pd.DataFrame({"bigram": bi["bigram"].to_numpy(),
                        "n": bi["n"].astype("int64").to_numpy(),
                        "pmi": sql_round(pd.Series(pmi), ndigits)})
    return (out.sort_values(["pmi", "bigram"], ascending=[False, True],
                            kind="mergesort")
            .head(k).reset_index(drop=True))


def chi2_terms(ds, text_col: str, label_col: str, terms: list[str],
               k: int = 20, ndigits: int = 6) -> pd.DataFrame:
    """Chi-squared term-vs-label feature selection: for each candidate
    term and each label, the one-vs-rest 2×2 presence test
    ``chi2 = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`` over document
    counts (a = docs with term ∧ label, …) — the standard supervised
    feature-selection screen (Manning/Raghavan/Schütze IR ch. 13)
    for "which tokens characterize which language/source slice".

    The candidate list is explicit and bounded, so each batch ships one
    (terms × labels) presence-count partial plus per-label doc counts;
    the combine is cardinality-independent of the corpus. All chi2
    doubles are pure functions of four integers — exactly replayable
    in SQL. Output: top-k (term, label) by chi2 desc, ties ascending
    (term, label)."""
    from .aggregate import partial_grouped_agg

    terms = sorted(set(terms))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        tf, _dl = _term_freqs(list(batch[text_col]), terms)
        present = tf > 0
        labels = batch[label_col].astype(str).to_numpy()
        codes, uniq = pd.factorize(labels, use_na_sentinel=False)
        rows = []
        for li, lab in enumerate(uniq):
            mask = codes == li
            rows.append(pd.DataFrame({
                "term": terms,
                "label": lab,
                "n_tl": present[mask].sum(axis=0).astype("int64"),
                "n_l": np.int64(mask.sum()),
            }))
        return pd.concat(rows, ignore_index=True)

    cells = partial_grouped_agg(
        ds.select_columns([text_col, label_col]).map_batches(
            partial, batch_format="pandas"),
        ["term", "label"],
        {"n_tl": ("sum", "n_tl"), "n_l": ("sum", "n_l")},
    ).to_pandas().sort_values(["term", "label"], kind="mergesort")

    # n_l was emitted once per (term, label) partial row, so the sum
    # over batches double-counts it |terms| times per batch only if a
    # term column were collapsed — it is keyed by (term, label), so
    # each (term, label) row's n_l is the true per-label count summed
    # over batches. Marginals:
    n_t = cells.groupby("term")["n_tl"].transform("sum").to_numpy(np.float64)
    nn = float(cells.groupby("label")["n_l"].first().sum())
    a = cells["n_tl"].to_numpy(np.float64)
    n_l = cells["n_l"].to_numpy(np.float64)
    b = n_t - a
    c = n_l - a
    d = nn - n_t - n_l + a
    # exact same expression tree as the SQL oracle (left-assoc
    # products): the operands are exact integers in float64 but the
    # products can pass 2^53, where evaluation ORDER decides the final
    # ulp — keep both sides identical.
    diff = a * d - b * c
    denom = ((n_t * (nn - n_t)) * n_l) * (nn - n_l)
    chi2 = np.where(denom > 0,
                    ((nn * diff) * diff) / np.where(denom > 0, denom, 1.0),
                    0.0)
    out = pd.DataFrame({"term": cells["term"].to_numpy(),
                        "label": cells["label"].to_numpy(),
                        "n_docs": cells["n_tl"].astype("int64").to_numpy(),
                        "chi2": sql_round(pd.Series(chi2), ndigits)})
    return (out.sort_values(["chi2", "term", "label"],
                            ascending=[False, True, True], kind="mergesort")
            .head(k).reset_index(drop=True))


def bigram_lm_score(ds, text_col: str, id_col: str, lam: float = 0.7,
                    ndigits: int = 6):
    """Interpolated bigram language-model score per document (the
    KenLM-shaped upgrade of ``unigram_logprob``): mean over positions
    i ≥ 2 of ``ln(λ·P(w_i|w_{i-1}) + (1−λ)·P(w_i))`` with
    ``P(w|v) = c(v w)/Σ_x c(v x)`` and ``P(w) = c(w)/N`` — the corpus
    scores itself, so every looked-up count exists (no OOV smoothing
    term needed; the unigram interpolation still regularizes rare
    continuations).

    One tokenize pass emits unigram and bigram partials (the
    ``pmi_bigrams`` kernel); head counts derive from the bigram table;
    the three count tables broadcast once (vocabulary-bounded, same
    note as the other text models) into a map-only scoring pass.
    Documents with fewer than 2 tokens are dropped (no positions)."""
    import ray

    from .graph import grouped_sum

    counts_in = ds.select_columns([text_col])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"key": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks_per_doc if t])
        doc_ids = np.repeat(np.arange(len(lens)), lens)
        same_doc = doc_ids[:-1] == doc_ids[1:]
        bigrams = (flat[:-1] + " " + flat[1:])[same_doc]
        uc = pd.Series(np.char.add("u\x1f", flat.astype(str))).value_counts(sort=False)
        bc = pd.Series(np.char.add("b\x1f", bigrams.astype(str))).value_counts(sort=False)
        return pd.DataFrame({
            "key": np.concatenate([uc.index.to_numpy(), bc.index.to_numpy()]),
            "n": np.concatenate([uc.to_numpy(), bc.to_numpy()]).astype("int64"),
        })

    combined = grouped_sum(
        counts_in.map_batches(partial, batch_format="pandas"),
        "key", "n", "n").to_pandas()
    kind = combined["key"].str.slice(0, 1)
    uni = combined[kind == "u"]
    c_uni = dict(zip(uni["key"].str.slice(2), uni["n"].astype(float)))
    n_uni = float(uni["n"].sum())
    bi = combined[kind == "b"].copy()
    bi["bg"] = bi["key"].str.slice(2)
    c_bi = dict(zip(bi["bg"], bi["n"].astype(float)))
    heads = bi["bg"].str.split(" ", n=1).str[0]
    c_head = bi.groupby(heads)["n"].sum().astype(float).to_dict()
    ref = ray.put((c_bi, c_head, c_uni, n_uni))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cb, ch, cu, nn = ray.get(ref)
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        n = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        keep = n >= 2
        if not keep.any():
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "n_bigrams": pd.Series(dtype="int64"),
                                 "lm_score": pd.Series(dtype="float64")})
        flat = np.concatenate(
            [np.asarray(t, dtype=object) for t, k in zip(toks_per_doc, keep) if k])
        nk = n[keep]
        doc_ids = np.repeat(np.arange(len(nk)), nk)
        same_doc = doc_ids[:-1] == doc_ids[1:]
        heads_f = flat[:-1][same_doc]
        tails_f = flat[1:][same_doc]
        bgs = pd.Series(heads_f + " " + tails_f, dtype="object")
        p_bi = bgs.map(cb).to_numpy(np.float64) / pd.Series(heads_f).map(ch).to_numpy(np.float64)
        p_uni = pd.Series(tails_f).map(cu).to_numpy(np.float64) / nn
        lp = np.log(lam * p_bi + (1.0 - lam) * p_uni)
        starts = np.zeros(int(keep.sum()), dtype=np.int64)
        np.cumsum(nk[:-1] - 1, out=starts[1:])
        sums = np.add.reduceat(lp, starts)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_bigrams": nk - 1,
            "lm_score": sql_round(pd.Series(sums / (nk - 1)), ndigits),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas")


def dsir_weights(ds, text_col: str, id_col: str, target_col: str,
                 target_value: str, vocab_size: int = 100,
                 ndigits: int = 6):
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every document by the mean per-token
    log-likelihood ratio ln p_target(w) − ln p_raw(w), where
    ``p_target`` is the unigram model of the rows with
    ``target_col == target_value`` and ``p_raw`` the model of the whole
    corpus. High scores = documents that look like the target domain —
    the cheap hashed-n-gram stand-in for the paper's feature space.

    Shape mirrors :func:`unigram_logprob`: ONE counting pass emits
    (token, n_raw, n_tgt) partials (the target counts ride the same
    rows, no second scan), one coarse combine builds both models, the
    top-``vocab_size``-by-raw-count vocab is broadcast once, and the
    scoring pass is map-only. Out-of-vocab (and vocab tokens absent
    from the target) floor at count 1 — the same convention as
    ``unigram_logprob``, so the replay is pure count ratios + ln."""
    import ray

    from .aggregate import partial_grouped_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        is_tgt = (batch[target_col] == target_value).to_numpy()
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame({"token": pd.Series([], dtype="object"),
                                 "n_raw": pd.Series([], dtype="int64"),
                                 "n_tgt": pd.Series([], dtype="int64")})
        f = pd.DataFrame({
            "token": pd.Series([t for doc in toks_per_doc for t in doc],
                               dtype="object"),
            "t": np.repeat(is_tgt, lens),
        })
        g = f.groupby("token", sort=False)["t"].agg(["size", "sum"])
        return pd.DataFrame({"token": g.index.to_numpy(),
                             "n_raw": g["size"].to_numpy().astype("int64"),
                             "n_tgt": g["sum"].to_numpy().astype("int64")})

    counts = partial_grouped_agg(
        ds.select_columns([text_col, target_col]).map_batches(
            partial, batch_format="pandas"),
        ["token"], {"n_raw": ("sum", "n_raw"), "n_tgt": ("sum", "n_tgt")},
    ).to_pandas()
    n_raw_tot = float(counts["n_raw"].sum())
    n_tgt_tot = float(counts["n_tgt"].sum())
    vocab = counts.sort_values(["n_raw", "token"], ascending=[False, True],
                               kind="mergesort").head(vocab_size)
    ref = ray.put((dict(zip(vocab["token"], vocab["n_raw"].astype(float))),
                   dict(zip(vocab["token"], vocab["n_tgt"].astype(float))),
                   n_raw_tot, n_tgt_tot))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        vr, vt, nr, nt = ray.get(ref)
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        n = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        keep = n > 0
        flat = pd.Series([t for doc in toks_per_doc for t in doc],
                         dtype="object")
        c_raw = flat.map(vr).fillna(1.0).to_numpy(np.float64)
        c_tgt = flat.map(vt).to_numpy(np.float64)
        c_tgt = np.where(np.isnan(c_tgt) | (c_tgt == 0.0), 1.0, c_tgt)
        llr = np.log(c_tgt / nt) - np.log(c_raw / nr)
        starts = np.zeros(int(keep.sum()), dtype=np.int64)
        np.cumsum(n[keep][:-1], out=starts[1:])
        sums = np.add.reduceat(llr, starts) if len(llr) else np.array([])
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy()[keep],
            "n_tokens": n[keep],
            "dsir_weight": sql_round(pd.Series(sums / n[keep]), ndigits),
        })

    return ds.select_columns([id_col, text_col, target_col]).map_batches(
        score, batch_format="pandas")


def vocab_growth(ds, text_col: str, id_col: str,
                 checkpoints: tuple = (100, 200, 300, 400, 500)):
    """Heaps'-law vocabulary-growth profile: at each corpus-prefix
    checkpoint (docs with id < c), the total token count N and the
    distinct vocabulary size V — the V ∝ N^β diagnostic that tells a
    tokenizer/dedup pipeline whether a corpus is still contributing
    new vocabulary or has gone repetitive.

    Shape: ONE pass emits per-batch (token, min doc id) partials plus
    fixed-size per-checkpoint token-count partials; the only exchange
    is token-cardinality sized (the first-seen min combine); V per
    checkpoint is a ≤len(checkpoints)-row fold. Integer-exact, so the
    SQL replay matches bit-for-bit."""
    from .grouped import partitioned_apply

    cps = np.asarray(sorted(checkpoints), dtype=np.int64)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        toks_per_doc = [TOK_RE.findall((t or "").lower())
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        f = pd.DataFrame({
            "token": pd.Series([t for doc in toks_per_doc for t in doc],
                               dtype="object"),
            "fd": np.repeat(ids, lens),
        })
        g = f.groupby("token", sort=False)["fd"].min()
        out = pd.DataFrame({"token": g.index.to_numpy(),
                            "fd": g.to_numpy().astype("int64"),
                            "ntok": np.int64(0)})
        # fixed-size token-total partial rows ride along (token = None)
        buckets = (ids[:, None] < cps[None, :])  # (docs, cps)
        tot = (lens[:, None] * buckets).sum(axis=0)
        ride = pd.DataFrame({"token": pd.Series([None] * len(cps),
                                                dtype="object"),
                             "fd": cps, "ntok": tot.astype("int64")})
        return pd.concat([out, ride], ignore_index=True)

    def combine(part: pd.DataFrame) -> pd.DataFrame:
        real = part[part["token"].notna()]
        g = real.groupby("token", sort=False)["fd"].min()
        fd = g.to_numpy()
        v = (fd[:, None] < cps[None, :]).sum(axis=0)
        ride = part[part["token"].isna()].groupby("fd")["ntok"].sum()
        n = np.zeros(len(cps), dtype=np.int64)
        for i, c in enumerate(cps):
            if c in ride.index:
                n[i] = ride.loc[c]
        return pd.DataFrame({"n_docs": cps, "v_partial": v.astype("int64"),
                             "n_partial": n})

    parts = partitioned_apply(
        ds.select_columns([id_col, text_col]).map_batches(
            partial, batch_format="pandas"),
        ["token"], combine).to_pandas()
    agg = parts.groupby("n_docs")[["v_partial", "n_partial"]].sum()
    return pd.DataFrame({
        "n_docs": agg.index.to_numpy().astype("int64"),
        "n_tokens": agg["n_partial"].to_numpy().astype("int64"),
        "n_distinct_tokens": agg["v_partial"].to_numpy().astype("int64"),
    })


def source_overlap(ds, text_col: str, group_col: str,
                   ndigits: int = 6) -> pd.DataFrame:
    """Cross-source vocabulary-overlap matrix: distinct-token Jaccard
    between every pair of sources — the corpus-composition diagnostic
    ('are these two sources near-copies of each other?') behind
    mixture planning and cross-source contamination checks.

    ONE pass emits (token, source) presence partials (per-batch
    dedup); one token-cardinality exchange collapses them to exact
    per-token source sets; each partition then contributes a
    (sources × sources) integer co-presence partial — the driver folds
    S² cells, never tokens. Jaccard from |A∩B| / (|A| + |B| − |A∩B|),
    integer counts shared with the SQL replay."""
    from .grouped import partitioned_apply

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [sorted(set(TOK_RE.findall((t or "").lower())))
                        for t in batch[text_col]]
        lens = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
        return pd.DataFrame({
            "token": pd.Series([t for doc in toks_per_doc for t in doc],
                               dtype="object"),
            "src": np.repeat(batch[group_col].to_numpy(), lens),
        }).drop_duplicates()

    def co_presence(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates()
        # per-token source list -> S×S co-presence counts, vectorized
        # via a pivoted 0/1 matrix (tokens × sources)
        m = (part.assign(one=1)
             .pivot_table(index="token", columns="src", values="one",
                          fill_value=0, aggfunc="max"))
        srcs = list(m.columns)
        mat = m.to_numpy(np.int64)
        co = mat.T @ mat  # (S, S): co[i, j] = tokens present in both
        ii, jj = np.meshgrid(np.arange(len(srcs)), np.arange(len(srcs)),
                             indexing="ij")
        return pd.DataFrame({
            "src_a": np.array(srcs, dtype=object)[ii.ravel()],
            "src_b": np.array(srcs, dtype=object)[jj.ravel()],
            "n_common": co.ravel(),
        })

    cells = partitioned_apply(
        ds.select_columns([text_col, group_col]).map_batches(
            partial, batch_format="pandas"),
        ["token"], co_presence).to_pandas()
    g = (cells.groupby(["src_a", "src_b"], sort=True)["n_common"].sum()
         .reset_index())
    solo = g[g["src_a"] == g["src_b"]].set_index("src_a")["n_common"]
    # zero-common pairs are dropped EXPLICITLY: whether such a pair ever
    # shares a partition pivot is partitioning-dependent, and the SQL
    # replay's inner join omits them anyway
    pairs = g[(g["src_a"] < g["src_b"])
              & (g["n_common"] > 0)].reset_index(drop=True)
    na = solo.loc[pairs["src_a"]].to_numpy(np.int64)
    nb = solo.loc[pairs["src_b"]].to_numpy(np.int64)
    inter = pairs["n_common"].to_numpy(np.int64)
    return pd.DataFrame({
        "src_a": pairs["src_a"],
        "src_b": pairs["src_b"],
        "n_common": inter,
        "jaccard": sql_round(pd.Series(
            inter / (na + nb - inter).astype(np.float64)), ndigits),
    })


def _pack_trigram(c0: int, c1: int, c2: int) -> int:
    """Injective trigram → int63 key: 3 codepoints, 21 bits each
    (max codepoint 0x10FFFF < 2^21)."""
    return (c0 << 42) | (c1 << 21) | c2


def _trigram_keys_batch(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """All trigram keys of a batch of (already-lowercased) texts, fully
    vectorized: one utf-32 decode of the concatenated batch, a sliding
    window over the codepoint array, and offset arithmetic to drop the
    windows that cross document boundaries. Returns (keys int64,
    doc_ordinal int64) — one row per trigram OCCURRENCE (dedup is the
    caller's job)."""
    lens = texts.str.len().to_numpy(np.int64)
    joined = "\x00\x00".join(texts.tolist())
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32) \
           .astype(np.int64)
    if len(cp) < 3:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    # doc i spans [starts[i], starts[i] + lens[i]); 2 separator slots
    # between docs. A window starting at s is inside doc i iff
    # starts[i] <= s <= starts[i] + lens[i] - 3 (exact — no reliance
    # on texts being NUL-free).
    starts = np.concatenate(([0], np.cumsum(lens[:-1] + 2)))
    w0 = cp[:-2]
    keys = (w0 << 42) | (cp[1:-1] << 21) | cp[2:]
    s = np.arange(len(keys), dtype=np.int64)
    di = np.searchsorted(starts, s, side="right") - 1
    valid = s <= starts[di] + lens[di] - 3
    return keys[valid], di[valid]


def build_trigram_index(ds, text_col: str, id_col: str, index_dir: str,
                        n_buckets: int = 64,
                        input_fingerprint: str | None = None) -> str:
    """Materialize a TRIGRAM POSTING index as hive-partitioned parquet
    (one directory per ``bucket = hash64(gram) % n_buckets``) — the
    lexical LIKE-pushdown counterpart of :func:`ivf_build_index`: build
    once, and every substring query reads ONLY its pattern's grams'
    bucket partitions (partition pruning at the read) instead of
    scanning the corpus.

    Postings are (bucket, gram_key, doc_id) with per-doc distinct
    grams (map-side dedup), so index size ∝ distinct (gram, doc)
    pairs — the classic inverted-index shape; the build is ONE map
    pass plus the hive-partitioned write's shuffle-free layout.
    ``gram_key`` packs the trigram's 3 codepoints (each < 2^21) into
    one int63 — an INJECTIVE encoding, so keys never collide and the
    whole shingle pass is numpy (utf-32 sliding window over the
    batch's concatenated text; no per-row Python). Idempotent via the
    same ``_BUILT.json`` fingerprint rule as the IVF index / lancelike
    sink."""
    import json
    import os
    import shutil

    marker = os.path.join(index_dir, "_BUILT.json")
    if input_fingerprint and os.path.exists(marker):
        meta = json.load(open(marker))
        if (meta.get("input_fingerprint") == input_fingerprint
                and meta.get("n_buckets") == n_buckets
                and meta.get("fmt") == 2):
            return index_dir
    if os.path.exists(index_dir):
        shutil.rmtree(index_dir)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        ids_in = batch[id_col].to_numpy(np.int64)
        keys, doc_idx = _trigram_keys_batch(
            batch[text_col].fillna("").str.lower())
        if not len(keys):
            return pd.DataFrame({
                "bucket": pd.Series(dtype="int64"),
                "gram_key": pd.Series(dtype="int64"),
                id_col: pd.Series(dtype="int64")})
        # per-doc distinct (map-side dedup): lexsort + first-occurrence
        order = np.lexsort((keys, doc_idx))
        d, k = doc_idx[order], keys[order]
        first = np.ones(len(k), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (k[1:] != k[:-1])
        d, k = d[first], k[first]
        return pd.DataFrame({"bucket": k % n_buckets, "gram_key": k,
                             id_col: ids_in[d]})

    ds.map_batches(postings, batch_format="pandas").write_parquet(
        index_dir, partition_cols=["bucket"])
    if input_fingerprint:
        with open(marker, "w") as f:
            json.dump({"input_fingerprint": input_fingerprint,
                       "n_buckets": n_buckets, "fmt": 2}, f)
    return index_dir


def trigram_search(docs_ds, index_dir: str, pattern: str, text_col: str,
                   id_col: str, n_buckets: int = 64,
                   num_partitions: int = 16) -> pd.DataFrame:
    """Substring (SQL ``LIKE '%pattern%'``, case-insensitive) search
    through the trigram index: candidates = docs containing ALL of the
    pattern's distinct trigrams (read only those grams' bucket
    partitions, count distinct grams per doc with a coarse-partitioned
    combine), then one verification pass over the candidate docs
    (broadcast sorted id array + vectorized ``str.contains``) removes
    trigram-coincidence false positives. Exact — the trigram filter
    has no false negatives for patterns ≥ 3 chars."""
    import os

    import ray
    import ray.data as rd

    from .grouped import partitioned_apply

    p = pattern.lower()
    if len(p) < 3:
        raise ValueError("trigram search needs a pattern of ≥ 3 chars")
    want = sorted({
        _pack_trigram(ord(p[i]), ord(p[i + 1]), ord(p[i + 2]))
        for i in range(len(p) - 2)
    })
    n_want = len(want)
    want_arr = np.asarray(want, dtype=np.int64)
    buckets = sorted({int(k) % n_buckets for k in want})
    paths = [
        os.path.join(index_dir, f"bucket={b}", f)
        for b in buckets
        if os.path.isdir(os.path.join(index_dir, f"bucket={b}"))
        for f in sorted(os.listdir(os.path.join(index_dir, f"bucket={b}")))
        if f.endswith(".parquet")
    ]
    if not paths:
        return pd.DataFrame({id_col: pd.Series(dtype="int64")})
    hits = rd.read_parquet(paths, columns=["gram_key", id_col]).map_batches(
        lambda b: b[np.isin(b["gram_key"].to_numpy(np.int64), want_arr)]
        [[id_col, "gram_key"]],
        batch_format="pandas",
    )

    def count_grams(part: pd.DataFrame) -> pd.DataFrame:
        g = part.groupby(id_col, sort=True)["gram_key"].nunique()
        full = g[g == n_want]
        return pd.DataFrame({id_col: full.index.to_numpy(np.int64)})

    cand = partitioned_apply(hits, [id_col], count_grams,
                             num_partitions).to_pandas()
    if cand.empty:
        return pd.DataFrame({id_col: pd.Series(dtype="int64")})
    cref = ray.put(np.sort(cand[id_col].to_numpy(np.int64)))

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(np.int64)
        wanted = ray.get(cref)
        pos = np.clip(np.searchsorted(wanted, ids), 0, len(wanted) - 1)
        m = wanted[pos] == ids
        sub = batch[m]
        ok = sub[text_col].str.lower().str.contains(p, regex=False)
        return pd.DataFrame({id_col: sub[id_col][ok].to_numpy(np.int64)})

    out = (docs_ds.select_columns([id_col, text_col])
           .map_batches(verify, batch_format="pandas").to_pandas())
    return out.sort_values(id_col, kind="mergesort").reset_index(drop=True)


def phrase_search(ds, id_col: str, text_col: str, phrase: list[str],
                  num_partitions: int = 16) -> pd.DataFrame:
    """Positional-inverted-index phrase query: documents containing the
    exact token sequence ``phrase`` (over the ``[a-z]+`` token stream
    of the lowercased text), with the occurrence count.

    The classic IR identity makes this a pure groupby: a phrase of m
    terms occurs at position p iff the posting (term_j, doc, p + j)
    exists for every j, i.e. iff the ADJUSTED positions pos − j of the
    phrase's postings agree; so occurrences = (doc, adj) cells whose
    distinct-term-slot count is m (Zobel & Moffat 2006, positional
    postings intersection).

    Shape: tokenize map-side and emit ONLY the phrase terms' postings
    (the query-time pushdown — the materialized-index sibling is
    ``build_trigram_index``'s hive layout, where the same pruning is a
    partition-pruned read); one co-locating exchange on doc, a
    vectorized nunique fold per partition. Postings volume ∝ the
    phrase terms' corpus frequency, never the corpus. Returns
    (doc_id, n_occ:int64) for matching docs."""
    from .grouped import partitioned_apply

    terms = [t.lower() for t in phrase]
    slot_of: dict[str, list[int]] = {}
    for j, t in enumerate(terms):
        slot_of.setdefault(t, []).append(j)
    m = len(terms)

    def postings(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(r"[a-z]+")
        ids = batch[id_col].to_numpy(np.int64)
        lens = toks.str.len().to_numpy(np.int64)
        doc = np.repeat(ids, lens)
        flat = pd.Series(
            [w for lst in toks for w in lst], dtype=object)
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(np.concatenate(([0], np.cumsum(lens[:-1]))),
                           lens))
        outs = []
        for t, slots in slot_of.items():
            hit = (flat == t).to_numpy()
            for j in slots:
                outs.append(pd.DataFrame({
                    "doc_id": doc[hit], "adj": pos[hit] - j,
                    "slot": np.full(int(hit.sum()), j, dtype=np.int64)}))
        out = pd.concat(outs, ignore_index=True) if outs else pd.DataFrame()
        if not len(out):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "adj": pd.Series(dtype="int64"),
                                 "slot": pd.Series(dtype="int64")})
        return out[out["adj"] >= 0]

    def fold(part: pd.DataFrame) -> pd.DataFrame:
        cells = (part.groupby(["doc_id", "adj"], sort=False)["slot"]
                 .nunique().reset_index(name="k"))
        occ = (cells[cells["k"] == m].groupby("doc_id", sort=False)
               .size().reset_index(name="n_occ"))
        return pd.DataFrame({"doc_id": occ["doc_id"].astype("int64"),
                             "n_occ": occ["n_occ"].astype("int64")})

    res = partitioned_apply(
        ds.select_columns([id_col, text_col]).map_batches(
            postings, batch_format="pandas"),
        ["doc_id"], fold, num_partitions=num_partitions).to_pandas()
    if "doc_id" not in res.columns:  # all-empty union drops the schema
        res = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                            "n_occ": pd.Series(dtype="int64")})
    return (res.sort_values("doc_id", kind="mergesort")
            .reset_index(drop=True))
