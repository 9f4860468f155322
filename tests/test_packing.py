"""Unit tests for training-sequence construction (stages/packing.py)
and corpus hygiene additions (drop_duplicate_blocks, quantile_gate) —
edge cases the sf0.001 oracle sweep can't hit deterministically."""

import numpy as np
import pandas as pd
import ray.data as rd

from web_crawler_ray.stages.aggregate import quantile_gate
from web_crawler_ray.stages.packing import chunk_documents, pack_sequences
from web_crawler_ray.stages.text_quality import drop_duplicate_blocks


def _docs(texts, start_id=0):
    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + len(texts), dtype=np.int64),
        "text": pd.Series(texts, dtype="object"),
    }))


class TestChunkDocuments:
    def test_basic_windows(self):
        ds = _docs(["a b c d e f g"])  # 7 tokens, window 3 stride 2
        out = chunk_documents(ds, window=3, stride=2).to_pandas()
        out = out.sort_values("chunk_idx").reset_index(drop=True)
        assert list(out["chunk_text"]) == [
            "a b c", "c d e", "e f g", "g"]
        assert list(out["n_tokens"]) == [3, 3, 3, 1]

    def test_empty_and_whitespace_docs_emit_nothing(self):
        out = chunk_documents(_docs(["", "   ", None])).to_pandas()
        assert len(out) == 0

    def test_doc_shorter_than_window(self):
        out = chunk_documents(_docs(["x y"]), window=10, stride=10).to_pandas()
        assert len(out) == 1
        assert out["chunk_text"][0] == "x y"
        assert out["n_tokens"][0] == 2

    def test_multispace_normalized_like_sql(self):
        # chunk_text is the token join, not a source substring
        out = chunk_documents(_docs(["a   b\tc"]), window=2,
                              stride=2).to_pandas()
        out = out.sort_values("chunk_idx").reset_index(drop=True)
        assert list(out["chunk_text"]) == ["a b", "c"]


class TestPackSequences:
    def test_conservation_and_boundaries(self):
        texts = [" ".join(f"t{i}" for i in range(n))
                 for n in [7, 0, 250, 3, 100, 41]]
        ds = _docs(texts)
        out = pack_sequences(ds, seq_len=64).to_pandas()
        # total packed tokens == total corpus tokens
        assert out["n_tokens"].sum() == 7 + 250 + 3 + 100 + 41
        # zero-token doc emits nothing
        assert 1 not in set(out["doc_id"])
        # every sequence except the last is exactly full
        per_chunk = out.groupby("chunk_id")["n_tokens"].sum().sort_index()
        assert (per_chunk.iloc[:-1] == 64).all()
        assert per_chunk.iloc[-1] <= 64
        # sequences are contiguous from 0
        assert list(per_chunk.index) == list(range(len(per_chunk)))

    def test_matches_serial_reference(self):
        rng = np.random.default_rng(7)
        lens = rng.integers(0, 40, size=200)
        texts = [" ".join("w" for _ in range(n)) for n in lens]
        ds = _docs(texts)
        out = pack_sequences(ds, seq_len=17).to_pandas()
        out = out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        # serial replay
        rows = []
        off = 0
        for d, n in enumerate(lens):
            if n == 0:
                off += 0
                continue
            for c in range(off // 17, (off + n - 1) // 17 + 1):
                rows.append((d, c, min((c + 1) * 17, off + n) - max(c * 17, off)))
            off += n
        ref = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "n_tokens"])
        assert len(out) == len(ref)
        assert (out.to_numpy() == ref.to_numpy()).all()

    def test_bucket_boundaries_respect_global_order(self):
        # ids straddling several buckets (shift=2 → bucket width 4)
        ds = _docs(["a b c"] * 10)
        out = pack_sequences(ds, seq_len=10, bucket_shift=2).to_pandas()
        out = out.sort_values(["doc_id", "chunk_id"])
        # 30 tokens → 3 sequences; doc 3 (tokens 9..11) spans seqs 0 and 1
        d3 = out[out["doc_id"] == 3]
        assert list(d3["chunk_id"]) == [0, 1]
        assert list(d3["n_tokens"]) == [1, 2]


class TestDropDuplicateBlocks:
    def test_cross_doc_duplicates_removed(self):
        ds = _docs([
            "dup dup dup unique one two",   # blocks: "dup dup dup", "unique one two"
            "dup dup dup other words here",
            "all fresh text in this doc",
        ])
        out = drop_duplicate_blocks(ds, block=3, min_count=2).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        assert list(out["n_blocks"]) == [2, 2, 2]
        assert list(out["n_dup_blocks"]) == [1, 1, 0]
        assert out["text_deduped"][0] == "unique one two"
        assert out["text_deduped"][2] == "all fresh text in this doc"

    def test_all_dup_doc_becomes_empty(self):
        ds = _docs(["same same", "same same"])
        out = drop_duplicate_blocks(ds, block=2, min_count=2).to_pandas()
        assert (out["text_deduped"] == "").all()
        assert (out["n_dup_blocks"] == 1).all()

    def test_within_doc_repeats_count(self):
        # the same block twice inside ONE doc reaches min_count
        ds = _docs(["x y x y fresh pair"])
        out = drop_duplicate_blocks(ds, block=2, min_count=2).to_pandas()
        assert out["n_dup_blocks"][0] == 2
        assert out["text_deduped"][0] == "fresh pair"

    def test_empty_doc_omitted(self):
        ds = _docs(["", "a b"])
        out = drop_duplicate_blocks(ds, block=2).to_pandas()
        assert list(out["doc_id"]) == [1]


class TestQuantileGate:
    def test_all_equal_keeps_everything(self):
        ds = rd.from_pandas(pd.DataFrame({"id": range(5), "v": [3] * 5}))
        out = quantile_gate(ds, "v", 0.9).to_pandas()
        assert len(out) == 5

    def test_lt_is_complement(self):
        df = pd.DataFrame({"id": range(100),
                           "v": np.arange(100, dtype=np.int64)})
        ds = rd.from_pandas(df)
        hi = quantile_gate(ds, "v", 0.75).to_pandas()
        lo = quantile_gate(ds, "v", 0.75, keep="lt").to_pandas()
        assert len(hi) + len(lo) == 100
        assert set(hi["id"]) | set(lo["id"]) == set(range(100))
        # DuckDB quantile_disc(0.75) over 0..99 = element at rank
        # ceil(0.75*100)-1 = 74
        assert hi["v"].min() == 74
