"""Unit tests for stages/stats.py, sample_exact_k, and BPE training —
hand-computed small cases independent of the SQL-oracle parity suite."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from web_crawler_ray.stages.sampling import KNUTH, _FOLD, sample_exact_k
from web_crawler_ray.stages.stats import (
    contingency_assoc,
    group_ks_drift,
    group_mad_outliers,
)
from web_crawler_ray.stages.tokenizer import bpe_merges, word_vocab


def test_contingency_assoc_hand_case(ray_session):
    # 2x2 table: n = [[30, 10], [10, 50]]
    rows = (
        [{"a": "x", "b": "p"}] * 30 + [{"a": "x", "b": "q"}] * 10
        + [{"a": "y", "b": "p"}] * 10 + [{"a": "y", "b": "q"}] * 50
    )
    out = contingency_assoc(rd.from_pandas(pd.DataFrame(rows)), "a", "b")
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    assert out["n"].tolist() == [30, 10, 10, 50]
    # cell (x, p): N=100, na=40, nb=40 -> e=16, pmi=ln(100*30/1600)
    assert out.loc[0, "pmi"] == round(np.log(100.0 * 30 / (40.0 * 40)), 6)
    assert out.loc[0, "chi2_term"] == round((30 - 16.0) ** 2 / 16.0, 6)
    # independence sanity: chi2 terms all positive, pmi signs correct
    assert out.loc[1, "pmi"] < 0 < out.loc[3, "pmi"]


def test_group_mad_outliers_hand_case(ray_session):
    # group g: values 1..9 plus an extreme 1000
    vals = list(range(1, 10)) + [1000]
    df = pd.DataFrame({"k": ["g"] * 10, "v": [float(x) for x in vals]})
    out = group_mad_outliers(
        rd.from_pandas(df), "k", "v", c=3.0).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # median of sorted 10 values = (5+6)/2; devs from 5.5:
    # [4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,994.5] -> mad = (2.5+2.5)/2
    assert r["med"] == 5.5
    assert r["mad"] == 2.5
    assert r["n_out"] == 1  # only 1000 is beyond 3*2.5 of 5.5... check 1: |1-5.5|=4.5 <= 7.5


def test_group_ks_drift_hand_case(ray_session):
    # sample1 = {1,2,3,4}, sample2 = {3,4,5,6}: KS = 0.5 at v=2
    df = pd.DataFrame({
        "k": ["g"] * 8,
        "v": [1.0, 2.0, 3.0, 4.0, 3.0, 4.0, 5.0, 6.0],
        "early": [True] * 4 + [False] * 4,
    })
    out = group_ks_drift(rd.from_pandas(df), "k", "v", "early").to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["ks"] == 0.5
    assert out.iloc[0]["n1"] == 4 and out.iloc[0]["n2"] == 4


def test_sample_exact_k_properties(ray_session):
    ids = pd.DataFrame({"doc_id": np.arange(1, 1001, dtype=np.int64)})
    out = sample_exact_k(rd.from_pandas(ids), "doc_id", k=50).to_pandas()
    assert len(out) == 50
    assert out["doc_id"].is_unique
    # the selected hashes are exactly the 50 smallest over the domain
    h_all = ((ids["doc_id"].to_numpy() % _FOLD) * KNUTH) % (1 << 32)
    expect = np.sort(h_all)[:50]
    assert np.array_equal(np.sort(out["h"].to_numpy()), expect)
    # deterministic across runs
    out2 = sample_exact_k(rd.from_pandas(ids), "doc_id", k=50).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_bpe_merges_toy_vocab(ray_session):
    # Sennrich-style toy corpus: low x5, lower x2, newest x6, widest x3
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    ds = rd.from_pandas(pd.DataFrame({"text": [corpus]}))
    vocab = word_vocab(ds, "text", top_v=10)
    assert vocab.iloc[0]["word"] == "newest" and vocab.iloc[0]["n"] == 6
    out = bpe_merges(ds, "text", num_merges=3, top_v=10)
    assert out["rank"].tolist() == [1, 2, 3]
    # first merge: ('e','s') or ('s','t') both occur 9 times; ('e','s') is
    # lexicographically smaller -> picked first, then ('es','t') 9x
    assert (out.iloc[0]["left"], out.iloc[0]["right"]) == ("e", "s")
    assert out.iloc[0]["n"] == 9
    assert (out.iloc[1]["left"], out.iloc[1]["right"]) == ("es", "t")
    assert out.iloc[2]["merged"] == "est</w>"


def test_pq_adc_equals_reconstruction_distance(ray_session):
    """ADC distance over PQ codes must equal the exact squared L2 to
    the reconstructed vector (the PQ correctness invariant), and the
    ADC top-k must therefore match brute force over reconstructions."""
    from web_crawler_ray.stages.similarity import (
        pq_adc_topk, pq_encode, pq_recon_error, pq_train,
    )

    rng = np.random.default_rng(3)
    d, n, m, k = 16, 200, 4, 8
    vecs = rng.normal(size=(n, d)).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                       "embedding": [list(v) for v in vecs]})
    ds = rd.from_pandas(df)

    books = pq_train(ds, m=m, k=k, iterations=3)
    assert books.shape == (m, k, d // m)

    codes_df = pq_encode(ds, books).to_pandas().sort_values("vec_id")
    codes = np.frombuffer(b"".join(codes_df["codes"]), dtype=np.uint8).reshape(n, m)
    recon = books[np.arange(m)[None, :], codes].reshape(n, d)

    q = vecs[0]
    exact = ((recon - q) ** 2).sum(axis=1)
    top = pq_adc_topk(rd.from_pandas(codes_df), books, q, k_top=10).to_pandas()
    order = np.lexsort((np.arange(n), exact))[:10]
    assert top["vec_id"].tolist() == list(np.arange(n)[order])
    assert np.allclose(top["dist"].to_numpy(), exact[order], atol=1e-6)

    # training reduced error vs the 1-iteration (seed-only) codebooks
    seed_books = pq_train(ds, m=m, k=k, iterations=1)
    err_trained = pq_recon_error(ds, books)["mse"].sum()
    err_seed = pq_recon_error(ds, seed_books)["mse"].sum()
    assert err_trained <= err_seed


def test_bpe_encode_sennrich(ray_session):
    """Encoding with trained merges: merged symbols shrink the token
    count, untrained words stay character-length, and the per-word
    symbol count matches a hand-applied merge sequence."""
    from web_crawler_ray.stages.tokenizer import bpe_encode, bpe_merges

    corpus = pd.DataFrame({
        "doc_id": range(4),
        "text": ["low low low low low",
                 "lower lower",
                 "newest newest newest newest newest newest",
                 "widest widest widest"],
    })
    ds = rd.from_pandas(corpus)
    merges = bpe_merges(ds, "text", num_merges=10, top_v=100)
    out = (bpe_encode(ds, merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_words"].tolist() == [5, 2, 6, 3]

    def encode(word):
        syms = list(word) + ["</w>"]
        for left, right, fused in zip(merges["left"], merges["right"],
                                      merges["merged"]):
            i, o = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    o.append(fused); i += 2
                else:
                    o.append(syms[i]); i += 1
            syms = o
        return len(syms) - (1 if syms[-1] == "</w>" else 0)

    assert out["n_tokens"].tolist() == [
        5 * encode("low"), 2 * encode("lower"),
        6 * encode("newest"), 3 * encode("widest")]
    # the most frequent word compresses below its character length
    assert encode("newest") < len("newest")

    empty = bpe_encode(rd.from_pandas(pd.DataFrame(
        {"doc_id": [9], "text": [""]})), merges).to_pandas()
    assert empty["n_tokens"].tolist() == [0]
    assert empty["tokens_per_word"].tolist() == [0.0]


def test_triangle_count_known_graphs(ray_session):
    """K4 has 4 triangles and 4 oriented wedges; a star has wedges but
    no closures; co-occurrence edge build dedups across groups."""
    from web_crawler_ray.stages.graph import cooccurrence_edges, triangle_count

    def run(edges, gate):
        df = pd.DataFrame(edges, columns=["id_a", "id_b"])
        return (triangle_count(rd.from_pandas(df), broadcast_gate=gate)
                .to_pandas().iloc[0])

    for gate in (0, 1_000_000):  # both closure paths (shuffle/broadcast)
        k4 = run([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)], gate)
        assert (k4["n_edges"], k4["n_wedges"], k4["n_triangles"]) == (6, 4, 4)

        star = run([(1, 2), (1, 3), (1, 4)], gate)
        assert (star["n_edges"], star["n_wedges"],
                star["n_triangles"]) == (3, 3, 0)

    # huge ids overflow the 31-bit pack → broadcast path must defer to
    # the shuffle path and still be exact
    big = run([(1 << 40, 1 << 41), (1 << 40, 1 << 42), ((1 << 41), 1 << 42)],
              1_000_000)
    assert (big["n_edges"], big["n_wedges"], big["n_triangles"]) == (3, 1, 1)

    groups = pd.DataFrame({
        "g": [10, 10, 10, 20, 20, 20, 30],
        "item": [1, 2, 3, 2, 3, 4, 1],
    })
    e = (cooccurrence_edges(rd.from_pandas(groups).repartition(3), "g", "item")
         .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    # (2,3) occurs in both groups but is one edge
    assert [tuple(r) for r in e.to_numpy()] == [
        (1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    tri = triangle_count(rd.from_pandas(e)).to_pandas().iloc[0]
    assert tri["n_triangles"] == 2  # (1,2,3) and (2,3,4)

    import pytest
    with pytest.raises(ValueError):
        cooccurrence_edges(rd.from_pandas(pd.DataFrame(
            {"g": [1] * 40, "item": range(40)})), "g", "item",
            max_group=10).to_pandas()


def test_benford_profile_hand_case(ray_session):
    from web_crawler_ray.stages.stats import benford_profile

    # values whose leading digits (after *100 scaling) are known,
    # including exact powers of ten where float log10 needs the
    # integer correction: 10.00 -> 1000 -> digit 1, 99.99 -> 9999 -> 9
    df = pd.DataFrame({"x": [10.00, 99.99, 1.00, 0.01, 2.5, 25.0, 3.33]})
    out = benford_profile(rd.from_pandas(df), "x", scale=100)
    got = dict(zip(out["digit"], out["n_vals"]))
    # digits: 1000->1, 9999->9, 100->1, 1->1, 250->2, 2500->2, 333->3
    assert got == {1: 3, 2: 2, 3: 1, 9: 1}
    assert abs(float(out["share"].sum()) - 1.0) < 1e-5
    row1 = out[out["digit"] == 1].iloc[0]
    assert row1["expected"] == round(np.log10(2.0), 6)


def test_benford_power_of_ten_correction(ray_session):
    from web_crawler_ray.stages.stats import benford_profile

    # exact powers of ten at several magnitudes: every leading digit
    # must be exactly 1 (the naive float log10 path misassigns some)
    vals = [10.0 ** k for k in range(-2, 10)]
    out = benford_profile(rd.from_pandas(pd.DataFrame({"x": vals})), "x")
    assert out["digit"].tolist() == [1]
    assert int(out["n_vals"].iloc[0]) == len(vals)


def test_pmi_bigrams_hand_case(ray_session):
    from web_crawler_ray.stages.text_rank import pmi_bigrams

    # corpus: "a b" x4 in one doc-pattern, "a c" x4; unigrams a=8,b=4,c=4
    docs = pd.DataFrame({"t": ["a b", "a b", "a b", "a b",
                               "a c", "a c", "a c", "a c"]})
    out = pmi_bigrams(rd.from_pandas(docs), "t", k=10, min_count=1)
    # per doc one bigram -> N_bi=8, N_uni=16, c(a b)=4, c_a=8, c_b=4
    exp = round(np.log((4 / 8.0) / ((8 / 16.0) * (4 / 16.0))), 6)
    got = dict(zip(out["bigram"], out["pmi"]))
    assert got == {"a b": exp, "a c": exp}


def test_pmi_min_count_filter(ray_session):
    from web_crawler_ray.stages.text_rank import pmi_bigrams

    docs = pd.DataFrame({"t": ["x y"] * 5 + ["p q"]})
    out = pmi_bigrams(rd.from_pandas(docs), "t", k=10, min_count=2)
    assert out["bigram"].tolist() == ["x y"]


def test_chi2_terms_hand_case(ray_session):
    from web_crawler_ray.stages.text_rank import chi2_terms

    # 40 docs: term "hot" in 18/20 label-A docs and 2/20 label-B docs
    rows = ([{"text": "hot stuff", "lab": "A"}] * 18
            + [{"text": "cold stuff", "lab": "A"}] * 2
            + [{"text": "hot stuff", "lab": "B"}] * 2
            + [{"text": "cold stuff", "lab": "B"}] * 18)
    out = chi2_terms(rd.from_pandas(pd.DataFrame(rows)), "text", "lab",
                     ["hot"], k=10)
    # a=18 b=2 c=2 d=18, N=40: chi2 = 40*(18*18-2*2)^2/(20*20*20*20)
    exp = round(40.0 * (18.0 * 18 - 2.0 * 2) ** 2 / (20.0 ** 4), 6)
    got = {(r["term"], r["label"]): r["chi2"] for _, r in out.iterrows()}
    assert got[("hot", "A")] == exp
    assert got[("hot", "B")] == exp  # symmetric 2x2
    # "stuff" is in every doc -> chi2 0 if it were a candidate
    out2 = chi2_terms(rd.from_pandas(pd.DataFrame(rows)), "text", "lab",
                      ["stuff"], k=10)
    assert set(out2["chi2"]) == {0.0}


def test_token_budget_select_boundary_cut(ray_session):
    from web_crawler_ray.stages.sampling import token_budget_select

    # qualities 3,3,2,2,1 with tokens 4,4,4,4,4; budget 10 ->
    # both q=3 docs (8), then within q=2 only the lower id fits? 8+4=12>10
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                       "q": [3, 3, 2, 2, 1],
                       "tok": [4, 4, 4, 4, 4]})
    out = token_budget_select(rd.from_pandas(df), "id", "q", "tok",
                              budget=10).to_pandas()
    assert sorted(out["id"]) == [1, 2]
    # budget 12: boundary level q=2 admits id=3 only
    out = token_budget_select(rd.from_pandas(df), "id", "q", "tok",
                              budget=12).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]
    # budget large: everything
    out = token_budget_select(rd.from_pandas(df), "id", "q", "tok",
                              budget=1000).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3, 4, 5]


def test_token_budget_matches_window_replay(ray_session):
    from web_crawler_ray.stages.sampling import token_budget_select

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"id": np.arange(200),
                       "q": rng.integers(0, 12, 200),
                       "tok": rng.integers(1, 30, 200)})
    budget = 900
    out = token_budget_select(rd.from_pandas(df), "id", "q", "tok",
                              budget=budget).to_pandas()
    # reference: explicit window replay
    ref = df.sort_values(["q", "id"], ascending=[False, True],
                         kind="mergesort")
    ref = ref[ref["tok"].cumsum() <= budget]
    assert sorted(out["id"]) == sorted(ref["id"])


def test_rrf_fusion_hand_case(ray_session):
    from web_crawler_ray.stages.similarity import rrf_fusion

    # 3 orthogonal-ish docs; queries = doc0 and doc1 vectors
    vecs = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.7, 0.7, 0.0]]
    df = pd.DataFrame({"vec_id": [0, 1, 2], "embedding": vecs})
    out = rrf_fusion(rd.from_pandas(df), [0, 1], [vecs[0], vecs[1]],
                     k=3, list_k=3)
    got = dict(zip(out["vec_id"], out["n_lists"]))
    assert got == {0: 2, 1: 2, 2: 2}  # every doc appears in both lists
    # doc2 ranks 2nd in both lists -> rrf = 2/62; docs 0/1 get 1/61 + 1/63
    r = dict(zip(out["vec_id"], out["rrf"]))
    assert r[2] == round(2 / 62.0, 6)
    assert r[0] == r[1] == round(1 / 61.0 + 1 / 63.0, 6)


def test_hash_walks_edges_valid_and_deterministic(ray_session):
    from web_crawler_ray.stages.graph import hash_walks

    rng = np.random.default_rng(5)
    edges = pd.DataFrame({
        "a": rng.integers(0, 20, 200),
        "b": rng.integers(100, 115, 200),
    }).drop_duplicates()
    ds = rd.from_pandas(edges)
    out = (hash_walks(ds, "a", "b", n_steps=2).to_pandas()
           .sort_values("walk_id").reset_index(drop=True))
    # one walk per distinct start node
    assert sorted(out["walk_id"]) == sorted(edges["a"].unique())
    eset = set(map(tuple, edges.values))
    for _, r in out.iterrows():
        assert (r["walk_id"], r["n1"]) in eset      # hop 1 is an edge
        assert (r["n2"], r["n1"]) in eset           # hop 2 back-edge
    # deterministic across runs and partitionings
    out2 = (hash_walks(rd.from_pandas(edges).repartition(7), "a", "b",
                       n_steps=2).to_pandas()
            .sort_values("walk_id").reset_index(drop=True))
    assert out.equals(out2)


def test_edit_distance_join_vs_bruteforce(ray_session):
    from web_crawler_ray.stages.joins import edit_distance_join

    # substitutions, insertions, deletions, exact dups, unicode, and
    # far-apart strings — candidate generation must miss nothing
    names = ["alpha", "alphb", "alpa", "alphas", "beta", "betta", "beta",
             "gamma", "gamme", "x", "", "y", "café", "cafe", "caffé"]
    df = pd.DataFrame({"sid": range(len(names)), "s": names})
    out = (edit_distance_join(rd.from_pandas(df).repartition(4),
                              "sid", "s", k=1).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = sorted((i, j, lev(names[i], names[j]))
                  for i in range(len(names)) for j in range(i + 1, len(names))
                  if lev(names[i], names[j]) <= 1)
    got = list(map(tuple, out[["id_a", "id_b", "dist"]].values))
    assert got == want
    assert (0, 1, 1) in got and (12, 13, 1) in got  # sub + unicode
    assert (0, 2, 1) in got and (0, 3, 1) in got    # deletion + insertion


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def test_edit_distance_join_k2_vs_bruteforce(ray_session):
    # k=2 double-deletion neighbourhood: every ≤2-edit pair (double
    # sub, sub+del, ins+ins, transposition-as-2-subs, short strings)
    # must surface; verify removes all hash false-positives.
    from web_crawler_ray.stages.joins import edit_distance_join

    names = ["kettle", "kettl", "kettlee", "kezzle", "keltte", "ketle",
             "bottle", "botle", "botl", "bottles", "throttle",
             "ab", "ba", "a", "b", "", "xy", "alpha", "alpza", "alqza"]
    df = pd.DataFrame({"sid": range(len(names)), "s": names})
    out = (edit_distance_join(rd.from_pandas(df).repartition(5),
                              "sid", "s", k=2).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = sorted((i, j, _lev(names[i], names[j]))
                  for i in range(len(names)) for j in range(i + 1, len(names))
                  if _lev(names[i], names[j]) <= 2)
    got = list(map(tuple, out[["id_a", "id_b", "dist"]].values))
    assert got == want
    assert (0, 3, 2) in got            # double substitution
    assert (11, 12, 2) in got          # transposition = 2 subs
    assert (13, 15, 1) in got          # 'a' vs '' (1 deletion)
    assert (13, 14, 1) in got          # 'a' vs 'b'


def test_edit_distance_join_all_empty_batches(ray_session):
    # A batch consisting ENTIRELY of empty strings must still emit its
    # 0-deletion keys: empty-empty pairs are distance 0 and
    # empty-vs-1-char pairs distance 1 (the ADVICE r04 regression).
    from web_crawler_ray.stages.joins import edit_distance_join

    names = ["", "", "", "x", ""]
    df = pd.DataFrame({"sid": range(len(names)), "s": names})
    # one row per block so some blocks are all-empty
    out = (edit_distance_join(rd.from_pandas(df).repartition(5),
                              "sid", "s", k=1).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = sorted((i, j, _lev(names[i], names[j]))
                  for i in range(len(names)) for j in range(i + 1, len(names))
                  if _lev(names[i], names[j]) <= 1)
    got = list(map(tuple, out[["id_a", "id_b", "dist"]].values))
    assert got == want
    assert (0, 1, 0) in got and (0, 3, 1) in got


def test_kcenter_k_exceeds_rows_raises(ray_session):
    # with every point already selected the masked sentinel would win
    # the argmax — must raise, not silently duplicate a center
    import pytest as _pytest

    from web_crawler_ray.stages.similarity import kcenter_select

    df = pd.DataFrame({"vec_id": [0, 1, 2],
                       "embedding": [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]})
    with _pytest.raises(ValueError, match="exceeds"):
        kcenter_select(rd.from_pandas(df), k=5)
    with _pytest.raises(ValueError, match="exceeds"):  # distributed path
        kcenter_select(rd.from_pandas(df), k=5, driver_rows_max=0)


def test_unigram_kl_properties(ray_session):
    from web_crawler_ray.stages.stats import unigram_kl

    df = pd.DataFrame({
        "text": ["the cat sat on the mat"] * 20
        + ["der hund lief durch den wald"] * 20,
        "lang": ["en"] * 20 + ["de"] * 20,
    })
    ds = rd.from_pandas(df)
    out = unigram_kl(ds, "text", "lang", "en", "de", vocab_size=50)
    assert out.loc[0, "kl"] > 0  # disjoint vocabularies: positive KL
    assert out.loc[0, "kl"] == round(
        float(out["h_cross"] - out["h_self"]), 6) or abs(
        out.loc[0, "kl"] - (out.loc[0, "h_cross"] - out.loc[0, "h_self"])
    ) <= 2e-6
    # self-drift is zero: A vs A has identical models
    same = unigram_kl(ds, "text", "lang", "en", "en", vocab_size=50)
    assert same.loc[0, "kl"] == 0.0


def test_dsir_weights_separate_target_domain(ray_session):
    from web_crawler_ray.stages.text_rank import dsir_weights

    df = pd.DataFrame({
        "doc_id": range(40),
        "text": ["stock market price trading"] * 20
        + ["recipe flour butter sugar"] * 20,
        "lang": ["en"] * 20 + ["zh"] * 20,
    })
    out = (dsir_weights(rd.from_pandas(df).repartition(3), "text",
                        "doc_id", "lang", "en", vocab_size=50)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 40
    w_en = out.loc[out["doc_id"] < 20, "dsir_weight"]
    w_zh = out.loc[out["doc_id"] >= 20, "dsir_weight"]
    # target-domain docs must score strictly higher
    assert w_en.min() > w_zh.max()


def test_group_regression_recovers_line(ray_session):
    from web_crawler_ray.stages.stats import group_regression

    # exact line y = 2x + 5 over 10 days -> slope 2, r2 = 1
    ts = pd.date_range("2024-01-01", periods=50, freq="5h")
    us = ts.values.astype("datetime64[us]").astype(np.int64)
    x = us / 1e6 / 86400.0 - 19723.0
    df = pd.DataFrame({"k": ["g"] * 50, "ts": ts, "v": 2.0 * x + 5.0})
    out = group_regression(rd.from_pandas(df).repartition(4), "k", "ts",
                           "v")
    assert out.loc[0, "slope"] == 2.0
    assert out.loc[0, "intercept"] == 5.0
    assert out.loc[0, "r2"] == 1.0


def test_join_size_estimate_exact(ray_session):
    from web_crawler_ray.stages.joins import join_size_estimate

    left = pd.DataFrame({"k": [1, 1, 1, 2, 3, 3, 9]})
    right = pd.DataFrame({"j": [1, 2, 2, 3, 4]})
    out = join_size_estimate(rd.from_pandas(left).repartition(3),
                             rd.from_pandas(right).repartition(2),
                             "k", "j")
    # key 1: 3*1, key 2: 1*2, key 3: 2*1 -> 7 rows over 3 matched keys
    assert out.loc[0, "join_rows"] == 7
    assert out.loc[0, "n_keys"] == 3
    assert out.loc[0, "max_key_rows"] == 3


def test_label_propagation_two_cliques(ray_session):
    from web_crawler_ray.stages.graph import label_propagation

    # two triangles bridged by edge 1–10; hand-simulated synchronous
    # rounds (mode of neighbour labels, ties -> smallest label):
    # r1: {0:1, 1:0, 2:0, 10:1, 11:10, 12:10}
    # r2: {0:0, 1:1, 2:0, 10:10, 11:1, 12:1}
    edges = pd.DataFrame({
        "a": [0, 0, 1, 10, 10, 11, 1],
        "b": [1, 2, 2, 11, 12, 12, 10],
    })
    out = label_propagation(rd.from_pandas(edges), "a", "b",
                            iterations=2).to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert lab == {0: 0, 1: 1, 2: 0, 10: 10, 11: 1, 12: 1}
    # deterministic under a different partitioning
    out2 = label_propagation(rd.from_pandas(edges).repartition(5),
                             "a", "b", iterations=2).to_pandas()
    assert dict(zip(out2["node"], out2["label"])) == lab
    # the distributed path (pinned past the edge gate) agrees with the
    # driver fast path exactly
    out3 = label_propagation(rd.from_pandas(edges).repartition(5),
                             "a", "b", iterations=2,
                             driver_edges_max=0).to_pandas()
    assert dict(zip(out3["node"], out3["label"])) == lab


def test_edit_distance_join_blocking_key(ray_session):
    from web_crawler_ray.stages.joins import edit_distance_join

    # same names in different blocks must NOT match
    df = pd.DataFrame({
        "sid": [0, 1, 2, 3],
        "s": ["alpha", "alphb", "alpha", "alphz"],
        "grp": [1, 1, 2, 2],
    })
    out = edit_distance_join(rd.from_pandas(df), "sid", "s", k=1,
                             block_col="grp").to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values))
    assert got == {(0, 1), (2, 3)}


def test_kcenter_matches_numpy_reference(ray_session):
    from web_crawler_ray.stages.similarity import kcenter_select

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 6))
    df = pd.DataFrame({"vec_id": np.arange(40, dtype=np.int64),
                       "embedding": [v.tolist() for v in vecs]})
    out = kcenter_select(rd.from_pandas(df).repartition(5), k=5,
                         vec_col="embedding")
    # the distributed rounds (pinned past the row gate) must pick
    # identically to the driver fast path
    out_dist = kcenter_select(rd.from_pandas(df).repartition(5), k=5,
                              vec_col="embedding", driver_rows_max=0)
    pd.testing.assert_frame_equal(out, out_dist)

    # greedy farthest-first reference (same rounding, same tie-break)
    chosen = [0]
    for _ in range(4):
        d2 = np.min(((vecs[:, None, :] - vecs[chosen][None, :, :]) ** 2)
                    .sum(axis=2), axis=1)
        d2 = np.round(d2, 6)  # ties at 6 digits: numpy round ok for test
        d2[chosen] = -1.0
        chosen.append(int(np.lexsort((np.arange(40), -d2))[0]))
    assert out["vec_id"].tolist() == chosen
    # selection distances are non-increasing (greedy invariant)
    d = out["d2_at_selection"].to_numpy()[1:]
    assert all(d[i] >= d[i + 1] for i in range(len(d) - 1))


def test_vocab_growth_hand_case(ray_session):
    from web_crawler_ray.stages.text_rank import vocab_growth

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c", "a b", "d d d", "a e"],
    })
    out = vocab_growth(rd.from_pandas(df).repartition(3), "text",
                       "doc_id", checkpoints=(1, 2, 3, 4))
    assert out["n_docs"].tolist() == [1, 2, 3, 4]
    assert out["n_tokens"].tolist() == [3, 5, 8, 10]
    assert out["n_distinct_tokens"].tolist() == [3, 3, 4, 5]


def test_source_overlap_hand_case(ray_session):
    from web_crawler_ray.stages.text_rank import source_overlap

    df = pd.DataFrame({
        "text": ["a b c", "c d", "a b", "x y"],
        "src": ["p", "p", "q", "r"],
    })
    out = source_overlap(rd.from_pandas(df).repartition(3), "text", "src")
    out = out.set_index(["src_a", "src_b"])
    # p vocab {a,b,c,d}, q vocab {a,b}, r vocab {x,y}
    assert out.loc[("p", "q"), "n_common"] == 2
    assert out.loc[("p", "q"), "jaccard"] == 0.5
    # zero-overlap pairs are omitted (matches the SQL inner join)
    assert ("p", "r") not in out.index and ("q", "r") not in out.index


def test_trigram_index_search_exact(ray_session, tmp_path):
    """Trigram-index substring search equals the brute-force scan:
    candidates come only from the pattern's grams' bucket partitions
    (partition-pruned read), the contains verify removes trigram
    coincidences, and patterns < 3 chars fail fast."""
    import ray.data as rd

    from web_crawler_ray.stages.text_rank import (build_trigram_index,
                                                  trigram_search)

    docs = pd.DataFrame({
        "doc_id": range(8),
        "text": [
            "the merge part of the plan",      # hit
            "merge partition tables",          # hit ("merge part" prefix)
            "a MERGE PART in caps",            # hit (case-insensitive)
            "part merge reversed words",       # miss (order matters)
            "mergepart fused",                 # miss (no space)
            "unrelated text entirely",         # miss
            "",                                # miss (empty)
            "ends with merge part",            # hit
        ],
    })
    ds = rd.from_pandas(docs).repartition(3)
    idx = build_trigram_index(ds, "text", "doc_id", str(tmp_path / "tri"),
                              n_buckets=8, input_fingerprint="fp-1")
    out = trigram_search(ds, idx, "merge part", "text", "doc_id",
                         n_buckets=8, num_partitions=4)
    brute = sorted(
        i for i, t in zip(docs["doc_id"], docs["text"])
        if "merge part" in t.lower()
    )
    assert out["doc_id"].tolist() == brute == [0, 1, 2, 7]
    # idempotent rebuild: same fingerprint skips (marker preserved)
    assert build_trigram_index(ds, "text", "doc_id",
                               str(tmp_path / "tri"), n_buckets=8,
                               input_fingerprint="fp-1") == str(tmp_path / "tri")
    # no-hit pattern returns an empty typed frame
    none = trigram_search(ds, idx, "zzzqqq", "text", "doc_id", n_buckets=8)
    assert none.empty and list(none.columns) == ["doc_id"]
    with pytest.raises(ValueError, match="3 chars"):
        trigram_search(ds, idx, "ab", "text", "doc_id", n_buckets=8)


def test_group_hhi_hand_case(ray_session):
    from web_crawler_ray.stages.stats import group_hhi

    # key "a": shares 0.5/0.25/0.25 -> hhi = 0.375; key "b": one member
    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"],
        "m": [1, 1, 2, 3, 9],
        "v": [1.0, 1.0, 1.0, 1.0, 7.0],
    })
    out = (group_hhi(rd.from_pandas(df).repartition(3), "k", "m", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["n_members"].tolist() == [3, 1]
    assert out["hhi"].tolist() == [0.375, 1.0]


def test_group_moments_vs_numpy(ray_session):
    from web_crawler_ray.stages.stats import group_moments

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.exponential(2.0, 400),  # right-skewed
                           rng.normal(5.0, 1.0, 300)])
    keys = np.array(["exp"] * 400 + ["norm"] * 300)
    df = pd.DataFrame({"k": keys, "v": vals})
    out = (group_moments(rd.from_pandas(df).repartition(5), "k", "v")
           .sort_values("k").reset_index(drop=True))
    for kv in ["exp", "norm"]:
        x = vals[keys == kv]
        c = x - x.mean()
        m2, m3, m4 = (c ** 2).sum(), (c ** 3).sum(), (c ** 4).sum()
        n = len(x)
        row = out[out["k"] == kv].iloc[0]
        assert row["n"] == n
        assert abs(row["skewness"] - np.sqrt(n) * m3 / m2 ** 1.5) < 1e-5
        assert abs(row["exkurtosis"] - (n * m4 / m2 ** 2 - 3)) < 1e-5
    assert out.loc[out["k"] == "exp", "skewness"].iloc[0] > 1.0
    assert abs(out.loc[out["k"] == "norm", "skewness"].iloc[0]) < 0.3


def test_mann_whitney_vs_reference(ray_session):
    from web_crawler_ray.stages.stats import mann_whitney_u

    # includes ties ACROSS arms (the tie-correction path)
    a = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 8.0]
    b = [2.0, 4.0, 5.0, 6.0, 6.0, 9.0]
    df = pd.DataFrame({"k": ["g"] * (len(a) + len(b)),
                       "arm": [0] * len(a) + [1] * len(b),
                       "v": a + b})
    out = (mann_whitney_u(rd.from_pandas(df).repartition(4),
                          "k", "arm", "v").to_pandas())
    assert len(out) == 1
    row = out.iloc[0]

    # reference: average ranks by hand
    allv = np.array(a + b)
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j - 1) / 2.0 + 1.0
        i = j
    r0 = ranks[: len(a)].sum()
    n0, n1 = len(a), len(b)
    u = r0 - n0 * (n0 + 1) / 2.0
    nn = n0 + n1
    _, counts = np.unique(allv, return_counts=True)
    tie = float((counts.astype(float) ** 3 - counts).sum())
    var = n0 * n1 / 12.0 * ((nn + 1.0) - tie / (nn * (nn - 1.0)))
    z = (u - n0 * n1 / 2.0) / np.sqrt(var)
    assert row["n_a"] == n0 and row["n_b"] == n1
    assert abs(row["u_stat"] - u) < 1e-9
    assert abs(row["z"] - z) < 1e-6


def test_mann_whitney_missing_arm_excluded(ray_session):
    from web_crawler_ray.stages.stats import mann_whitney_u

    df = pd.DataFrame({"k": ["solo"] * 3 + ["both"] * 4,
                       "arm": [0, 0, 0, 0, 1, 0, 1],
                       "v": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 4.0]})
    out = (mann_whitney_u(rd.from_pandas(df), "k", "arm", "v")
           .to_pandas())
    assert out["k"].tolist() == ["both"]


def test_autocorrelation_gapped_series(ray_session):
    from web_crawler_ray.stages.timeseries import autocorrelation

    # days 0,1,2,4,5 (gap at 3): lag-1 pairs = (0,1),(1,2),(4,5)
    days = ["2024-01-01", "2024-01-02", "2024-01-03",
            "2024-01-05", "2024-01-06"]
    vals = [1.0, 3.0, 2.0, 5.0, 4.0]
    df = pd.DataFrame({"ts": pd.to_datetime(days), "v": vals})
    out = autocorrelation(rd.from_pandas(df).repartition(2), "ts", "v",
                          max_lag=3)
    x = np.array(vals)
    c = x - x.mean()
    den = (c * c).sum()
    # calendar pairing: idx pairs per lag over day indices [0,1,2,4,5]
    pairs = {1: [(0, 1), (1, 2), (3, 4)],
             2: [(0, 2), (2, 3)],
             3: [(1, 3), (2, 4)]}
    for lag, pp in pairs.items():
        want = sum(c[i] * c[j] for i, j in pp) / den
        row = out[out["lag"] == lag].iloc[0]
        assert row["n_pairs"] == len(pp)
        assert abs(row["acf"] - want) < 1e-6


def test_gap_fill_daily_hand_case(ray_session):
    from web_crawler_ray.stages.timeseries import gap_fill_daily

    df = pd.DataFrame({
        "k": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-04", "2024-01-02"]),
        "v": [10.0, 20.0, 5.0]})
    out = gap_fill_daily(rd.from_pandas(df), "k", "ts", "v")
    # global range = 4 days x 2 keys = 8 rows
    assert len(out) == 8
    a = out[out["k"] == "a"].sort_values("day")
    assert a["n"].tolist() == [1, 0, 0, 1]
    assert a["total"].tolist() == [10.0, 0.0, 0.0, 20.0]
    b = out[out["k"] == "b"].sort_values("day")
    assert b["n"].tolist() == [0, 1, 0, 0]
    assert b["total"].tolist() == [0.0, 5.0, 0.0, 0.0]


def test_grid_distance_join_vs_bruteforce(ray_session):
    from web_crawler_ray.stages.spatial import grid_distance_join

    rng = np.random.default_rng(11)
    n = 300
    # cluster points so cross-cell and boundary pairs both occur
    x = np.concatenate([rng.uniform(0, 30, n // 2),
                        rng.uniform(9.9, 10.1, n // 2)])
    y = np.concatenate([rng.uniform(0, 30, n // 2),
                        rng.uniform(4.9, 5.1, n // 2)])
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    r = 2.5
    out = (grid_distance_join(rd.from_pandas(df).repartition(4),
                              "id", "x", "y", radius=r)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    ia, ib = np.where((d2 <= r * r) & (np.arange(n)[:, None] < np.arange(n)))
    want = sorted(zip(ia.tolist(), ib.tolist()))
    assert list(map(tuple, out[["id_a", "id_b"]].values)) == want
    assert len(out) > 100  # the dense cluster guarantees real pairs
    np.testing.assert_allclose(
        out["dist"].to_numpy(),
        np.sqrt(d2[tuple(np.array(want).T)]), atol=1e-6)


def test_grid_distance_join_hot_cell_raises(ray_session):
    from web_crawler_ray.stages.spatial import grid_distance_join

    df = pd.DataFrame({"id": np.arange(50, dtype=np.int64),
                       "x": np.zeros(50) + 0.5, "y": np.zeros(50) + 0.5})
    with pytest.raises(Exception, match="exceeds max_group"):
        grid_distance_join(rd.from_pandas(df), "id", "x", "y",
                           radius=1.0, max_cell_rows=10).to_pandas()


def test_phrase_search_vs_reference(ray_session):
    import re

    from web_crawler_ray.stages.text_rank import phrase_search

    docs = [
        "the sort merge join",                  # 1 occurrence
        "sort merge sort merge sort",           # 2 (non-overlapping slots)
        "merge sort",                           # 0 (wrong order)
        "sort, merge!",                         # punctuation-split: 1
        "sort  merge",                          # multi-space: 1
        "no match here",                        # 0
        "sort",                                 # too short
        "",                                     # empty
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64),
                       "text": docs})
    out = phrase_search(rd.from_pandas(df).repartition(3),
                        "doc_id", "text", ["sort", "merge"])

    def ref(t):
        tok = re.findall(r"[a-z]+", t.lower())
        return sum(1 for i in range(len(tok) - 1)
                   if tok[i] == "sort" and tok[i + 1] == "merge")

    want = {i: ref(t) for i, t in enumerate(docs) if ref(t) > 0}
    got = dict(zip(out["doc_id"], out["n_occ"]))
    assert got == want == {0: 1, 1: 2, 3: 1, 4: 1}


def test_phrase_search_repeated_term(ray_session):
    from web_crawler_ray.stages.text_rank import phrase_search

    docs = ["batch batch batch stream", "one batch two batch", "batch"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": docs})
    out = phrase_search(rd.from_pandas(df), "doc_id", "text",
                        ["batch", "batch"])
    got = dict(zip(out["doc_id"], out["n_occ"]))
    assert got == {0: 2}  # positions (0,1) and (1,2); doc 1/2 none


def test_cooccurrence_pairs_vs_bruteforce(ray_session):
    from collections import Counter
    from itertools import combinations

    from web_crawler_ray.stages.basket import cooccurrence_pairs

    rng = np.random.default_rng(3)
    rows = []
    for g in range(60):
        items = rng.choice(12, size=rng.integers(2, 6), replace=False)
        for it in items:
            rows.append((g, int(it)))
            rows.append((g, int(it)))  # in-group duplicates must not count
    df = pd.DataFrame(rows, columns=["g", "item"])
    out = cooccurrence_pairs(rd.from_pandas(df).repartition(4), "g", "item",
                             min_support=2)

    baskets = df.drop_duplicates().groupby("g")["item"].apply(sorted)
    pair_n = Counter(p for b in baskets for p in combinations(b, 2))
    item_n = Counter(i for b in baskets for i in b)
    n_tot = len(baskets)
    want = sorted((a, b, n) for (a, b), n in pair_n.items() if n >= 2)
    got = list(map(tuple, out[["item_a", "item_b", "n_groups"]].values))
    assert got == want
    for _, r in out.iterrows():
        lift = (r["n_groups"] * n_tot) / (item_n[r["item_a"]]
                                          * item_n[r["item_b"]])
        assert abs(r["lift"] - lift) < 1e-6


def test_time_weighted_avg_hand_case(ray_session):
    from web_crawler_ray.stages.windows import time_weighted_avg

    # user 1: v=10 held 2s, v=20 held 1s -> twap = (10*2 + 20*1)/3
    # user 2: both at the same ts -> sum(w)=0 -> excluded
    df = pd.DataFrame({
        "u": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:02",
                              "2024-01-01 00:00:03", "2024-01-01 00:00:00",
                              "2024-01-01 00:00:00"]),
        "v": [10.0, 20.0, 99.0, 1.0, 2.0],
        "tie": [1, 2, 3, 4, 5]})
    out = time_weighted_avg(rd.from_pandas(df).repartition(2),
                            "u", "ts", "v", "tie").to_pandas()
    assert out["u"].tolist() == [1]
    assert out["n_intervals"].tolist() == [2]
    assert abs(out["twap"].iloc[0] - 40.0 / 3.0) < 1e-5


def test_rolling_median3_hand_case(ray_session):
    from web_crawler_ray.stages.windows import rolling_median3

    df = pd.DataFrame({
        "u": [1] * 5,
        "ts": pd.to_datetime(["2024-01-01"] * 5) + pd.to_timedelta(
            range(5), unit="s"),
        "v": [5.0, 1.0, 3.0, 9.0, 2.0],
        "tie": range(5)})
    out = (rolling_median3(rd.from_pandas(df), "u", "ts", "v", "tie")
           .to_pandas().sort_values("tie"))
    # windows: [5], [5,1], [5,1,3], [1,3,9], [3,9,2]
    assert out["roll_med"].tolist() == [5.0, 3.0, 3.0, 3.0, 3.0]


def test_iqr_outliers_hand_case(ray_session):
    from web_crawler_ray.stages.stats import iqr_outliers

    # 0..10 plus extremes: p25=2.5, p75=7.5, iqr=5 -> fences [-5, 15]
    vals = list(np.arange(11, dtype=float)) + [-20.0, 50.0, 60.0]
    df = pd.DataFrame({"k": ["a"] * len(vals), "v": vals})
    out = iqr_outliers(rd.from_pandas(df).repartition(3), "k", "v")
    row = out.iloc[0]
    assert row["n_low"] == 1 and row["n_high"] == 2
    assert row["p25"] < row["p75"]


def test_lorenz_deciles_hand_case(ray_session):
    from web_crawler_ray.stages.stats import lorenz_deciles

    # 12 rows -> NTILE sizes [2,2,1,1,1,1,1,1,1,1]; values 1..12
    df = pd.DataFrame({"k": ["a"] * 12,
                       "v": [float(x) for x in range(1, 13)]})
    out = lorenz_deciles(rd.from_pandas(df).repartition(3), "k", "v"
                         ).to_pandas().sort_values("decile")
    assert out["n"].tolist() == [2, 2, 1, 1, 1, 1, 1, 1, 1, 1]
    tot = sum(range(1, 13))
    # cum sums at tile ends: 3, 10, 15, 21, 28, 36, 45, 55, 66, 78
    want = [3, 10, 15, 21, 28, 36, 45, 55, 66, 78]
    assert out["cum_share"].tolist() == [round(w / tot, 6) for w in want]
    assert out["cum_share"].iloc[-1] == 1.0


def test_markov_power_hand_case(ray_session):
    from web_crawler_ray.stages.stats import markov_power

    # two users: a->b->a->b... and a->c; c is dangling (drops mass)
    rows = []
    for i, s in enumerate(["a", "b", "a", "b"]):
        rows.append((1, s, i))
    for i, s in enumerate(["a", "c"]):
        rows.append((2, s, i))
    df = pd.DataFrame(rows, columns=["u", "state", "t"])
    df["ts"] = pd.to_datetime("2024-01-01") + pd.to_timedelta(df["t"],
                                                              unit="s")
    out = markov_power(rd.from_pandas(df).repartition(2),
                       "u", "state", "ts", "t", steps=1)
    # P: a -> b 2/3, a -> c 1/3; b -> a 1; c dangling.
    # x0 = [a: 1.0]; x1 = [b: 2/3, c: 1/3]
    got = dict(zip(out["state"], out["p"]))
    assert got == {"b": round(2 / 3, 6), "c": round(1 / 3, 6)}

    out2 = markov_power(rd.from_pandas(df), "u", "state", "ts", "t",
                        steps=2)
    # x2 = b's mass -> a (2/3); c's 1/3 drops (dangling)
    got2 = dict(zip(out2["state"], out2["p"]))
    assert got2 == {"a": round(2 / 3, 6)}


def test_srm_check_hand_case(ray_session):
    from web_crawler_ray.stages.stats import srm_check

    # key "bad": 30 vs 10 -> chi2 = (10)^2/20 * 2 = 10; "ok": 5 vs 5 -> 0
    df = pd.DataFrame({"k": ["bad"] * 40 + ["ok"] * 10,
                       "arm": [0] * 30 + [1] * 10 + [0, 1] * 5})
    out = (srm_check(rd.from_pandas(df).repartition(3), "k", "arm")
           .sort_values("k").reset_index(drop=True))
    assert out.loc[0, "k"] == "bad" and out.loc[0, "chi2"] == 10.0
    assert out.loc[0, "n_a"] == 30 and out.loc[0, "n_b"] == 10
    assert out.loc[1, "chi2"] == 0.0


def test_adoption_curve_hand_case(ray_session):
    from web_crawler_ray.stages.stats import adoption_curve

    # id 1 first on day0 (despite a later sighting), id 2 day1, id 3 day1
    df = pd.DataFrame({
        "id": [1, 2, 1, 3, 2],
        "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                              "2024-01-02", "2024-01-04"])})
    out = adoption_curve(rd.from_pandas(df).repartition(2), "id", "ts")
    assert out["n_new"].tolist() == [1, 2]
    assert out["cum_users"].tolist() == [1, 3]


def test_degree_assortativity_known_graphs(ray_session):
    from web_crawler_ray.stages.stats import degree_assortativity

    # star K1,4: every edge joins deg-4 hub to deg-1 leaf -> r = -1
    star = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    r_star = degree_assortativity(rd.from_pandas(star))
    assert r_star["n_edges"].iloc[0] == 4
    assert r_star["r"].iloc[0] == -1.0

    # duplicate/reversed rows collapse and the self-loop drops: the
    # P3 path (0-1-2-3) keeps exactly 3 undirected edges
    path = pd.DataFrame({"src": [0, 1, 1, 5, 2],
                         "dst": [1, 0, 2, 5, 3]})
    r_path = degree_assortativity(rd.from_pandas(path))
    assert r_path["n_edges"].iloc[0] == 3


def test_seasonal_decompose_constant_series(ray_session):
    from web_crawler_ray.stages.timeseries import seasonal_decompose_daily

    # constant daily total -> trend == x, seasonal == 0, resid == 0
    days = pd.date_range("2024-01-01", periods=21, freq="D")
    df = pd.DataFrame({"ts": days.repeat(2), "v": 5.0})
    out = seasonal_decompose_daily(rd.from_pandas(df), "ts", "v")
    assert len(out) == 21
    assert (out["x"] == 10.0).all()
    assert (out["trend"] == 10.0).all()
    assert (out["seasonal"] == 0.0).all()
    assert (out["resid"] == 0.0).all()


def test_seasonal_decompose_recovers_dow_effect(ray_session):
    from web_crawler_ray.stages.timeseries import seasonal_decompose_daily

    # flat base 100 with +70 every Monday over 4 full weeks
    days = pd.date_range("2024-01-01", periods=28, freq="D")  # Mon start
    vals = np.where(days.dayofweek == 0, 170.0, 100.0)
    df = pd.DataFrame({"ts": days, "v": vals})
    out = seasonal_decompose_daily(rd.from_pandas(df), "ts", "v")
    mon = out[(out["day"] + 3) % 7 + 1 == 1]
    rest = out[(out["day"] + 3) % 7 + 1 != 1]
    assert (mon["seasonal"] > 50).all()
    assert (rest["seasonal"] < 0).all()  # mean-centered


def test_class_weights_inverse_and_effective(ray_session):
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "entry_cw", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["entry_cw"] = m
    spec.loader.exec_module(m)
    out = m.q_class_weights("/root/testdata/sf0.001")
    # rarer classes must get strictly larger weights under both schemes
    o = out.sort_values("n").reset_index(drop=True)
    assert (np.diff(o["w_inv"]) <= 1e-9).all()
    assert (np.diff(o["w_eff"]) <= 1e-9).all()
    assert (out["n"] * out["w_inv"] * len(out)
            - out["n"].sum()).abs().max() < 1.0


def test_local_clustering_known_graphs(ray_session):
    from web_crawler_ray.stages.graph import local_clustering

    # K4 minus one edge (0-3 missing): lcc(1)=lcc(2)=2/3, lcc(0)=lcc(3)=1
    edges = pd.DataFrame({"id_a": [0, 0, 1, 1, 2],
                          "id_b": [1, 2, 2, 3, 3]})
    out = (local_clustering(rd.from_pandas(edges).repartition(2))
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["degree"].tolist() == [2, 3, 3, 2]
    assert out["n_tri"].tolist() == [1, 2, 2, 1]
    assert out["lcc"].tolist() == [1.0, round(2 / 3, 6),
                                   round(2 / 3, 6), 1.0]

    # star: no triangles, hub lcc = 0; leaves (deg 1) excluded
    star = pd.DataFrame({"id_a": [0, 0, 0], "id_b": [1, 2, 3]})
    s = local_clustering(rd.from_pandas(star)).to_pandas()
    assert s["node"].tolist() == [0]
    assert s["lcc"].tolist() == [0.0]
