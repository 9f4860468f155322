"""Property-based tests for the round-5 statistics/window kernels:
randomized inputs (with ties, gaps, and degenerate groups) against
independent pandas/numpy references. Example counts are modest because
each example drives a Ray pipeline."""

import numpy as np
import pandas as pd
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

small_floats = st.floats(min_value=-100, max_value=100,
                         allow_nan=False, allow_infinity=False,
                         width=32)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.sampled_from([1.0, 2.0, 2.5, 3.0, 7.0]),
                min_size=1, max_size=40))
def test_rolling_median3_matches_pandas(ray_session, vals):
    from web_crawler_ray.stages.windows import rolling_median3

    df = pd.DataFrame({
        "k": [1] * len(vals),
        "ts": pd.date_range("2024-01-01", periods=len(vals), freq="s"),
        "v": vals, "tie": range(len(vals))})
    out = (rolling_median3(rd.from_pandas(df), "k", "ts", "v", "tie")
           .to_pandas().sort_values("tie"))
    want = (pd.Series(vals).rolling(3, min_periods=1).median()
            .round(4).tolist())
    assert out["roll_med"].tolist() == want


@settings(max_examples=12, deadline=None)
@given(st.lists(st.sampled_from([1.0, 2.0, 2.0, 3.0, 9.0]),
                min_size=2, max_size=30),
       st.lists(st.sampled_from([1.0, 2.0, 4.0, 9.0]),
                min_size=2, max_size=30))
def test_mann_whitney_u_sum_identity(ray_session, a, b):
    """U_a + U_b == n_a * n_b (the rank-sum identity), and z flips
    sign when the arms swap."""
    from web_crawler_ray.stages.stats import mann_whitney_u

    def run(x, y):
        df = pd.DataFrame({"k": ["g"] * (len(x) + len(y)),
                           "arm": [0] * len(x) + [1] * len(y),
                           "v": x + y})
        out = mann_whitney_u(rd.from_pandas(df), "k", "arm", "v"
                             ).to_pandas()
        return out.iloc[0] if len(out) else None

    r1 = run(a, b)
    r2 = run(b, a)
    if r1 is None or r2 is None:  # zero-variance (all values tied)
        return
    assert r1["u_stat"] + r2["u_stat"] == len(a) * len(b)
    assert abs(r1["z"] + r2["z"]) < 1e-5


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=2, max_value=60),
       st.floats(min_value=0.5, max_value=5.0))
def test_grid_distance_join_matches_bruteforce(ray_session, n, radius):
    from web_crawler_ray.stages.spatial import grid_distance_join

    rng = np.random.default_rng(n * 1000 + int(radius * 10))
    x = rng.uniform(0, 15, n)
    y = rng.uniform(0, 15, n)
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "x": x, "y": y})
    out = (grid_distance_join(rd.from_pandas(df), "id", "x", "y",
                              radius=radius)
           .to_pandas()
           .reindex(columns=["id_a", "id_b", "dist"])  # empty-safe
           .sort_values(["id_a", "id_b"]))
    d2 = (x[:, None] - x) ** 2 + (y[:, None] - y) ** 2
    ia, ib = np.where((d2 <= radius * radius)
                      & (np.arange(n)[:, None] < np.arange(n)))
    assert list(map(tuple, out[["id_a", "id_b"]].values)) == \
        sorted(zip(ia.tolist(), ib.tolist()))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(min_value=0.015625, max_value=50,
                          allow_nan=False, width=16),
                min_size=1, max_size=45))
def test_lorenz_deciles_invariants(ray_session, vals):
    from web_crawler_ray.stages.stats import lorenz_deciles

    df = pd.DataFrame({"k": ["g"] * len(vals), "v": vals})
    out = (lorenz_deciles(rd.from_pandas(df), "k", "v").to_pandas()
           .sort_values("decile"))
    # tile sizes follow NTILE; shares are nondecreasing and end at 1
    n = len(vals)
    q, r = divmod(n, 10)
    sizes = [q + 1] * r + [q] * (10 - r)
    assert out["n"].tolist() == [s for s in sizes if s > 0]
    cs = out["cum_share"].to_numpy()
    assert (np.diff(cs) >= -1e-9).all()
    assert abs(cs[-1] - 1.0) < 1e-6


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=8),
                min_size=2, max_size=60))
def test_phrase_search_matches_regex_reference(ray_session, word_ids):
    import re

    from web_crawler_ray.stages.text_rank import phrase_search

    words = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz",
             "beta", "alpha"]  # duplicates on purpose
    text = " ".join(words[i] for i in word_ids)
    df = pd.DataFrame({"doc_id": np.array([1], dtype=np.int64),
                       "text": [text]})
    out = phrase_search(rd.from_pandas(df), "doc_id", "text",
                        ["alpha", "beta"])
    toks = re.findall(r"[a-z]+", text.lower())
    want = sum(1 for i in range(len(toks) - 1)
               if toks[i] == "alpha" and toks[i + 1] == "beta")
    got = int(out["n_occ"].iloc[0]) if len(out) else 0
    assert got == want


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=1, max_value=10_499_999),      # price cents
    st.integers(min_value=0, max_value=10)),             # discount %
    min_size=1, max_size=200))
def test_revenue_e4_exactness_properties(rows):
    """revenue_e4 ground truth + order invariance: for any 2-decimal
    price and discount, the e4 int equals the Decimal product exactly,
    and sums are identical under every permutation (the float product
    form is neither — that's the half-cent-flake class it closes)."""
    from decimal import Decimal

    from web_crawler_ray.functions.rounding import revenue_e4

    price = np.array([c / 100.0 for c, _ in rows])
    disc = np.array([d / 100.0 for _, d in rows])
    e4 = revenue_e4(price, disc)
    truth = [int(Decimal(c) * (100 - d)) for c, d in rows]
    assert e4.tolist() == truth
    rng = np.random.default_rng(len(rows))
    perm = rng.permutation(len(e4))
    assert int(e4.sum()) == int(e4[perm].sum()) == sum(truth)
