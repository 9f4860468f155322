"""Direct tests for the summary aggregates (A1/A2/A5/O1/O2) and the
flagship summarize() composition."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from web_crawler_ray.pipelines.clean_pipeline import run_clean_pipeline, summarize
from web_crawler_ray.stages.aggregate import (
    error_histogram,
    market_summary,
    numeric_profile,
    top_k,
    top_k_per_group,
)
from web_crawler_ray.synth import gen_raw_records


def test_market_summary(ray_session):
    df = pd.DataFrame({"change_percent": [1.0, -2.0, 0.0, 3.0, None]})
    out = market_summary(rd.from_pandas(df))
    assert out["total_count"] == 5
    assert out["gainers"] == 2 and out["losers"] == 1 and out["unchanged"] == 1


def test_top_k_and_per_group(ray_session):
    df = pd.DataFrame({"g": ["a", "a", "b", "b"], "v": [3.0, 9.0, 9.0, 1.0], "id": [1, 2, 3, 4]})
    ds = rd.from_pandas(df)
    top = top_k(ds, "v", k=2, descending=True, tie_col="id").to_pandas()
    # scalar descending applies to the tie column too: v desc, id desc
    assert top["id"].tolist() == [3, 2]
    per = top_k_per_group(ds, "g", "v", k=1, tie_col="id").to_pandas().sort_values("g")
    assert per["id"].tolist() == [2, 3]


def test_error_histogram(ray_session):
    df = pd.DataFrame({"errors": ["a;b", "a", "", "b"]})
    out = (
        error_histogram(rd.from_pandas(df))
        .to_pandas()
        .sort_values("error_type")
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"error_type": "a", "n": 2},
        {"error_type": "b", "n": 2},
    ]


def test_numeric_profile(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"x": [1.0, 2.0, 3.0]}))
    out = numeric_profile(ds, "x")
    assert out["n"] == 3 and out["sum_v"] == 6.0 and out["min_v"] == 1.0 and out["max_v"] == 3.0


def test_flagship_summarize(ray_session):
    raw = rd.from_arrow(gen_raw_records(2000)).repartition(4)
    deduped = run_clean_pipeline(raw, pd.Timestamp("2024-01-22 12:00:00")).materialize()
    summary, per_cat, gainers = summarize(deduped)
    assert summary["total_count"] == deduped.count()
    cats = per_cat.to_pandas()
    assert set(cats.columns) == {"category", "n", "avg_value"}
    assert cats["n"].sum() == deduped.count()
    g = gainers.to_pandas()
    assert len(g) <= 5
    assert (g["change_percent"].diff().dropna() <= 0).all()  # descending


def test_rollup_sum_levels(ray_session):
    """ROLLUP emits every prefix level with NULL rolled-up keys and
    sums that reconcile: finest rows sum to their level-1 parent, and
    level-1 rows to the grand total."""
    from web_crawler_ray.stages.aggregate import rollup_sum

    df = pd.DataFrame({
        "x": ["a", "a", "b", "b", "b"],
        "y": ["p", "q", "p", "p", "q"],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = rollup_sum(rd.from_pandas(df).repartition(2), ["x", "y"], "v")
    finest = out[out["y"].notna()]
    level1 = out[out["y"].isna() & out["x"].notna()]
    total = out[out["x"].isna()]
    assert len(finest) == 4 and len(level1) == 2 and len(total) == 1
    assert sorted(level1["sum_v"]) == [3.0, 12.0]
    assert total["sum_v"].iloc[0] == 15.0 and total["n"].iloc[0] == 5
    got_a = finest[finest["x"] == "a"].set_index("y")["sum_v"]
    assert got_a["p"] == 1.0 and got_a["q"] == 2.0


def test_cube_sum_sets(ray_session):
    """CUBE emits all 2^k grouping sets; each coarser set reconciles
    to the sum of its children."""
    from web_crawler_ray.stages.aggregate import cube_sum

    df = pd.DataFrame({
        "x": ["a", "a", "b"], "y": ["p", "q", "p"], "v": [1.0, 2.0, 4.0],
    })
    out = cube_sum(rd.from_pandas(df).repartition(2), ["x", "y"], "v")
    finest = out[out["x"].notna() & out["y"].notna()]
    only_x = out[out["x"].notna() & out["y"].isna()]
    only_y = out[out["x"].isna() & out["y"].notna()]
    total = out[out["x"].isna() & out["y"].isna()]
    assert len(finest) == 3 and len(only_x) == 2 and len(only_y) == 2 and len(total) == 1
    assert only_y.set_index("y")["sum_v"].to_dict() == {"p": 5.0, "q": 2.0}
    assert total["sum_v"].iloc[0] == 7.0 and total["n"].iloc[0] == 3


def test_fixed_width_histogram(ray_session):
    """Histogram bucket counts equal a numpy reference: max lands in
    the last bucket, empty buckets absent, totals reconcile."""
    import numpy as np

    from web_crawler_ray.stages.aggregate import fixed_width_histogram

    rng = np.random.default_rng(2)
    v = rng.uniform(-3.0, 7.0, 5000)
    df = pd.DataFrame({"value": v})
    out = (fixed_width_histogram(rd.from_pandas(df).repartition(4), "value", 8)
           .to_pandas().set_index("bucket")["n"])
    lo, hi = v.min(), v.max()
    want = pd.Series(
        np.minimum(np.floor((v - lo) / ((hi - lo) / 8)), 7).astype("int64")
    ).value_counts()
    assert out.sum() == 5000
    assert {int(k): int(c) for k, c in out.items()} == \
           {int(k): int(c) for k, c in want.items()}


def test_gini_degenerate_and_known(ray_session):
    """Gini = 0 for perfectly equal shares; hand-computed value for a
    known skewed distribution; single key well-defined."""
    import numpy as np
    import ray.data as rd

    from web_crawler_ray.stages.aggregate import gini_coefficient

    equal = rd.from_items([{"k": f"u{i % 4}"} for i in range(40)])
    out = gini_coefficient(equal, "k").to_pandas()
    assert out["gini"].iloc[0] == 0.0 and out["n_keys"].iloc[0] == 4

    # counts 1,1,2,4 sorted -> sum((2i-n-1)x)/(n*sum) = (1*-3+2*-1+3*2+4*3+... )
    skew = rd.from_items([{"k": "a"}] + [{"k": "b"}] + [{"k": "c"}] * 2
                         + [{"k": "d"}] * 4)
    g = gini_coefficient(skew, "k").to_pandas()["gini"].iloc[0]
    x = np.array([1.0, 1.0, 2.0, 4.0])
    i = np.arange(1, 5)
    expect = ((2 * i - 5) * x).sum() / (4 * x.sum())
    assert abs(g - round(expect, 6)) < 1e-9

    one = gini_coefficient(rd.from_items([{"k": "z"}] * 7), "k").to_pandas()
    assert one["gini"].iloc[0] == 0.0 and one["n_keys"].iloc[0] == 1


def test_zorder_key_locality(ray_session):
    """Morton spread matches the per-bit reference; partition ids cover
    the full range and each partition's source-column spans are narrow
    on BOTH axes (the point of the layout)."""
    import numpy as np
    import pytest

    from web_crawler_ray.stages.layout import zorder_key, zorder_layout_stats

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"a": rng.integers(0, 256, 4096),
                       "b": rng.integers(0, 256, 4096)})
    out = zorder_key(rd.from_pandas(df), "a", "b", num_partitions=16,
                     bits=8).to_pandas()

    def ref(a, b):
        return sum((((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
                   for i in range(8))

    sample = out.head(200)
    assert all(ref(int(r.a), int(r.b)) == r.zkey for r in sample.itertuples())
    assert (out["zpart"].to_numpy() == (out["zkey"].to_numpy() >> 12)).all()
    assert set(out["zpart"]) == set(range(16))

    stats = (zorder_layout_stats(rd.from_pandas(df), "a", "b",
                                 num_partitions=16, bits=8)
             .to_pandas().sort_values("zpart"))
    # each z-range partition spans at most half of either axis
    assert ((stats["a_max"] - stats["a_min"]) <= 128).all()
    assert ((stats["b_max"] - stats["b_min"]) <= 128).all()
    assert stats["n_rows"].sum() == 4096

    with pytest.raises(ValueError):
        zorder_key(rd.from_pandas(df), "a", "b", num_partitions=10)


def test_equidepth_histogram_ties_and_edges(ray_session):
    """Heavy ties collapse buckets (duplicate edges are legal) and
    counts always total the input; buckets are near-equal on a
    tie-free column."""
    import numpy as np

    from web_crawler_ray.stages.aggregate import equidepth_histogram

    tied = pd.DataFrame({"v": [1.0] * 90 + [2.0] * 10})
    out = (equidepth_histogram(rd.from_pandas(tied), "v", k=4)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    assert out["n"].sum() == 100
    # all three interior edges collapse onto 1.0 (the 25/50/75%
    # quantiles of a 90%-tied column), so every row — ties sit at or
    # above their edge — lands in the single top bucket
    assert len(out) == 1 and out["bucket"].iloc[0] == 3

    rng = np.random.default_rng(7)
    smooth = pd.DataFrame({"v": rng.permutation(np.arange(1000)).astype(float)})
    out2 = (equidepth_histogram(rd.from_pandas(smooth).repartition(4), "v", k=10)
            .to_pandas().sort_values("bucket"))
    # quantile_disc rank ceil(q·n)−1 puts the edge element itself in
    # the upper bucket: ends are 99/101, interiors exactly 100
    assert len(out2) == 10 and out2["n"].between(99, 101).all()
    assert (out2["n"].to_numpy()[1:-1] == 100).all()
    assert out2["n"].sum() == 1000
    assert (out2["v_min"].to_numpy()[1:] > out2["v_max"].to_numpy()[:-1]).all()


def test_shuffle_skew_report_salts(ray_session):
    """Hot keys surface with the exact integer salt factor; cold keys
    are absent."""
    from web_crawler_ray.stages.aggregate import shuffle_skew_report

    df = pd.DataFrame({"k": ["hot"] * 800 + ["warm"] * 150 +
                       [f"c{i}" for i in range(50)]})
    out = (shuffle_skew_report(rd.from_pandas(df).repartition(4), "k",
                               hot_frac=0.05, max_partitions=8)
           .to_pandas().set_index("k"))
    assert set(out.index) == {"hot", "warm"}
    assert out.loc["hot", "share_ppm"] == 800 * 1_000_000 // 1000
    assert out.loc["hot", "n_salts"] == (800 * 8 + 999) // 1000  # 7
    assert out.loc["warm", "n_salts"] == (150 * 8 + 999) // 1000  # 2


def test_incremental_agg_matches_full_recompute(ray_session):
    """Delta-merge maintenance must equal re-aggregating the merged
    snapshot (apply_changes), including deletes, group moves, and
    insert-created groups."""
    import numpy as np
    import ray.data as rd

    from web_crawler_ray.stages.aggregate import incremental_agg_merge
    from web_crawler_ray.stages.dedup import apply_changes

    base = pd.DataFrame({
        "id": np.arange(100),
        "g": np.repeat(["a", "b", "c", "d"], 25),
        "v": np.arange(100, dtype=np.int64),
    })
    changes = pd.DataFrame({
        "id": [0, 1, 2, 30, 101, 102, 0],
        "op": ["upsert", "delete", "upsert", "delete", "upsert",
               "upsert", "upsert"],
        "seq": [1, 1, 1, 1, 1, 1, 2],
        "g": ["a", "a", "b", "b", "e", "a", "a"],   # id 2 moves a->b
        "v": [1000, 0, 50, 0, 7, 9, 2000],          # id 0: seq2 wins
    })
    inc = incremental_agg_merge(rd.from_pandas(base),
                                rd.from_pandas(changes), "g", "id", "v")
    snap = apply_changes(rd.from_pandas(base), rd.from_pandas(changes),
                         id_col="id").to_pandas()
    full = (snap.groupby("g").agg(n_rows=("id", "size"), v_sum=("v", "sum"))
            .reset_index().sort_values("g").reset_index(drop=True))
    inc = inc.rename(columns={"g": "g"})[["g", "n_rows", "v_sum"]]
    full["n_rows"] = full["n_rows"].astype("int64")
    full["v_sum"] = full["v_sum"].astype("int64")
    assert inc.reset_index(drop=True).equals(full)


def test_changepoint_finds_known_level_shift(ray_session):
    """A clean level shift at index 60 of 100 must be found exactly,
    with the two segment means recovered."""
    import importlib
    import os
    import sys
    import tempfile

    import numpy as np
    import pandas as pd

    sys.path.insert(0, "/root/repo")

    ts = pd.date_range("2024-01-01", periods=100, freq="min")
    v = np.concatenate([np.full(60, 10.0), np.full(40, 25.0)])
    # small deterministic jitter so SSE is not degenerate
    v = v + np.sin(np.arange(100)) * 0.1
    df = pd.DataFrame({"event_type": "m", "ts": ts,
                       "event_id": np.arange(100), "value": v})

    q = importlib.import_module("__ray_entry__").q_changepoint
    # a tiny sf dir holding just this events table
    root = tempfile.mkdtemp(prefix="wcr_cp_")
    df.to_parquet(os.path.join(root, "events.parquet"))
    out = q(root).to_pandas().sort_values("event_type").reset_index(drop=True)
    assert out["split_k"].tolist() == [60]
    assert abs(out["mean_left"].iloc[0] - v[:60].mean()) < 1e-4
    assert abs(out["mean_right"].iloc[0] - v[60:].mean()) < 1e-4


def test_group_regression_matches_polyfit(ray_session, tmp_path):
    """q_group_regression's moment-partial closed form equals
    numpy.polyfit per key (to rounding precision), and degenerate keys
    (single row / zero x-variance) are excluded."""
    import os

    import numpy as np

    from __ray_entry__ import q_group_regression

    rng = np.random.RandomState(3)
    base_us = 1_700_000_000_000_000
    rows = []
    for uid, n in [(1, 40), (2, 7), (3, 1), (4, 5)]:
        xs = rng.randint(0, 10_000_000, n) * 1_000_000  # us offsets
        if uid == 4:
            xs[:] = 123_000_000  # zero variance: excluded
        for x in xs:
            rows.append((uid, base_us + int(x),
                         float(rng.uniform(-50, 50))))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    root = str(tmp_path)
    df.to_parquet(os.path.join(root, "events.parquet"))

    out = (q_group_regression(root).to_pandas()
           .set_index("user_id").sort_index())
    assert sorted(out.index) == [1, 2]  # n<2 and zero-variance dropped
    for uid in (1, 2):
        sub = df[df["user_id"] == uid]
        x = (sub["ts"].to_numpy().astype("datetime64[us]").astype("int64")
             / 1e6 - 1_700_000_000.0)
        slope, intercept = np.polyfit(x, sub["value"].to_numpy(), 1)
        assert abs(out.loc[uid, "slope"] - slope) < 1e-5
        assert abs(out.loc[uid, "intercept"] - intercept) < 1e-4


def test_abtest_welch_direction_and_null(ray_session, tmp_path):
    """q_abtest: identical arms give t == 0; a shifted arm gives a
    large negative t (arm B hotter ⇒ mean_a − mean_b < 0); single-arm
    types are excluded."""
    import os

    import numpy as np

    from __ray_entry__ import q_abtest

    rng = np.random.RandomState(5)
    rows = []
    for i in range(200):
        v = float(rng.normal(10, 1))
        rows.append(("same", 0, v))        # identical paired values
        rows.append(("same", 1, v))
        rows.append(("shift", 0, v))
        rows.append(("shift", 1, v + 3.0))
    rows.append(("solo", 1, 1.0))          # only arm 1 → excluded
    df = pd.DataFrame(rows, columns=["event_type", "user_id", "value"])
    df["user_id"] = df["user_id"].astype("int64")
    df.to_parquet(os.path.join(str(tmp_path), "events.parquet"))

    out = (q_abtest(str(tmp_path)).to_pandas()
           .set_index("event_type").sort_index())
    assert sorted(out.index) == ["same", "shift"]
    assert abs(out.loc["same", "t_welch"]) < 1e-9  # same values both arms
    assert out.loc["shift", "t_welch"] < -10       # B shifted +3 sigma
    assert out.loc["same", "n_a"] == out.loc["same", "n_b"] == 200
