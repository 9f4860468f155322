"""Tests for windowed aggregates, as-of join, engine config env
overrides, timestamp helpers, and browser-transport stubs."""

import pandas as pd
import pytest
import ray.data as rd

from web_crawler_ray.config import EngineConfig
from web_crawler_ray.functions.timestamps import filename_stamp, parse_iso, parse_iso_batch
from web_crawler_ray.sources.browser import AppleScriptTransport
from web_crawler_ray.stages.windows import asof_join_latest, tumbling_window_agg


def test_tumbling_window(ray_session):
    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 01:00", "2024-01-01 23:00", "2024-01-02 00:00", "2024-01-01 05:00"]
            ),
            "v": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = (
        tumbling_window_agg(rd.from_pandas(df), "ts", ["k"], "D",
                            {"n": ("count", None), "s": ("sum", "v")})
        .to_pandas()
        .sort_values(["k", "window"])
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"k": "a", "window": "2024-01-01", "n": 2, "s": 3.0},
        {"k": "a", "window": "2024-01-02", "n": 1, "s": 4.0},
        {"k": "b", "window": "2024-01-01", "n": 1, "s": 8.0},
    ]


def test_asof_join(ray_session):
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "event_type": ["signup", "click", "signup", "click", "signup"],
            "event_id": [10, 11, 12, 20, 21],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-01", "2024-01-05"]
            ),
        }
    )
    out = (
        asof_join_latest(
            rd.from_pandas(df), key_col="user_id", ts_col="ts",
            right_filter=lambda g: g["event_type"] == "signup",
            right_cols={"signup_event_id": "event_id"}, tie_col="event_id",
        )
        .to_pandas()
        .sort_values("event_id")
    )
    got = dict(zip(out["event_id"], out["signup_event_id"].astype(int)))
    # user1: signup@10 ≤ click@11; signup@12 matches itself (exact allowed)
    assert got[10] == 10 and got[11] == 10 and got[12] == 12
    # user2: click@20 precedes any signup → dropped (inner); signup@21 self
    assert 20 not in got and got[21] == 21


def test_engine_config_env(monkeypatch):
    cfg = EngineConfig.from_env()
    assert cfg.max_retries == 3
    monkeypatch.setenv("WCR_MAX_ROUNDS", "7")
    monkeypatch.setenv("WCR_RETRY_BACKOFF_FACTOR", "0.5")
    monkeypatch.setenv("WCR_OUTPUT_DIR", "/tmp/x")
    cfg = EngineConfig.from_env(max_depth=3)
    assert cfg.max_rounds == 7
    assert cfg.retry_backoff_factor == 0.5
    assert cfg.output_dir == "/tmp/x"
    assert cfg.max_depth == 3  # explicit override wins


def test_timestamps():
    from datetime import datetime

    assert parse_iso("2024-01-22T12:00:00") == datetime(2024, 1, 22, 12, 0, 0)
    assert parse_iso("junk") is None
    assert filename_stamp(datetime(2024, 1, 22, 12, 0, 5)) == "20240122_120005"
    s = parse_iso_batch(pd.Series(["2024-01-22T12:00:00", "bad"]))
    assert s.notna().tolist() == [True, False]


def test_browser_stub_fails_fast():
    # S6/S8 need an OS desktop no protocol shim can fake — fail fast.
    # (S5/S7 are now real wire-protocol clients, tests/test_browser.py.)
    with pytest.raises(NotImplementedError, match="macOS"):
        AppleScriptTransport()


def test_rolling_agg(ray_session):
    from web_crawler_ray.stages.windows import rolling_agg

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 2,
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                 "2024-01-05", "2024-01-01", "2024-01-02"]
            ),
            "id": [1, 2, 3, 4, 5, 6, 7],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0, 10.0, 20.0],
        }
    )
    out = (
        rolling_agg(rd.from_pandas(df), "k", "ts", "v", "id", window=3)
        .to_pandas().sort_values("id")
    )
    # a: 1, (1+2)/2, (1+2+3)/3, (2+3+4)/3, (3+4+5)/3; b: 10, 15
    assert out["roll_avg"].tolist() == [1.0, 1.5, 2.0, 3.0, 4.0, 10.0, 15.0]


def test_group_rank(ray_session):
    from web_crawler_ray.stages.windows import group_rank

    df = pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b"],
            "id": [1, 2, 3, 4, 5],
            "v": [9.0, 9.0, 7.0, 5.0, 1.0],
        }
    )
    out = (
        group_rank(rd.from_pandas(df), "k", "v", "id", k=3)
        .to_pandas().sort_values(["k", "rn"]).reset_index(drop=True)
    )
    # ties on v=9.0 break toward smaller id for rn; dense_rank shares 1
    assert out[["k", "id", "rn", "dr"]].values.tolist() == [
        ["a", 1, 1, 1], ["a", 2, 2, 1], ["a", 3, 3, 2], ["b", 5, 1, 1]
    ]


def test_range_join(ray_session):
    from web_crawler_ray.stages.joins import range_join

    left = rd.from_pandas(pd.DataFrame(
        {"key": [1, 1, 2, 3], "ts": [5, 50, 7, 7], "lv": ["p", "q", "r", "s"]}
    ))
    right = rd.from_pandas(pd.DataFrame(
        {"rkey": [1, 2], "lo": [0, 10], "hi": [10, 20], "rv": ["x", "y"]}
    ))
    out = (
        range_join(left, right, "key", "rkey", "ts", "lo", "hi")
        .to_pandas().sort_values("lv")
    )
    # key1@5 in [0,10]; key1@50 outside; key2@7 outside [10,20]; key3 no match
    assert out["lv"].tolist() == ["p"] and out["rv"].tolist() == ["x"]


def test_grouped_string_agg_and_pivot(ray_session):
    from web_crawler_ray.stages.aggregate import grouped_string_agg, pivot_sum

    df = pd.DataFrame(
        {
            "k": ["a", "a", "b", "a"],
            "name": ["n3", "n1", "n4", "n2"],
            "o": [3, 1, 4, 2],
            "status": ["O", "F", "O", "O"],
            "v": [1.5, 2.5, 4.0, 8.0],
        }
    )
    agg = (
        grouped_string_agg(rd.from_pandas(df), "k", "name", "o")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert agg["members"].tolist() == ["n1,n2,n3", "n4"]

    piv = (
        pivot_sum(rd.from_pandas(df), "k", "status", "v",
                  {"sum_o": "O", "sum_f": "F", "sum_p": "P"})
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert piv["sum_o"].tolist() == [9.5, 4.0]
    assert piv["sum_f"][0] == 2.5
    # SQL NULL semantics: groups with no matching pivot value stay null
    assert pd.isna(piv["sum_f"][1]) and pd.isna(piv["sum_p"]).all()
    assert piv["n"].tolist() == [3, 1]


def test_ntile_bucket_sizing(ray_session):
    """SQL ntile rule: first n%b buckets get ceil(n/b) rows — checked
    for n=10/b=4 (3,3,2,2), n=3/b=4 (one row per bucket), and
    descending value order within the key."""
    from web_crawler_ray.stages.windows import ntile

    df = pd.DataFrame({
        "k": ["a"] * 10 + ["b"] * 3,
        "v": list(range(10)) + [5.0, 1.0, 9.0],
        "id": list(range(13)),
    })
    out = (ntile(rd.from_pandas(df).repartition(3), "k", "v", "id", 4)
           .to_pandas().sort_values(["k", "v"], ascending=[True, False])
           .reset_index(drop=True))
    a = out[out["k"] == "a"]
    assert a["tile"].tolist() == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
    b = out[out["k"] == "b"]
    assert b["v"].tolist() == [9.0, 5.0, 1.0]
    assert b["tile"].tolist() == [1, 2, 3]


def test_group_first_last(ray_session):
    """first/last per key follow (ts, tie) order exactly; values pass
    through untouched."""
    from web_crawler_ray.stages.windows import group_first_last

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2],
        "ts": pd.to_datetime(["2024-01-02", "2024-01-01", "2024-01-01",
                              "2024-01-05", "2024-01-04"]),
        "id": [10, 11, 9, 3, 4],
        "v": [5.0, 6.0, 7.0, 8.0, 9.0],
    })
    out = (group_first_last(rd.from_pandas(df).repartition(2), "k", "ts", "id", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # key 1: order is (01-01,id9)->7.0 first, (01-02,id10)->5.0 last
    assert out.loc[0, "first_v"] == 7.0 and out.loc[0, "last_v"] == 5.0
    assert out.loc[1, "first_v"] == 9.0 and out.loc[1, "last_v"] == 8.0
    assert out["n"].tolist() == [3, 2]


def test_rank_metrics_ties_and_singleton(ray_session):
    """rank/percent_rank/cume_dist handle value ties (min-rank, max
    cume peers) and single-row partitions (pr = 0 per SQL)."""
    from web_crawler_ray.stages.windows import rank_metrics

    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b"],
        "v": [9.0, 7.0, 7.0, 1.0, 5.0],
        "id": [1, 2, 3, 4, 5],
    })
    out = (rank_metrics(rd.from_pandas(df).repartition(2), "k", "v", "id")
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out["rk"].tolist() == [1, 2, 2, 4, 1]
    assert out["pr"].tolist() == [0.0, 1/3, 1/3, 1.0, 0.0]
    assert out["cd"].tolist() == [0.25, 0.75, 0.75, 1.0, 1.0]


def test_hopping_window_membership(ray_session):
    """Each event lands in exactly width/stride windows and every
    window [w, w+width) contains precisely the events with
    w <= ts < w+width (hand-checked against the definition)."""
    from web_crawler_ray.stages.windows import hopping_window_agg

    # stride 10us, width 30us -> 3 windows per event
    ts = pd.to_datetime([5, 10, 29, 30], unit="us")
    df = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 4.0, 8.0]})
    out = (hopping_window_agg(rd.from_pandas(df).repartition(2), "ts",
                              stride_us=10, width_us=30,
                              aggs={"n": ("count", None), "s": ("sum", "v")})
           .to_pandas().sort_values("w_start").reset_index(drop=True))
    # windows: -20:[5], -10:[5], 0:[5,(10? 10 in [0,30) yes),29], ...
    got = {int(r.w_start): (int(r.n), float(r.s)) for r in out.itertuples()}
    assert got == {
        -20: (1, 1.0), -10: (2, 3.0), 0: (3, 7.0),
        10: (3, 14.0), 20: (2, 12.0), 30: (1, 8.0),
    }
    assert sum(n for n, _ in got.values()) == 4 * 3

    with pytest.raises(ValueError):
        hopping_window_agg(rd.from_pandas(df), "ts", stride_us=7,
                           width_us=30, aggs={"n": ("count", None)})


def test_hopping_window_brute_force_random(ray_session):
    """Randomized cross-check: hopping counts equal the brute-force
    'events with w <= ts < w+width' per emitted window, and each event
    contributes to exactly width/stride windows."""
    import numpy as np

    from web_crawler_ray.stages.windows import hopping_window_agg

    rng = np.random.default_rng(7)
    for stride, width in [(10, 30), (7, 28), (100, 100)]:
        ts_us = np.sort(rng.integers(0, 1000, 300))
        df = pd.DataFrame({"ts": pd.to_datetime(ts_us, unit="us"),
                           "v": np.ones(300)})
        out = (hopping_window_agg(rd.from_pandas(df).repartition(4), "ts",
                                  stride_us=stride, width_us=width,
                                  aggs={"n": ("count", None)})
               .to_pandas())
        m = width // stride
        assert out["n"].sum() == 300 * m
        for w, n in zip(out["w_start"], out["n"]):
            assert n == int(((ts_us >= w) & (ts_us < w + width)).sum()), \
                (stride, width, w)


def test_lookback_count_brute_force_with_ties(ray_session):
    """Randomized cross-check incl. duplicate timestamps: n_prev must
    equal |{same-key rows with ts in [t-h, t]}| — RANGE-frame peers all
    count, independent of tie order."""
    import numpy as np

    from web_crawler_ray.stages.windows import lookback_count

    rng = np.random.default_rng(3)
    n = 400
    ts_us = rng.integers(0, 50, n) * 10  # many exact ties
    df = pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "rid": np.arange(n),
    })
    out = (lookback_count(rd.from_pandas(df).repartition(3), "k", "ts",
                          horizon_us=100)
           .to_pandas().set_index("rid").sort_index())
    for rid, row in out.iterrows():
        t = ts_us[rid]
        k = df["k"].iloc[rid]
        want = int(((df["k"] == k) & (ts_us >= t - 100) & (ts_us <= t)).sum())
        assert row["n_prev"] == want, (rid, k, t, row["n_prev"], want)


def test_sequence_islands_bucket_boundary(ray_session):
    """An island spanning a range-bucket boundary merges into one row;
    gaps split islands; singleton islands survive."""
    from web_crawler_ray.stages.windows import sequence_islands

    ids = [2, 3, 4, 5, 9, 12, 13, 100]  # bucket_shift=2 -> buckets of 4
    ds = rd.from_pandas(pd.DataFrame({"i": pd.array(ids, dtype="int64")})
                        ).repartition(3)
    out = (sequence_islands(ds, "i", bucket_shift=2)
           .to_pandas().sort_values("start_id").reset_index(drop=True))
    got = list(zip(out["start_id"], out["end_id"], out["n"]))
    assert got == [(2, 5, 4), (9, 9, 1), (12, 13, 2), (100, 100, 1)]


def test_late_events_watermark_semantics(ray_session):
    """late_events: a first arrival is never late; the watermark is the
    running max over STRICTLY earlier arrivals minus the lateness
    budget — a row exactly at the watermark is on time, one micro
    below is late; keys are independent."""
    import numpy as np

    from web_crawler_ray.stages.windows import late_events

    base = 1_700_000_000_000_000  # epoch us
    df = pd.DataFrame({
        "u": [1, 1, 1, 1, 2, 2],
        "order": [1, 2, 3, 4, 1, 2],
        "ts": pd.to_datetime(np.array([
            base,                     # first: never late
            base + 300_000_000,       # advances watermark to +300s
            base + 300_000_000 - 60_000_000,   # == watermark: on time
            base + 300_000_000 - 60_000_001,   # 1us below: late
            base + 500_000_000,       # other key: first, never late
            base,                     # 500s behind its key's max: late
        ]), unit="us"),
    })
    out = (late_events(rd.from_pandas(df).repartition(3), "u", "order",
                       "ts", lateness_us=60_000_000)
           .to_pandas().sort_values(["u", "order"]))
    assert out["late"].tolist() == [0, 0, 0, 1, 0, 1]


def test_interval_union_islands(ray_session):
    """interval_union: overlap and touching merge, gaps split; count
    and covered length are per key; zero-length intervals inside a
    covered span add nothing."""
    from web_crawler_ray.stages.windows import interval_union

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2],
        "s": [0, 5, 10, 25, 0, 1],
        "e": [6, 8, 20, 25, 1, 2],  # k=1: [0,8]+[10,20]+[25,25]; k=2: [0,2]
    }).astype("int64")
    out = (interval_union(rd.from_pandas(df).repartition(2), "k", "s", "e")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["n_intervals"].tolist() == [3, 1]
    assert out["covered"].tolist() == [8 + 10 + 0, 2]


def test_unconverted_events_hand_case(ray_session):
    import pandas as pd
    import ray.data as rd

    from web_crawler_ray.stages.windows import unconverted_events

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: click converted at +30min; click at 12:00 unconverted
        (1, base, 1, "click"),
        (1, base + pd.Timedelta("30min"), 2, "purchase"),
        (1, base + pd.Timedelta("12h"), 3, "click"),
        # user 2: purchase EXACTLY at +1h counts (inclusive upper)
        (2, base, 4, "click"),
        (2, base + pd.Timedelta("1h"), 5, "purchase"),
        # user 3: purchase at the SAME instant does NOT count (strict >)
        (3, base, 6, "click"),
        (3, base, 7, "purchase"),
        # user 4: purchase before the click only
        (4, base, 8, "purchase"),
        (4, base + pd.Timedelta("1min"), 9, "click"),
    ]
    df = pd.DataFrame(rows, columns=["u", "ts", "eid", "ty"])
    out = (unconverted_events(rd.from_pandas(df).repartition(3),
                              "u", "ts", "eid", "ty",
                              trigger="click", target="purchase",
                              horizon_us=3_600_000_000)
           .to_pandas().sort_values("eid"))
    assert out["eid"].tolist() == [3, 6, 9]


def test_group_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from web_crawler_ray.stages.windows import group_quantile_disc

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.choice(["a", "b", "c"], 200),
                       "v": rng.normal(size=200).round(3)})
    out = (group_quantile_disc(rd.from_pandas(df), "k", "v",
                               {"p50": 0.5, "p90": 0.9})
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.9)"
        " AS p90 FROM df GROUP BY k ORDER BY k").df()
    pd.testing.assert_frame_equal(out, want)
