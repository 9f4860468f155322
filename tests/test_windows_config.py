"""Tests for windowed aggregates, as-of join, engine config env
overrides, timestamp helpers, and browser-transport stubs."""

import pandas as pd
import pytest
import ray.data as rd

from web_crawler_ray.config import EngineConfig
from web_crawler_ray.functions.timestamps import filename_stamp, parse_iso, parse_iso_batch
from web_crawler_ray.sources.browser import SeleniumTransport
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
    with pytest.raises(NotImplementedError, match="chromedriver"):
        SeleniumTransport()
