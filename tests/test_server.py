"""HTTP service surface (web_crawler_ray/server.py) — reference
capability: pacong/server.py POST /scrape. Ray-free registry callables
keep the test independent of the session fixture."""

import http.client
import json
import threading

import pandas as pd
import pytest

from web_crawler_ray.server import make_server


@pytest.fixture()
def server():
    registry = {
        "q_ok": lambda sf_dir: pd.DataFrame(
            {"k": ["a", "b", "c"], "n": [1, 2, 3], "sf": [sf_dir] * 3}),
        "q_boom": lambda sf_dir: (_ for _ in ()).throw(RuntimeError("nope")),
    }
    srv = make_server(registry, default_sf_dir="/sf/default")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()
    srv.server_close()


def _req(addr, method, path, body=None):
    conn = http.client.HTTPConnection(*addr, timeout=10)
    conn.request(method, path,
                 body=json.dumps(body) if body is not None else None)
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_health_and_listing(server):
    assert _req(server, "GET", "/health") == (200, {"ok": True})
    status, out = _req(server, "GET", "/queries")
    assert status == 200 and out["queries"] == ["q_boom", "q_ok"]


def test_run_query_with_limit_and_default_sf(server):
    status, out = _req(server, "POST", "/run", {"query": "q_ok", "limit": 2})
    assert status == 200
    assert out["rows"] == 3 and out["columns"] == ["k", "n", "sf"]
    assert len(out["data"]) == 2
    assert out["data"][0] == {"k": "a", "n": 1, "sf": "/sf/default"}
    status, out = _req(server, "POST", "/run",
                       {"query": "q_ok", "sf_dir": "/sf/x"})
    assert out["data"][0]["sf"] == "/sf/x"


def test_errors_are_json(server):
    assert _req(server, "POST", "/run", {"query": "missing"})[0] == 404
    status, out = _req(server, "POST", "/run", {"query": "q_boom"})
    assert status == 500 and "RuntimeError" in out["error"]
    assert _req(server, "GET", "/nope")[0] == 404


def test_pipeline_endpoint(server, ray_session):
    status, out = _req(server, "POST", "/pipeline", {
        "source": "/root/testdata/sf0.001/orders.parquet",
        "ops": [{"op": "groupby_agg", "keys": ["o_orderpriority"],
                 "aggs": {"n": ["count", None]}},
                {"op": "sort", "keys": ["o_orderpriority"]}],
        "limit": 10,
    })
    assert status == 200
    assert sum(r["n"] for r in out["data"]) == 1500


def test_pipelines_listing(server):
    from web_crawler_ray.pipelines.spec import register_pipeline

    register_pipeline("srv_demo", "orders",
                      [{"op": "limit", "n": 1}])
    status, out = _req(server, "GET", "/pipelines")
    assert status == 200 and "srv_demo" in out["pipelines"]
