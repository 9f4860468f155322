"""HTTP service surface over the query/pipeline registry.

Reference capability analogue: pacong/server.py exposes a FastAPI
``POST /scrape`` that runs named scraper pipelines for a session and
returns their outputs. FastAPI is not in this container, so the same
surface is implemented on the stdlib (`http.server.ThreadingHTTPServer`)
— the service layer is intentionally thin: it looks up a named callable
in a registry, runs it (Ray Data does the distributed work exactly as
when the driver calls it directly), and returns a bounded JSON sample
plus row/column metadata. Heavy results never serialize through the
endpoint: ``limit`` caps the rows returned (the pipeline itself still
streams; only the sample is collected).

Endpoints:
  GET  /health             → {"ok": true}
  GET  /queries            → sorted registry names
  POST /run   {"query": name, "sf_dir"?: path, "limit"?: n}
                           → {"query", "rows", "columns", "data"}
  POST /pipeline {"source": parquet_path, "ops": [...], "limit"?: n}
                           → same shape, via pipelines/spec.py

The module never calls ray.init(); the owner of the process does
(CLI guard below), per the driver contract.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _to_frame(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(f"unsupported result type: {type(result)!r}")


def _payload(name: str, df: pd.DataFrame, limit: int) -> dict:
    head = df.head(limit)
    return {
        "query": name,
        "rows": int(len(df)),
        "columns": list(map(str, df.columns)),
        # JSON-safe: stringify anything json can't carry (bytes, ts)
        "data": json.loads(head.to_json(orient="records",
                                        default_handler=str)),
    }


def make_server(registry: dict, host: str = "127.0.0.1", port: int = 0,
                default_sf_dir: str = DEFAULT_SF_DIR,
                max_limit: int = 10_000) -> ThreadingHTTPServer:
    """Build (not start) the server; ``port=0`` picks a free port
    (read it from ``server.server_address``). ``registry`` maps name →
    callable(sf_dir) returning a Dataset / DataFrame / Arrow table."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet: callers own logging
            pass

        def _send(self, code: int, body: dict) -> None:
            raw = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(raw)))
            self.end_headers()
            self.wfile.write(raw)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"ok": True})
            elif self.path == "/queries":
                self._send(200, {"queries": sorted(registry)})
            elif self.path == "/pipelines":
                from .pipelines.spec import list_pipelines

                self._send(200, {"pipelines": sorted(list_pipelines())})
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except (ValueError, json.JSONDecodeError):
                return self._send(400, {"error": "bad JSON body"})
            limit = max(0, min(int(req.get("limit", 100)), max_limit))
            try:
                if self.path == "/run":
                    name = req.get("query")
                    if name not in registry:
                        return self._send(404, {"error": f"unknown query {name!r}"})
                    df = _to_frame(registry[name](req.get("sf_dir",
                                                          default_sf_dir)))
                    return self._send(200, _payload(name, df, limit))
                if self.path == "/pipeline":
                    from .pipelines.spec import build_pipeline

                    ds = build_pipeline(req["source"], req["ops"])
                    return self._send(200, _payload("pipeline",
                                                    _to_frame(ds), limit))
                return self._send(404, {"error": f"no route {self.path}"})
            except KeyError as e:
                return self._send(400, {"error": f"missing field {e}"})
            except Exception as e:  # surface pipeline errors as 500 JSON
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:  # CLI entry point — owns the Ray session (guarded)
    import argparse

    import ray

    ap = argparse.ArgumentParser(description="Serve the query registry")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    import __ray_entry__ as entry_mod

    srv = make_server(entry_mod.queries(), port=args.port,
                      default_sf_dir=args.sf_dir)
    print(f"serving on {srv.server_address}")
    try:
        srv.serve_forever()
    finally:
        srv.server_close()
        ray.shutdown()


if __name__ == "__main__":
    main()
