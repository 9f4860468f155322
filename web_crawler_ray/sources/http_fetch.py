"""HTTP fetch actor pool (SURVEY.md §2.1 S1/S2, §2.3 T1).

Reference semantics: one ``requests.Session`` per worker with default
headers + gzip + keep-alive (pacong/core/base_scraper.py:193-231) and a
retry policy of 3 attempts, backoff factor 1, on 429/500/502/503/504
(base_scraper.py:202-206; knobs pacong/core/config.py:25-31).

Engine form: a callable CLASS for ``map_batches(FetcherActor,
concurrency=N, batch_size=B)`` — session built once per actor in
``__init__``, per-row bounded retry with exponential backoff in
``__call__``. The transport is pluggable: the real ``requests`` session
in production, a deterministic fake in this sandbox (no network), so
the retry/backoff/error-isolation logic is fully exercised by tests
without sockets. Failed rows come back as data (status=-1, error
column), never exceptions — per-source fault isolation like the
reference's try/except per source (base_scraper.py:140-143).
"""

from __future__ import annotations

import time

import pyarrow as pa

DEFAULT_HEADERS = {
    "User-Agent": "Mozilla/5.0 (compatible; web-crawler-ray/0.1)",
    "Accept-Encoding": "gzip, deflate",
    "Accept": "text/html,application/json;q=0.9,*/*;q=0.8",
    "Connection": "keep-alive",
}
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})


class RequestsTransport:
    """Real transport (requires network): requests.Session with
    keep-alive + headers, built once per actor."""

    def __init__(self, timeout_s: float = 30.0):
        import requests

        self.session = requests.Session()
        self.session.headers.update(DEFAULT_HEADERS)
        self.timeout_s = timeout_s

    def get(self, url: str) -> tuple[int, bytes]:
        resp = self.session.get(url, timeout=self.timeout_s)
        return resp.status_code, resp.content


class FakeTransport:
    """Deterministic offline transport: status/body from a provided
    mapping; a URL listed in ``flaky`` fails with 503 for its first N
    attempts then succeeds (exercises the retry path)."""

    def __init__(self, pages: dict[str, tuple[int, bytes]], flaky: dict[str, int] | None = None):
        self.pages = pages
        self.flaky = dict(flaky or {})
        self.attempts: dict[str, int] = {}

    def get(self, url: str) -> tuple[int, bytes]:
        self.attempts[url] = self.attempts.get(url, 0) + 1
        if self.flaky.get(url, 0) >= self.attempts[url]:
            return 503, b""
        return self.pages.get(url, (404, b""))


class FetcherActor:
    """map_batches actor: url column → (status, body, attempts, error).

    Retry semantics (S2): up to ``max_attempts`` total tries per URL on
    RETRY_STATUSES or transport exceptions, sleeping
    ``backoff_factor * 2**(attempt-1)`` seconds between tries (urllib3
    Retry formula). ``sleep_fn`` is injectable so tests run instantly.
    """

    def __init__(
        self,
        transport_factory=None,
        max_attempts: int = 3,
        backoff_factor: float = 1.0,
        url_col: str = "url",
        sleep_fn=time.sleep,
    ):
        self.transport = (transport_factory or RequestsTransport)()
        self.max_attempts = max_attempts
        self.backoff_factor = backoff_factor
        self.url_col = url_col
        self.sleep = sleep_fn

    def _fetch_one(self, url: str) -> tuple[int, bytes, int, str]:
        last_status, last_err = -1, ""
        for attempt in range(1, self.max_attempts + 1):
            try:
                status, body = self.transport.get(url)
            except Exception as exc:  # transport failure counts as retryable
                last_status, last_err = -1, f"{type(exc).__name__}: {exc}"
            else:
                if status not in RETRY_STATUSES:
                    return status, body, attempt, ""
                last_status, last_err = status, f"retryable status {status}"
            if attempt < self.max_attempts:
                self.sleep(self.backoff_factor * (2 ** (attempt - 1)))
        return last_status, b"", self.max_attempts, last_err

    def __call__(self, batch: pa.Table) -> pa.Table:
        statuses, bodies, attempts, errors = [], [], [], []
        for url in batch[self.url_col].to_pylist():
            s, b, a, e = self._fetch_one(url)
            statuses.append(s)
            bodies.append(b)
            attempts.append(a)
            errors.append(e)
        return (
            batch.append_column("status", pa.array(statuses, pa.int32()))
            .append_column("body", pa.array(bodies, pa.binary()))
            .append_column("attempts", pa.array(attempts, pa.int32()))
            .append_column("fetch_error", pa.array(errors, pa.string()))
        )
