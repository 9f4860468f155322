"""Browser-driven fetch backends (SURVEY.md §2.1 S5-S8).

The reference drives real browsers four ways: Selenium headless Chrome
(pacong/browser/selenium_controller.py:68-124), AppleScript-automated
Chrome (browser/applescript.py:64-152), the Chrome DevTools protocol
over websocket (browser/cdp.py:30-189), and cross-platform RPA
keystroke automation (browser/rpa_chrome_controller.py:386-556).

This container has no browser binary, but two of those are PROTOCOLS,
not binaries — so the engine implements the real wire protocols on the
stdlib and tests them against in-process protocol servers:

- :class:`CdpTransport` — Chrome DevTools protocol: tab create via the
  /json HTTP endpoints, then JSON-RPC over a real RFC 6455 websocket
  (``wsclient.py``): Page.enable/Runtime.enable, Page.navigate, wait
  for Page.loadEventFired, Runtime.evaluate outerHTML, tab close — the
  exact call sequence of cdp.py:118-189.
- :class:`SeleniumTransport` — the W3C WebDriver wire protocol (what
  the selenium package speaks under the hood): POST /session,
  POST /session/{id}/url, poll POST /session/{id}/element (the
  WebDriverWait-for-element loop, selenium_controller.py:85-99),
  scroll via POST /session/{id}/execute/sync
  (selenium_controller.py:107-124), GET /session/{id}/source.

Point either at a real Chrome (``--remote-debugging-port`` /
chromedriver) and they drive it; tests point them at fake servers
speaking the same protocol. Both expose the engine-wide transport
contract ``get(url) -> (status, bytes)`` so they plug straight into
``http_fetch.FetcherActor`` pools (one browser session per actor,
created lazily on first use in the actor process).

AppleScript (S6) and RPA keystroke automation (S8) require an OS
desktop session, which no protocol shim can fake — they stay fail-fast
interface stubs.
"""

from __future__ import annotations

import json
import time
from http.client import HTTPConnection

from .wsclient import WebSocketClient


def _http_json(host: str, port: int, method: str, path: str,
               body: dict | None = None, timeout_s: float = 30.0):
    conn = HTTPConnection(host, port, timeout=timeout_s)
    try:
        payload = json.dumps(body).encode() if body is not None else None
        headers = {"Content-Type": "application/json"} if payload else {}
        conn.request(method, path, body=payload, headers=headers)
        resp = conn.getresponse()
        data = resp.read()
        return resp.status, (json.loads(data) if data else {})
    finally:
        conn.close()


class CdpTransport:
    """S7 — Chrome DevTools protocol over websocket (stdlib client).

    ``get(url)`` runs the reference's scrape_page sequence
    (cdp.py:118-189): new tab → enable Page/Runtime → navigate → wait
    for ``Page.loadEventFired`` (bounded) → optional dynamic-content
    wait → evaluate ``document.documentElement.outerHTML`` → close tab.
    Returns (200, html-bytes) or (502, b"") on protocol failure — the
    errors-as-data convention of the fetch actor pool."""

    def __init__(self, host: str = "localhost", debug_port: int = 9222,
                 wait_seconds: float = 0.0, load_timeout_s: float = 30.0):
        self.host = host
        self.port = debug_port
        self.wait_seconds = wait_seconds
        self.load_timeout_s = load_timeout_s

    def is_running(self) -> bool:
        try:
            status, _ = _http_json(self.host, self.port, "GET",
                                   "/json/version", timeout_s=1.0)
            return status == 200
        except OSError:
            return False

    def get(self, url: str) -> tuple[int, bytes]:
        tab = None
        try:
            status, tab = _http_json(self.host, self.port, "PUT", "/json/new")
            if status != 200 or "webSocketDebuggerUrl" not in tab:
                return 502, b""
            ws = WebSocketClient(tab["webSocketDebuggerUrl"],
                                 timeout_s=self.load_timeout_s)
            try:
                rpc_id = 0

                def call(method: str, params: dict | None = None) -> dict:
                    nonlocal rpc_id
                    rpc_id += 1
                    msg = {"id": rpc_id, "method": method}
                    if params:
                        msg["params"] = params
                    ws.send_text(json.dumps(msg))
                    while True:  # events interleave with responses
                        data = json.loads(ws.recv_text())
                        if data.get("id") == rpc_id:
                            return data
                        self._on_event(data)

                call("Page.enable")
                call("Runtime.enable")
                self._load_fired = False
                call("Page.navigate", {"url": url})
                deadline = time.monotonic() + self.load_timeout_s
                while not self._load_fired and time.monotonic() < deadline:
                    self._on_event(json.loads(ws.recv_text()))
                if self.wait_seconds:
                    time.sleep(self.wait_seconds)  # dynamic content
                res = call("Runtime.evaluate",
                           {"expression":
                            "document.documentElement.outerHTML"})
                html = (res.get("result", {}).get("result", {})
                        .get("value", ""))
                return 200, html.encode()
            finally:
                ws.close()
        except (OSError, ConnectionError, ValueError):
            return 502, b""
        finally:
            if tab and tab.get("id"):
                try:
                    _http_json(self.host, self.port, "DELETE",
                               f"/json/close/{tab['id']}")
                except OSError:
                    pass

    def _on_event(self, data: dict) -> None:
        if data.get("method") == "Page.loadEventFired":
            self._load_fired = True


class SeleniumTransport:
    """S5 — W3C WebDriver wire protocol (what selenium speaks), stdlib
    HTTP client. One session per transport (per actor), created lazily;
    ``wait_for_css`` replays the reference's WebDriverWait-for-element
    loop; ``scroll_times`` its scroll_page."""

    def __init__(self, host: str = "localhost", port: int = 4444,
                 headless: bool = True, wait_for_css: str | None = None,
                 wait_timeout_s: float = 20.0, scroll_times: int = 0,
                 poll_s: float = 0.05):
        self.host = host
        self.port = port
        self.headless = headless
        self.wait_for_css = wait_for_css
        self.wait_timeout_s = wait_timeout_s
        self.scroll_times = scroll_times
        self.poll_s = poll_s
        self.session_id: str | None = None

    def _cmd(self, method: str, path: str, body: dict | None = None):
        return _http_json(self.host, self.port, method, path, body)

    def _ensure_session(self) -> str:
        if self.session_id is None:
            args = ["--no-sandbox", "--disable-dev-shm-usage",
                    "--window-size=1920,1080"]
            if self.headless:
                args.append("--headless")
            status, resp = self._cmd("POST", "/session", {
                "capabilities": {"alwaysMatch": {
                    "browserName": "chrome",
                    "goog:chromeOptions": {"args": args}}}})
            if status != 200:
                raise ConnectionError(f"WebDriver session refused: {status}")
            self.session_id = (resp.get("value", {}).get("sessionId")
                               or resp.get("sessionId"))
        return self.session_id

    def get(self, url: str) -> tuple[int, bytes]:
        try:
            sid = self._ensure_session()
            status, _ = self._cmd("POST", f"/session/{sid}/url",
                                  {"url": url})
            if status != 200:
                return 502, b""
            if self.wait_for_css:
                deadline = time.monotonic() + self.wait_timeout_s
                while True:
                    st, _ = self._cmd(
                        "POST", f"/session/{sid}/element",
                        {"using": "css selector",
                         "value": self.wait_for_css})
                    if st == 200 or time.monotonic() >= deadline:
                        break  # timeout → return current content (ref)
                    time.sleep(self.poll_s)
            for _ in range(self.scroll_times):
                self._cmd("POST", f"/session/{sid}/execute/sync",
                          {"script": "window.scrollBy(0, window.innerHeight);",
                           "args": []})
            status, resp = self._cmd("GET", f"/session/{sid}/source")
            if status != 200:
                return 502, b""
            return 200, str(resp.get("value", "")).encode()
        except (OSError, ConnectionError, ValueError):
            return 502, b""

    def close(self) -> None:
        if self.session_id is not None:
            try:
                self._cmd("DELETE", f"/session/{self.session_id}")
            except OSError:
                pass
            self.session_id = None


class _UnavailableBrowserTransport:
    """Base for OS-desktop transports: same ``get(url) -> (status,
    body)`` protocol; constructing one without the backing desktop
    raises immediately (actor __init__ fails fast)."""

    REQUIRES: str = "a desktop session"

    def __init__(self, *_a, **_kw):
        raise NotImplementedError(
            f"{type(self).__name__} needs {self.REQUIRES}, which is not "
            "available in this container. Use CdpTransport/"
            "SeleniumTransport against a real browser endpoint, or "
            "http_fetch transports; any object with get(url)->(status, "
            "body) plugs into the same actor pool."
        )


class AppleScriptTransport(_UnavailableBrowserTransport):
    """S6 — macOS Chrome via osascript: open, resize, scroll, grab
    outerHTML (applescript.py:64-152)."""

    REQUIRES = "macOS with scriptable Chrome"


class RpaTransport(_UnavailableBrowserTransport):
    """S8 — OS-level keystroke automation + DevTools JS eval
    (rpa_chrome_controller.py:386-556)."""

    REQUIRES = "a desktop session (pyautogui/xdotool)"
