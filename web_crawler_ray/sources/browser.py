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
desktop session — but their CODE is command construction + output
parsing, and only the command RUNNER (``osascript`` / ``xdotool``
subprocess) needs the desktop:

- :class:`AppleScriptTransport` — builds the exact AppleScript program
  sequence of applescript.py:64-152 (open location, shrink window,
  scroll via JS, outerHTML via JS) and executes each through an
  injectable ``runner(script, timeout_s) -> stdout``; the default
  runner shells ``osascript -e`` and the constructor fails fast when
  the binary is absent (this container).
- :class:`RpaTransport` — the keystroke-navigation flow of
  rpa_chrome_controller.py:427-509 (activate window, meta+L address
  bar, type URL, Return) as exact ``xdotool`` argv lists through an
  injectable ``runner(argv) -> stdout``, then reads the page the way
  the reference's LinuxController does (rpa_chrome_controller.py:373-
  385): ``Runtime.evaluate`` over CDP — pass a :class:`CdpTransport`
  or any ``page_reader``.

Tests drive both against fake runners that emulate the OS side
(``fake_servers.FakeOsascript`` / ``FakeXdotool``), so every command
string the real binaries would receive is exercised.
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

    def evaluate_active(self, expression: str) -> str:
        """``Runtime.evaluate`` on the first existing page tab (no
        navigation) — the reference's execute_javascript flow
        (cdp.py:191-233): ``GET /json`` tab list → attach websocket →
        evaluate. Raises on protocol failure (callers wrap)."""
        status, tabs = _http_json(self.host, self.port, "GET", "/json")
        if status != 200 or not tabs:
            raise ConnectionError(f"no devtools tabs: {status}")
        tab = next(t for t in tabs if t.get("webSocketDebuggerUrl"))
        ws = WebSocketClient(tab["webSocketDebuggerUrl"],
                             timeout_s=self.load_timeout_s)
        try:
            ws.send_text(json.dumps({"id": 1, "method": "Runtime.evaluate",
                                     "params": {"expression": expression,
                                                "returnByValue": True}}))
            while True:
                data = json.loads(ws.recv_text())
                if data.get("id") == 1:
                    return (data.get("result", {}).get("result", {})
                            .get("value", ""))
        finally:
            ws.close()


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


def _default_osascript_runner():
    import shutil
    import subprocess

    if shutil.which("osascript") is None:
        raise NotImplementedError(
            "AppleScriptTransport needs macOS osascript, absent in this "
            "container — inject runner= (tests use FakeOsascript) or use "
            "CdpTransport/SeleniumTransport against a real endpoint.")

    def run(script: str, timeout_s: float) -> str:
        p = subprocess.run(["osascript", "-e", script], capture_output=True,
                           text=True, check=True, timeout=timeout_s)
        return p.stdout.strip()

    return run


class AppleScriptTransport:
    """S6 — macOS Chrome via osascript (applescript.py:64-152): open
    location, shrink the window out of the way, scroll ``scroll_times``
    via injected JS, read ``document.documentElement.outerHTML``.

    Every AppleScript program is built here exactly as the reference
    builds it; ``runner(script, timeout_s) -> stdout`` is the only OS
    boundary (default: ``osascript -e``, fail-fast when absent)."""

    JS_TMPL = ('tell application "Google Chrome" \n'
               '    execute active tab of front window javascript "{js}"\n'
               'end tell')
    RESIZE = ('tell application "Google Chrome"\n'
              '    activate\n'
              '    try\n'
              '        set bounds of front window to {100, 100, 101, 101}\n'
              '    on error\n'
              '    end try\n'
              'end tell')

    def __init__(self, wait_seconds: float = 0.0, scroll_times: int = 0,
                 runner=None, timeout_s: float = 60.0):
        self.wait_seconds = wait_seconds
        self.scroll_times = scroll_times
        self.timeout_s = timeout_s
        self._run = runner if runner is not None else _default_osascript_runner()

    def get(self, url: str) -> tuple[int, bytes]:
        try:
            self._run('tell application "Google Chrome" to open location '
                      f'"{url}"', self.timeout_s)
            self._run(self.RESIZE, self.timeout_s)
            if self.wait_seconds:
                time.sleep(self.wait_seconds)
            for _ in range(self.scroll_times):
                self._run(self.JS_TMPL.format(
                    js="window.scrollBy(0, window.innerHeight);"),
                    self.timeout_s)
            html = self._run(self.JS_TMPL.format(
                js="document.documentElement.outerHTML"), self.timeout_s)
            return 200, html.encode()
        except Exception:
            return 502, b""


def _default_xdotool_runner():
    import shutil
    import subprocess

    if shutil.which("xdotool") is None:
        raise NotImplementedError(
            "RpaTransport needs xdotool (a desktop session), absent in "
            "this container — inject runner= (tests use FakeXdotool) or "
            "use CdpTransport/SeleniumTransport against a real endpoint.")

    def run(argv: list[str]) -> str:
        p = subprocess.run(argv, capture_output=True, text=True, check=True)
        return p.stdout

    return run


class RpaTransport:
    """S8 — OS-level keystroke navigation + DevTools read
    (rpa_chrome_controller.py:427-509): activate the Chrome window,
    meta+L to focus the address bar, type the URL, Return; then read
    the page like the reference's controllers do — ``Runtime.evaluate``
    over CDP (rpa_chrome_controller.py:373-385).

    ``runner(argv) -> stdout`` executes the exact xdotool argv lists
    (default: subprocess, fail-fast without the binary);
    ``page_reader() -> html`` supplies the devtools read (pass
    ``devtools=CdpTransport(...)`` on a real desktop)."""

    def __init__(self, runner=None, page_reader=None, devtools=None,
                 settle_s: float = 0.0):
        self._run = runner if runner is not None else _default_xdotool_runner()
        if page_reader is None and devtools is None:
            raise ValueError("RpaTransport needs page_reader= or "
                             "devtools=CdpTransport(...)")
        self._read = page_reader
        self._devtools = devtools
        self.settle_s = settle_s

    def _activate(self) -> None:
        self._run(["xdotool", "search", "--onlyvisible", "--class",
                   "google-chrome", "windowactivate"])

    def get(self, url: str) -> tuple[int, bytes]:
        try:
            self._activate()
            self._run(["xdotool", "key", "ctrl+l"])
            self._run(["xdotool", "type", url])
            self._run(["xdotool", "key", "Return"])
            if self.settle_s:
                time.sleep(self.settle_s)
            if self._read is not None:
                html = self._read()
            else:  # attach to the navigated tab through DevTools
                html = self._devtools.evaluate_active(
                    "document.documentElement.outerHTML")
            return 200, html.encode() if isinstance(html, str) else html
        except Exception:
            return 502, b""
