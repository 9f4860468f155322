"""In-process protocol servers for the browser transports — the
offline test doubles of S5/S7, same role as ``http_fetch.FakeTransport``
for S1: they speak the REAL wire protocols (W3C WebDriver HTTP JSON;
Chrome DevTools JSON-RPC over RFC 6455 websocket), so driving a
transport against them exercises every line of the client code path;
the browser binary is only ever the far side of the socket.
"""

from __future__ import annotations

import json
import re
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .wsclient import OP_CLOSE, OP_TEXT, _FrameReader, accept_key, encode_frame

DEFAULT_PAGES = {
    "http://x.test/a": "<html><body>alpha <div id='t'>1</div></body></html>",
    "http://x.test/b": "<html><body>beta</body></html>",
}


class WebDriverHandler(BaseHTTPRequestHandler):
    """Single-session W3C WebDriver endpoint: POST /session,
    POST /session/{id}/url, element poll (appears on the 3rd try, to
    exercise wait loops), execute/sync scroll counter, GET source,
    DELETE session. Pages served from ``server.pages``."""

    server_version = "FakeWebDriver/1.0"

    def log_message(self, *a):  # quiet
        pass

    def _json(self, code: int, obj: dict):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        return json.loads(self.rfile.read(n)) if n else {}

    def do_POST(self):
        st = self.server.state
        if self.path == "/session":
            st["caps"] = self._body()
            st["sid"] = "sess-1"
            self._json(200, {"value": {"sessionId": "sess-1",
                                       "capabilities": {}}})
        elif self.path == "/session/sess-1/url":
            st["url"] = self._body()["url"]
            st["element_polls"] = 0
            self._json(200, {"value": None})
        elif self.path == "/session/sess-1/element":
            st["element_polls"] += 1
            if st["element_polls"] >= 3:
                self._json(200, {"value": {
                    "element-6066-11e4-a52e-4f735466cecf": "el-1"}})
            else:
                self._json(404, {"value": {"error": "no such element"}})
        elif self.path == "/session/sess-1/execute/sync":
            st["scrolls"] = st.get("scrolls", 0) + 1
            self._json(200, {"value": None})
        else:
            self._json(404, {"value": {"error": "unknown"}})

    def do_GET(self):
        st = self.server.state
        if self.path == "/session/sess-1/source":
            self._json(200, {"value": self.server.pages.get(st.get("url"), "")})
        else:
            self._json(404, {"value": {}})

    def do_DELETE(self):
        self.server.state["deleted"] = True
        self._json(200, {"value": None})


def start_webdriver_server(pages: dict[str, str] | None = None):
    """Start a fake WebDriver endpoint on an ephemeral port; returns
    (server, port). Call ``server.shutdown()`` when done."""
    srv = ThreadingHTTPServer(("127.0.0.1", 0), WebDriverHandler)
    srv.state = {}
    srv.pages = dict(DEFAULT_PAGES if pages is None else pages)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


class CdpHttpHandler(BaseHTTPRequestHandler):
    """The /json tab-management endpoints of a DevTools-enabled Chrome."""

    def log_message(self, *a):
        pass

    def _json(self, code: int, obj: dict):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/json/version":
            self._json(200, {"Browser": "FakeChrome/1.0"})
        elif self.path in ("/json", "/json/list"):
            # one existing page tab (what keystroke navigation drove)
            self._json(200, [{
                "id": "tab-kb", "type": "page",
                "webSocketDebuggerUrl":
                    f"ws://127.0.0.1:{self.server.state['ws_port']}"
                    "/devtools/tab-kb",
            }])
        else:
            self._json(404, {})

    def do_PUT(self):
        if self.path == "/json/new":
            self.server.state["tabs"] = self.server.state.get("tabs", 0) + 1
            tab_id = f"tab-{self.server.state['tabs']}"
            self._json(200, {
                "id": tab_id,
                "webSocketDebuggerUrl":
                    f"ws://127.0.0.1:{self.server.state['ws_port']}"
                    f"/devtools/{tab_id}",
            })
        else:
            self._json(404, {})

    def do_DELETE(self):
        self.server.state["closed"] = self.path.rsplit("/", 1)[-1]
        self._json(200, {})


def _serve_cdp_ws_once(sock: socket.socket, state: dict, pages: dict):
    """One-connection RFC 6455 server answering DevTools JSON-RPC like
    Chrome: ack the enables; Page.navigate emits the loadEventFired
    EVENT before the RPC ack (clients must keep matching ids across
    interleaved events); Runtime.evaluate returns the navigated page's
    HTML."""
    conn, _ = sock.accept()
    try:
        req = b""
        while b"\r\n\r\n" not in req:
            req += conn.recv(4096)
        key = [line.split(b": ", 1)[1] for line in req.split(b"\r\n")
               if line.lower().startswith(b"sec-websocket-key")][0].decode()
        conn.sendall((
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n").encode())
        reader = _FrameReader(conn)
        # a fresh connection sees whatever the (fake) keyboard navigated
        # the browser to — shared desktop state, like real Chrome
        url = state.get("keyboard_url", "")
        while True:
            opcode, _fin, payload = reader.read_frame()
            if opcode == OP_CLOSE:
                return
            if opcode != OP_TEXT:
                continue
            msg = json.loads(payload)
            mid, method = msg["id"], msg["method"]
            if method == "Page.navigate":
                url = msg["params"]["url"]
                state["navigated"] = url
                conn.sendall(encode_frame(OP_TEXT, json.dumps(
                    {"method": "Page.loadEventFired",
                     "params": {"timestamp": 1.0}}).encode(), masked=False))
                conn.sendall(encode_frame(OP_TEXT, json.dumps(
                    {"id": mid, "result": {"frameId": "f1"}}).encode(),
                    masked=False))
            elif method == "Runtime.evaluate":
                conn.sendall(encode_frame(OP_TEXT, json.dumps(
                    {"id": mid, "result": {"result": {
                        "type": "string",
                        "value": pages.get(url, "")}}}).encode(),
                    masked=False))
            else:
                conn.sendall(encode_frame(OP_TEXT, json.dumps(
                    {"id": mid, "result": {}}).encode(), masked=False))
    finally:
        conn.close()


def start_cdp_server(pages: dict[str, str] | None = None):
    """Start a fake DevTools endpoint (HTTP /json + websocket) on
    ephemeral ports; returns (http_server, http_port, ws_socket). Call
    ``http_server.shutdown()`` and ``ws_socket.close()`` when done."""
    pages = dict(DEFAULT_PAGES if pages is None else pages)
    http_srv = ThreadingHTTPServer(("127.0.0.1", 0), CdpHttpHandler)
    ws_sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    ws_sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    ws_sock.bind(("127.0.0.1", 0))
    ws_sock.listen(4)
    http_srv.state = {"ws_port": ws_sock.getsockname()[1]}

    def ws_loop():
        while True:
            try:
                _serve_cdp_ws_once(ws_sock, http_srv.state, pages)
            except OSError:
                return

    threading.Thread(target=http_srv.serve_forever, daemon=True).start()
    threading.Thread(target=ws_loop, daemon=True).start()
    return http_srv, http_srv.server_address[1], ws_sock


class FakeOsascript:
    """An ``osascript``-shaped runner for AppleScriptTransport tests:
    parses the exact AppleScript programs the transport builds (open
    location / resize / javascript eval) and emulates a scriptable
    Chrome over a page dict. Records every script for assertions."""

    OPEN_RE = re.compile(r'open location "([^"]+)"')
    JS_RE = re.compile(r'javascript "(.*)"', re.S)

    def __init__(self, pages: dict[str, str] | None = None):
        self.pages = dict(DEFAULT_PAGES if pages is None else pages)
        self.current_url = ""
        self.scrolls = 0
        self.scripts: list[str] = []

    def __call__(self, script: str, timeout_s: float) -> str:
        self.scripts.append(script)
        m = self.OPEN_RE.search(script)
        if m:
            self.current_url = m.group(1)
            return ""
        m = self.JS_RE.search(script)
        if m:
            js = m.group(1)
            if "scrollBy" in js:
                self.scrolls += 1
                return ""
            if "outerHTML" in js:
                return self.pages.get(self.current_url, "")
            return ""
        return ""  # resize / activate scripts


class FakeXdotool:
    """An ``xdotool``-shaped runner for RpaTransport tests: replays the
    keystroke state machine (focus address bar, type, Return ⇒
    navigation). Pass ``cdp_state`` (the fake CDP server's state dict)
    to share the navigated URL with DevTools reads, like a real
    desktop. Records every argv for assertions."""

    def __init__(self, pages: dict[str, str] | None = None,
                 cdp_state: dict | None = None):
        self.pages = dict(DEFAULT_PAGES if pages is None else pages)
        self.cdp_state = cdp_state
        self.current_url = ""
        self.typed = ""
        self.argvs: list[list[str]] = []

    def __call__(self, argv: list[str]) -> str:
        self.argvs.append(list(argv))
        if argv[0] != "xdotool":
            raise FileNotFoundError(argv[0])
        cmd = argv[1]
        if cmd == "search":
            return "12345678\n"  # a window id: Chrome is "running"
        if cmd == "type":
            self.typed += argv[2]
            return ""
        if cmd == "key":
            if argv[2] == "ctrl+l":
                self.typed = ""  # address bar focused & cleared
            elif argv[2] == "Return" and self.typed:
                self.current_url = self.typed
                if self.cdp_state is not None:
                    self.cdp_state["keyboard_url"] = self.typed
            return ""
        return ""

    def page_reader(self) -> str:
        return self.pages.get(self.current_url, "")
