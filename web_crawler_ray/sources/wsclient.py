"""Minimal RFC 6455 WebSocket CLIENT on the stdlib (socket + base64 +
hashlib) — just enough for JSON-RPC request/response + event streams,
which is all the Chrome DevTools protocol needs (text frames, ping/pong,
close). Public spec: RFC 6455; no external websocket package exists in
this container.

Client→server frames are masked (mandated by the RFC); server→client
frames arrive unmasked, so the big payloads (page HTML) need no XOR
pass. Fragmented messages are reassembled; pings are answered inline.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10


class WebSocketClosed(ConnectionError):
    pass


def accept_key(key: str) -> str:
    """Sec-WebSocket-Accept for a handshake key (shared with servers)."""
    return base64.b64encode(
        hashlib.sha1((key + _GUID).encode()).digest()).decode()


def _mask(payload: bytes, key: bytes) -> bytes:
    # XOR with the 4-byte key cycled; int-based XOR is plenty for the
    # small JSON frames a client sends
    rep = (key * (len(payload) // 4 + 1))[:len(payload)]
    return (int.from_bytes(payload, "little")
            ^ int.from_bytes(rep, "little")).to_bytes(len(payload), "little")


def encode_frame(opcode: int, payload: bytes, masked: bool) -> bytes:
    head = bytes([0x80 | opcode])
    mbit = 0x80 if masked else 0
    n = len(payload)
    if n < 126:
        head += bytes([mbit | n])
    elif n < 1 << 16:
        head += bytes([mbit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mbit | 127]) + struct.pack(">Q", n)
    if masked:
        key = os.urandom(4)
        return head + key + _mask(payload, key)
    return head + payload


class _FrameReader:
    """Shared frame decode over a socket (used by the client here and
    by the in-process fake CDP server in tests)."""

    def __init__(self, sock: socket.socket):
        self.sock = sock

    def read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise WebSocketClosed("socket closed mid-frame")
            buf += chunk
        return buf

    def read_frame(self) -> tuple[int, bool, bytes]:
        b1, b2 = self.read_exact(2)
        fin = bool(b1 & 0x80)
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        n = b2 & 0x7F
        if n == 126:
            n = struct.unpack(">H", self.read_exact(2))[0]
        elif n == 127:
            n = struct.unpack(">Q", self.read_exact(8))[0]
        key = self.read_exact(4) if masked else b""
        payload = self.read_exact(n) if n else b""
        if masked and payload:
            payload = _mask(payload, key)
        return opcode, fin, payload


class WebSocketClient:
    """Blocking text-message client: ``connect → send_text/recv_text →
    close``. ``recv_text`` reassembles fragments, answers pings, and
    raises :class:`WebSocketClosed` on a close frame."""

    def __init__(self, url: str, timeout_s: float = 30.0):
        u = urlparse(url)
        assert u.scheme == "ws", f"only ws:// supported, got {url}"
        self.sock = socket.create_connection(
            (u.hostname, u.port or 80), timeout=timeout_s)
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        key = base64.b64encode(os.urandom(16)).decode()
        req = (f"GET {path} HTTP/1.1\r\nHost: {u.hostname}:{u.port}\r\n"
               "Upgrade: websocket\r\nConnection: Upgrade\r\n"
               f"Sec-WebSocket-Key: {key}\r\n"
               "Sec-WebSocket-Version: 13\r\n\r\n")
        self.sock.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise WebSocketClosed("handshake: connection closed")
            resp += chunk
        status = resp.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise ConnectionError(f"websocket handshake refused: {status!r}")
        want = accept_key(key).encode()
        if want not in resp:
            raise ConnectionError("websocket handshake: bad accept key")
        self._reader = _FrameReader(self.sock)

    def send_text(self, payload: str) -> None:
        self.sock.sendall(encode_frame(OP_TEXT, payload.encode(), masked=True))

    def recv_text(self) -> str:
        parts: list[bytes] = []
        while True:
            opcode, fin, payload = self._reader.read_frame()
            if opcode == OP_PING:
                self.sock.sendall(encode_frame(OP_PONG, payload, masked=True))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                raise WebSocketClosed("server sent close")
            if opcode in (OP_TEXT, OP_BIN, OP_CONT):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()

    def close(self) -> None:
        try:
            self.sock.sendall(encode_frame(OP_CLOSE, b"", masked=True))
        except OSError:
            pass
        self.sock.close()
