"""Live visualization server (utils/liveview.py).

Covers the reference's live-publishing capability (meshcat recording +
publishing, example_base.cc:81-82) headlessly: a raw-socket client
performs the RFC 6455 handshake against the LiveViewer and must receive
each published trajectory as a websocket text frame; plain HTTP must
serve the WebGL viewer page with the live client script injected.
"""
import base64
import hashlib
import json
import socket
import struct

import numpy as np

from idto_tpu.utils.liveview import LiveViewer, _WS_GUID


def _make_viewer():
    from idto_tpu.examples.registry import load_example

    model, cfg, prob, params, q_guess = load_example("pendulum")
    return LiveViewer(model, dt=float(prob.dt), port=0), model, q_guess


class _Buffered:
    """Byte-buffered socket reader: the 101 response and the first frame
    can arrive coalesced in one TCP segment."""

    def __init__(self, sock):
        self.sock = sock
        self.buf = b""

    def recv_exact(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            assert chunk, "socket closed early"
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def read_until(self, marker):
        while marker not in self.buf:
            chunk = self.sock.recv(65536)
            assert chunk, "socket closed early"
            self.buf += chunk
        head, self.buf = self.buf.split(marker, 1)
        return head + marker


def _read_ws_text(r):
    head = r.recv_exact(2)
    assert head[0] & 0x0F == 1, "expected a text frame"
    ln = head[1] & 0x7F
    if ln == 126:
        ln = struct.unpack("!H", r.recv_exact(2))[0]
    elif ln == 127:
        ln = struct.unpack("!Q", r.recv_exact(8))[0]
    return r.recv_exact(ln)


def _ws_handshake(s, key):
    s.sendall(
        (
            "GET / HTTP/1.1\r\nHost: x\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    r = _Buffered(s)
    resp = r.read_until(b"\r\n\r\n")
    return r, resp


def test_http_serves_viewer_page():
    viewer, model, q_guess = _make_viewer()
    try:
        s = socket.create_connection(("127.0.0.1", viewer.port), timeout=5)
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        data = b""
        while True:
            chunk = s.recv(65536)
            if not chunk:
                break
            data += chunk
        text = data.decode("utf-8", errors="ignore")
        assert "200 OK" in text
        assert "WebSocket" in text          # live client injected
        assert "SCENE" in text              # scene bootstrap present
        s.close()
    finally:
        viewer.close()


def test_websocket_stream_delivers_published_trajectories():
    viewer, model, q_guess = _make_viewer()
    try:
        s = socket.create_connection(("127.0.0.1", viewer.port), timeout=5)
        key = base64.b64encode(b"0123456789abcdef").decode()
        r, resp = _ws_handshake(s, key)
        expect = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        assert expect in resp.decode("latin1"), "bad Sec-WebSocket-Accept"

        T = 5
        qs = np.tile(np.asarray(q_guess)[:1], (T + 1, 1))
        qs[:, 0] = np.linspace(0.0, 1.0, T + 1)
        viewer.publish(qs)
        msg = json.loads(_read_ws_text(r))
        assert len(msg["frames"]) == T + 1
        assert msg["dt"] > 0
        ng = model.geoms.num_geoms
        assert len(msg["frames"][0]) == ng

        # Second publish streams again on the same connection.
        viewer.publish(qs[: T])
        msg2 = json.loads(_read_ws_text(r))
        assert len(msg2["frames"]) == T
        s.close()
    finally:
        viewer.close()


def test_late_joiner_receives_last_published():
    viewer, model, q_guess = _make_viewer()
    try:
        qs = np.tile(np.asarray(q_guess)[:1], (3, 1))
        viewer.publish(qs)  # published before anyone connects
        s = socket.create_connection(("127.0.0.1", viewer.port), timeout=5)
        key = base64.b64encode(b"fedcba9876543210").decode()
        r, resp = _ws_handshake(s, key)
        msg = json.loads(_read_ws_text(r))
        assert len(msg["frames"]) == 3
        s.close()
    finally:
        viewer.close()
