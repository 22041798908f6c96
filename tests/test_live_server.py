"""Live-socket integration: boots the real HTTPServer on an ephemeral port and
exercises HTTP parsing, JSON + multipart requests, CORS headers, streaming,
and the full WebSocket/Engine.IO/Socket.IO handshake + event push."""

import asyncio
import base64
import json
import os
import struct

import numpy as np
import pytest

from frp_tpu.api.http import HTTPServer
from frp_tpu.api.main import build_app
from frp_tpu.api.socketio import read_frame
from frp_tpu.config import load_config
from frp_tpu.platform.context import AppContext
from tests.fakes import FakeEngine


@pytest.fixture()
def server_port(tmp_path):
    """Run the server in a dedicated event loop thread; yield the port."""
    import threading

    cfg = load_config(
        data_dir=str(tmp_path / "data"), log_dir=str(tmp_path / "logs"),
        min_face_quality=0.0,
    )
    ctx = AppContext(cfg=cfg, engine=FakeEngine(), camera_configs=[
        {"id": 0, "name": "Cam A", "source": "synthetic:64x48"},
    ])
    router, sio, ctx = build_app(ctx)
    server = HTTPServer(router, ws_handler=sio.handle_upgrade)
    loop = asyncio.new_event_loop()
    started = threading.Event()
    port_holder = {}

    def run():
        asyncio.set_event_loop(loop)

        async def boot():
            s = await server.start("127.0.0.1", 0)
            port_holder["port"] = s.sockets[0].getsockname()[1]
            started.set()

        loop.run_until_complete(boot())
        loop.run_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(10)
    yield port_holder["port"], ctx
    loop.call_soon_threadsafe(loop.stop)
    ctx.shutdown()


async def _http(port, method, path, headers=None, body=b""):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    headers = dict(headers or {})
    headers.setdefault("Host", "localhost")
    if body:
        headers["Content-Length"] = str(len(body))
    head = f"{method} {path} HTTP/1.1\r\n" + "".join(
        f"{k}: {v}\r\n" for k, v in headers.items()
    ) + "\r\n"
    writer.write(head.encode() + body)
    await writer.drain()
    status_line = await reader.readline()
    status = int(status_line.split()[1])
    resp_headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, v = line.decode().split(":", 1)
        resp_headers[k.strip().lower()] = v.strip()
    length = int(resp_headers.get("content-length", 0))
    data = await reader.readexactly(length) if length else b""
    writer.close()
    return status, resp_headers, data


def test_http_get_root(server_port):
    port, ctx = server_port

    async def go():
        return await _http(port, "GET", "/")

    status, headers, body = asyncio.run(go())
    assert status == 200
    assert headers["access-control-allow-origin"] == "*"
    data = json.loads(body)
    assert data["status"] == "running"


def test_http_multipart_upload_over_socket(server_port):
    port, ctx = server_port
    import cv2

    img = np.full((48, 48, 3), 200, np.uint8)
    _, jpeg = cv2.imencode(".jpg", img)
    boundary = "livetestboundary"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="target"\r\n\r\nlive_person\r\n'
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="p.jpg"\r\nContent-Type: image/jpeg\r\n\r\n'
    ).encode() + jpeg.tobytes() + f"\r\n--{boundary}--\r\n".encode()

    async def go():
        return await _http(
            port, "POST", "/face/upload",
            headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
            body=body,
        )

    status, _, resp = asyncio.run(go())
    assert status == 200, resp  # reference face.py:292 returns 200
    assert json.loads(resp)["target"] == "live_person"
    assert "live_person" in ctx.face_service.get_all_targets()


def test_http_404_and_keepalive(server_port):
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        for i in range(2):  # two requests on one connection
            writer.write(b"GET /nope HTTP/1.1\r\nHost: x\r\n\r\n")
            await writer.drain()
            line = await reader.readline()
            assert b"404" in line
            while True:
                h = await reader.readline()
                if h in (b"\r\n", b""):
                    break
                if h.lower().startswith(b"content-length"):
                    n = int(h.split(b":")[1])
            await reader.readexactly(n)
        writer.close()

    asyncio.run(go())


def test_socketio_handshake_and_event_push(server_port):
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        key = base64.b64encode(os.urandom(16)).decode()
        writer.write(
            (
                f"GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n"
                f"Host: localhost\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        line = await reader.readline()
        assert b"101" in line
        while (await reader.readline()) not in (b"\r\n", b""):
            pass

        # engine.io open packet
        op, payload = await asyncio.wait_for(read_frame(reader), 5)
        text = payload.decode()
        assert text.startswith("0")
        sid = json.loads(text[1:])["sid"]
        assert sid

        # socket.io connect (client->server frames must be masked)
        def client_frame(data: bytes) -> bytes:
            mask = os.urandom(4)
            masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
            header = bytes([0x81])
            n = len(data)
            assert n < 126
            return header + bytes([0x80 | n]) + mask + masked

        writer.write(client_frame(b"40"))
        await writer.drain()
        op, payload = await asyncio.wait_for(read_frame(reader), 5)
        assert payload.decode().startswith("40")

        # platform event -> pushed as 42["new_alert", ...]
        ctx.events.emit("new_alert", {"target": "x", "priority": "high"})
        while True:
            frame = await asyncio.wait_for(read_frame(reader), 5)
            op, payload = frame
            text = payload.decode()
            if text.startswith("42"):
                event, data = json.loads(text[2:])
                assert event == "new_alert" and data["target"] == "x"
                break
        writer.close()

    asyncio.run(go())


def test_chunked_body_roundtrip_and_oversize_413(server_port):
    """Chunked transfer-encoding: a small body parses; a chunk stream whose
    cumulative size exceeds MAX_BODY is answered with a real 413 response
    (not a silent connection drop)."""
    port, ctx = server_port

    async def go():
        # small chunked JSON body
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        payload = json.dumps({"weights": {"w": [1.0, 2.0]}}).encode()
        half = len(payload) // 2
        chunks = b"".join(
            b"%x\r\n%s\r\n" % (len(c), c) for c in (payload[:half], payload[half:])
        ) + b"0\r\n\r\n"
        writer.write(
            b"POST /face/fl/validate HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + chunks
        )
        await writer.drain()
        line = await reader.readline()
        assert b"200" in line, line
        writer.close()

        # oversize: declare one chunk far past MAX_BODY; server must answer
        # 413 without waiting for the (never-sent) data
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(
            b"POST /face/fl/validate HTTP/1.1\r\nHost: x\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n"
            b"C800000\r\n"  # 0xC800000 = 200 MB > MAX_BODY
        )
        await writer.drain()
        line = await asyncio.wait_for(reader.readline(), 5)
        assert b"413" in line, line
        writer.close()

    asyncio.run(go())


def test_ws_ping_answered_with_pong_payload_echo(server_port):
    """RFC 6455 5.5.3: a ping must be answered with a pong carrying the
    ping's application data (round 1 sent an empty TEXT frame instead)."""
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        key = base64.b64encode(os.urandom(16)).decode()
        writer.write(
            (
                f"GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n"
                f"Host: localhost\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        assert b"101" in await reader.readline()
        while (await reader.readline()) not in (b"\r\n", b""):
            pass
        await asyncio.wait_for(read_frame(reader), 5)  # engine.io open

        # masked client ping with payload
        data = b"keepalive-7"
        mask = os.urandom(4)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        writer.write(bytes([0x89, 0x80 | len(data)]) + mask + masked)
        await writer.drain()
        while True:
            op, payload = await asyncio.wait_for(read_frame(reader), 5)
            if op == 0xA:
                assert payload == data
                break
        writer.close()

    asyncio.run(go())


def test_ws_upgrade_on_wrong_path_is_http_error(server_port):
    """Upgrade to a non-socket.io path must fail the handshake with an HTTP
    error, not a 101 followed by a hangup."""
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        key = base64.b64encode(os.urandom(16)).decode()
        writer.write(
            (
                f"GET /not-socket-io HTTP/1.1\r\n"
                f"Host: localhost\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        line = await asyncio.wait_for(reader.readline(), 5)
        assert b"404" in line, line
        writer.close()

    asyncio.run(go())


async def _ws_connect(port):
    """Minimal WS client handshake; returns (reader, writer) past the
    engine.io open packet."""
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    key = base64.b64encode(os.urandom(16)).decode()
    writer.write(
        (
            f"GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\n"
            f"Host: localhost\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\nSec-WebSocket-Version: 13\r\n\r\n"
        ).encode()
    )
    await writer.drain()
    assert b"101" in await reader.readline()
    while (await reader.readline()) not in (b"\r\n", b""):
        pass
    await asyncio.wait_for(read_frame(reader), 5)  # engine.io open
    return reader, writer


def _client_frame(data: bytes, opcode=0x1, fin=True) -> bytes:
    mask = os.urandom(4)
    masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    head = bytes([(0x80 if fin else 0) | opcode])
    n = len(data)
    if n < 126:
        head += bytes([0x80 | n])
    elif n < 65536:
        head += bytes([0x80 | 126]) + struct.pack(">H", n)
    else:
        head += bytes([0x80 | 127]) + struct.pack(">Q", n)
    return head + mask + masked


async def _expect_pong(reader, writer, payload=b"alive"):
    writer.write(_client_frame(payload, opcode=0x9))
    await writer.drain()
    while True:
        op, data = await asyncio.wait_for(read_frame(reader), 5)
        if op == 0xA:
            assert data == payload
            return


def test_ws_fragmented_client_message_reassembled(server_port):
    """RFC 6455 5.4: a text message split across FIN=0 + continuation frames
    must reassemble; the session must stay in sync afterwards."""
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        msg = b'42["client_ping",{"from":"fragmented"}]'
        writer.write(_client_frame(msg[:10], opcode=0x1, fin=False))
        writer.write(_client_frame(msg[10:25], opcode=0x0, fin=False))
        writer.write(_client_frame(msg[25:], opcode=0x0, fin=True))
        await writer.drain()
        await _expect_pong(reader, writer)  # session still alive + in sync
        writer.close()

    asyncio.run(go())


def test_ws_control_frame_interleaved_mid_fragmentation(server_port):
    """A ping BETWEEN fragments must be answered without corrupting the
    partially reassembled message."""
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        msg = b'42["evt",{"k":1}]'
        writer.write(_client_frame(msg[:6], opcode=0x1, fin=False))
        writer.write(_client_frame(b"mid", opcode=0x9))  # ping mid-message
        writer.write(_client_frame(msg[6:], opcode=0x0, fin=True))
        await writer.drain()
        while True:
            op, data = await asyncio.wait_for(read_frame(reader), 5)
            if op == 0xA:
                assert data == b"mid"
                break
        await _expect_pong(reader, writer)
        writer.close()

    asyncio.run(go())


def test_ws_large_payload_64bit_length(server_port):
    """>65535-byte client frame exercises the 64-bit length path (the open
    packet advertises maxPayload 1MB)."""
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        big = b'42["blob","' + b"x" * 70000 + b'"]'
        writer.write(_client_frame(big))
        await writer.drain()
        await _expect_pong(reader, writer)
        writer.close()

    asyncio.run(go())


def test_socketio_binary_event_attachments(server_port):
    """socket.io v5 BINARY_EVENT: '451-' header + one binary attachment must
    not desync the session (reference clients can emit Blobs)."""
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        header = b'451-["frame",{"_placeholder":true,"num":0}]'
        writer.write(_client_frame(header))
        writer.write(_client_frame(b"\x01\x02\x03\xff" * 100, opcode=0x2))
        await writer.drain()
        await _expect_pong(reader, writer)
        writer.close()

    asyncio.run(go())


def test_ws_close_frame_echoed(server_port):
    """RFC 6455 5.5.1: server answers a close frame with a close frame."""
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        writer.write(_client_frame(struct.pack(">H", 1000), opcode=0x8))
        await writer.drain()
        while True:
            frame = await asyncio.wait_for(read_frame(reader), 5)
            assert frame is not None, "connection dropped without close echo"
            op, data = frame
            if op == 0x8:
                assert data[:2] == struct.pack(">H", 1000)
                break
        writer.close()

    asyncio.run(go())


def test_engineio_ping_timeout_disconnects(server_port, monkeypatch):
    """A client that never answers engine.io pings is dropped after
    pingInterval + pingTimeout (engine.io v4 heartbeat)."""
    import frp_tpu.api.socketio as sio_mod

    monkeypatch.setattr(sio_mod, "PING_INTERVAL_MS", 300)
    monkeypatch.setattr(sio_mod, "PING_TIMEOUT_MS", 200)
    port, ctx = server_port

    async def go():
        reader, writer = await _ws_connect(port)
        # read frames without ever answering pings; server must close
        deadline = asyncio.get_event_loop().time() + 10
        while asyncio.get_event_loop().time() < deadline:
            try:
                frame = await asyncio.wait_for(read_frame(reader), 3)
            except asyncio.TimeoutError:
                frame = True  # keep waiting
            if frame is None:
                return  # server closed us: pass
        raise AssertionError("server kept a silent client past the timeout")

    asyncio.run(go())


def test_malformed_input_does_not_kill_the_server(server_port):
    """Garbage-tolerant edge: several classes of hostile/broken input, each
    on its own connection; the server must answer every class gracefully
    (error response or clean close — never a hang) and KEEP SERVING."""
    port, ctx = server_port
    rng = __import__("random").Random(0)

    async def send_raw(data: bytes, read_limit=4096):
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(data)
        try:
            await writer.drain()
            got = await asyncio.wait_for(reader.read(read_limit), 5)
        except (asyncio.TimeoutError, ConnectionError):
            got = b""
        finally:
            writer.close()
        return got

    async def go():
        cases = [
            bytes(rng.randrange(256) for _ in range(512)),        # pure noise
            b"\x00\x01\x02\r\n\r\n",                               # binary junk
            b"GET\r\n\r\n",                                        # broken request line
            b"FROB / HTTP/1.1\r\nHost: x\r\n\r\n",                # unknown method
            b"GET / HTTP/9.9\r\nHost: x\r\n\r\n",                 # weird version
            b"GET / HTTP/1.1\r\n" + b"X-A: " + b"y" * 300000 + b"\r\n\r\n",  # huge header
            b"GET / HTTP/1.1\r\nHost: x\r\nContent-Length: banana\r\n\r\n",  # bad length
            # multipart that declares a boundary but never sends one
            b"POST /face/upload HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: multipart/form-data; boundary=b\r\n"
            b"Content-Length: 11\r\n\r\nhello world",
            # upgrade handshake then raw garbage instead of WS frames
            b"GET /socket.io/?EIO=4&transport=websocket HTTP/1.1\r\nHost: x\r\n"
            b"Upgrade: websocket\r\nConnection: Upgrade\r\n"
            b"Sec-WebSocket-Key: AAAAAAAAAAAAAAAAAAAAAA==\r\n"
            b"Sec-WebSocket-Version: 13\r\n\r\n"
            + bytes(rng.randrange(256) for _ in range(256)),
        ]
        for i, data in enumerate(cases):
            await send_raw(data)  # must not hang or kill the loop
            # server still alive after every case
            status, _, body = await _http(port, "GET", "/")
            assert status == 200, f"server unhealthy after case {i}"
        # and the websocket path still works end-to-end afterward
        status, _, _ = await _http(port, "GET", "/camera/status")
        assert status == 200

    asyncio.run(go())


def test_concurrent_mixed_load(server_port):
    """16 concurrent clients hammer mixed endpoints (enrolls, compares,
    scans, FL uploads + aggregate, snapshots, status polls) while a socket
    client listens — every request must complete successfully and the final
    state must be consistent (all enrollments present, FL round advanced)."""
    port, ctx = server_port
    import cv2

    img = np.full((48, 48, 3), 180, np.uint8)
    _, jpeg = cv2.imencode(".jpg", img)
    jpeg = jpeg.tobytes()

    def multipart(target):
        boundary = "stressb"
        body = (
            f'--{boundary}\r\nContent-Disposition: form-data; name="target"\r\n\r\n{target}\r\n'
            f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
            f'filename="{target}.jpg"\r\nContent-Type: image/jpeg\r\n\r\n'
        ).encode() + jpeg + f"\r\n--{boundary}--\r\n".encode()
        return body, {"Content-Type": f"multipart/form-data; boundary={boundary}"}

    async def enroll(i):
        body, headers = multipart(f"stress_{i}")
        status, _, resp = await _http(port, "POST", "/face/upload", headers=headers, body=body)
        assert status == 200, resp
        return json.loads(resp)["target"]

    async def compare():
        body, headers = multipart("probe")
        status, _, resp = await _http(port, "POST", "/face/compare", headers=headers, body=body)
        assert status == 200
        return json.loads(resp)["status"]

    async def scan():
        status, _, resp = await _http(port, "GET", "/camera/alerts")
        assert status == 200
        return json.loads(resp)["status"]

    async def fl_upload(i):
        payload = json.dumps({"target": f"flc_{i}", "weights": {"l1": [float(i), 1.0]}}).encode()
        status, _, resp = await _http(
            port, "POST", "/face/fl/upload_weights",
            headers={"Content-Type": "application/json"}, body=payload)
        assert status == 200, resp
        return True

    async def snapshot():
        status, _, _ = await _http(port, "GET", "/api/camera/0/snapshot")
        assert status in (200, 404)
        return True

    async def poll():
        status, _, resp = await _http(port, "GET", "/camera/status")
        assert status == 200
        return "status" in json.loads(resp)

    async def go():
        tasks = []
        for i in range(4):
            tasks += [enroll(i), compare(), scan(), fl_upload(i), snapshot(), poll()]
        results = await asyncio.gather(*tasks)
        assert all(r for r in results)
        # aggregate once everything landed
        status, _, resp = await _http(
            port, "POST", "/face/fl/aggregate",
            headers={"Content-Type": "application/json"}, body=b"{}")
        assert status == 200 and json.loads(resp)["new_model_version"] >= 1

    asyncio.run(go())
    # state consistency after the storm
    targets = ctx.face_service.get_all_targets()
    assert {f"stress_{i}" for i in range(4)} <= set(targets)


def test_multipart_binary_trailing_newlines_preserved(server_port):
    """A binary upload whose content ENDS in CR/LF bytes must arrive intact
    (strip(b'\\r\\n') used to remove every trailing newline byte)."""
    port, ctx = server_port
    payload = b"\x00binary-tail\r\n\r\n\n\r\n"  # ends in CRLF soup
    boundary = "bintest"
    body = (
        f'--{boundary}\r\nContent-Disposition: form-data; name="file"; '
        f'filename="blob.bin"\r\nContent-Type: application/octet-stream\r\n\r\n'
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()

    # parse through the real Request.form()
    from frp_tpu.api.http import Request

    req = Request(
        "POST", "/x", {}, {"content-type": f"multipart/form-data; boundary={boundary}"},
        body,
    )
    fields, files = req.form()
    assert files["file"].data == payload


def test_malformed_content_length_is_400(server_port):
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\nContent-Length: banana\r\n\r\n")
        await writer.drain()
        line = await asyncio.wait_for(reader.readline(), 5)
        writer.close()
        return line

    line = asyncio.run(go())
    assert b"400" in line, line


def test_oversized_header_section_431(server_port):
    port, ctx = server_port

    async def go():
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"GET / HTTP/1.1\r\nHost: x\r\n")
        writer.write(b"X-Big: " + b"a" * 70000 + b"\r\n\r\n")
        await writer.drain()
        line = await asyncio.wait_for(reader.readline(), 5)
        writer.close()
        return line

    line = asyncio.run(go())
    assert b"431" in line, line


def test_concurrent_scans_serialized(server_port):
    """run_scan holds a thread-level mutex: the background loop and HTTP
    handlers must never scan concurrently (cv2 reads are not thread-safe
    and duplicate alerts would fire)."""
    import threading
    import time as _time

    port, ctx = server_port
    active = []
    overlap = []
    orig = ctx.engine.process_frames

    def slow_process(*a, **k):
        active.append(1)
        if len(active) - len(overlap) > 1:
            overlap.append(1)
        _time.sleep(0.05)
        out = orig(*a, **k)
        active.pop()
        return out

    ctx.engine.process_frames = slow_process
    try:
        threads = [
            threading.Thread(target=ctx.run_scan, args=(0.6, 1, 10))
            for _ in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        ctx.engine.process_frames = orig
    assert not overlap, "two scans ran concurrently"
