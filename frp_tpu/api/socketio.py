"""WebSocket (RFC 6455) + Engine.IO v4 + Socket.IO v5 server.

The React dashboard connects with socket.io-client over a websocket-only
transport (reference ``frontend/src/api.js:128-167``), so this implements the
exact wire protocol that client speaks:

  HTTP GET /socket.io/?EIO=4&transport=websocket  + Upgrade: websocket
  -> ws frames carrying engine.io packets:
       '0{...}'  open (sid, ping interval/timeout)
       '2' / '3' ping / pong (server pings, client pongs)
       '4' + socket.io packet:
            '0' connect        -> reply '40{"sid":...}'
            '2["event",data]'  -> client emit
  server emits: '42["event",data]'

Events bridged from the platform EventHub: job_started / job_finished /
job_failed (reference async_task_manager.py:242-296) plus new_alert /
update_movement_log / update_tracking_feed — the three events the reference
frontend listens for but the reference backend never emits (SURVEY.md
section 5 observability note).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import struct
import time
import uuid

from frp_tpu.utils.logger import get_logger

logger = get_logger("frp.api.socketio")

WS_MAGIC = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
PING_INTERVAL_MS = 25000
PING_TIMEOUT_MS = 20000


# ---------------------------------------------------------------------------
# RFC 6455 framing
# ---------------------------------------------------------------------------

def accept_key(key: str) -> str:
    return base64.b64encode(hashlib.sha1((key + WS_MAGIC).encode()).digest()).decode()


def encode_frame(payload: bytes, opcode: int = 0x1) -> bytes:
    header = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        header += bytes([n])
    elif n < 65536:
        header += bytes([126]) + struct.pack(">H", n)
    else:
        header += bytes([127]) + struct.pack(">Q", n)
    return header + payload


async def read_frame(reader: asyncio.StreamReader):
    """Returns (opcode, payload) or None on close/EOF."""
    try:
        head = await reader.readexactly(2)
    except (asyncio.IncompleteReadError, ConnectionResetError):
        return None
    fin_op, mask_len = head[0], head[1]
    opcode = fin_op & 0x0F
    masked = bool(mask_len & 0x80)
    length = mask_len & 0x7F
    if length == 126:
        length = struct.unpack(">H", await reader.readexactly(2))[0]
    elif length == 127:
        length = struct.unpack(">Q", await reader.readexactly(8))[0]
    mask = await reader.readexactly(4) if masked else b"\x00" * 4
    data = bytearray(await reader.readexactly(length)) if length else bytearray()
    if masked:
        for i in range(len(data)):
            data[i] ^= mask[i % 4]
    if opcode == 0x8:  # close
        return None
    return opcode, bytes(data)


# ---------------------------------------------------------------------------
# Socket.IO server
# ---------------------------------------------------------------------------

class SocketIOServer:
    def __init__(self, event_hub=None, path: str = "/socket.io/"):
        self.path = path
        self._clients: dict[str, asyncio.Queue] = {}
        self._lock = asyncio.Lock()
        self._loop: asyncio.AbstractEventLoop | None = None
        self.connections_total = 0
        if event_hub is not None:
            event_hub.subscribe(self._on_platform_event)

    # thread-safe bridge from platform threads into the asyncio loop
    def _on_platform_event(self, event: str, data):
        loop = self._loop
        if loop is None or loop.is_closed():
            return
        loop.call_soon_threadsafe(self._broadcast_nowait, event, data)

    def _broadcast_nowait(self, event: str, data):
        packet = "42" + json.dumps([event, data], default=str)
        for q in list(self._clients.values()):
            q.put_nowait(packet)

    async def emit(self, event: str, data):
        self._broadcast_nowait(event, data)

    @property
    def client_count(self) -> int:
        return len(self._clients)

    # ------------------------------------------------------------------
    async def handle_upgrade(self, request, reader, writer):
        """Entry from HTTPServer on Upgrade: websocket."""
        self._loop = asyncio.get_running_loop()
        # Validate the upgrade target BEFORE completing the handshake
        # (RFC 6455 §4.2.2: a failed opening handshake must be an HTTP error,
        # not a 101 followed by a hangup).
        if not request.path.startswith(self.path.rstrip("/")):
            body = b'{"detail": "Not Found"}'
            writer.write(
                (
                    "HTTP/1.1 404 Not Found\r\n"
                    "Content-Type: application/json\r\n"
                    f"Content-Length: {len(body)}\r\n"
                    "Connection: close\r\n\r\n"
                ).encode()
                + body
            )
            await writer.drain()
            writer.close()
            return
        key = request.headers.get("sec-websocket-key", "")
        resp = (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
        )
        writer.write(resp.encode())
        await writer.drain()

        sid = uuid.uuid4().hex
        open_packet = "0" + json.dumps(
            {
                "sid": sid,
                "upgrades": [],
                "pingInterval": PING_INTERVAL_MS,
                "pingTimeout": PING_TIMEOUT_MS,
                "maxPayload": 1000000,
            }
        )
        writer.write(encode_frame(open_packet.encode()))
        await writer.drain()

        queue: asyncio.Queue = asyncio.Queue()
        async with self._lock:
            self._clients[sid] = queue
            self.connections_total += 1
        logger.info("socket.io client connected: %s", sid)

        sender = asyncio.create_task(self._send_loop(writer, queue))
        pinger = asyncio.create_task(self._ping_loop(queue))
        try:
            await self._recv_loop(reader, queue, sid)
        finally:
            sender.cancel()
            pinger.cancel()
            async with self._lock:
                self._clients.pop(sid, None)
            logger.info("socket.io client disconnected: %s", sid)

    async def _send_loop(self, writer, queue: asyncio.Queue):
        try:
            while True:
                packet = await queue.get()
                if isinstance(packet, bytes):
                    # pre-encoded raw frame (e.g. a WS-level pong)
                    writer.write(packet)
                else:
                    writer.write(encode_frame(packet.encode()))
                await writer.drain()
        except (asyncio.CancelledError, ConnectionResetError, BrokenPipeError):
            pass

    async def _ping_loop(self, queue: asyncio.Queue):
        try:
            while True:
                await asyncio.sleep(PING_INTERVAL_MS / 1000)
                queue.put_nowait("2")  # engine.io ping
        except asyncio.CancelledError:
            pass

    async def _recv_loop(self, reader, queue: asyncio.Queue, sid: str):
        while True:
            frame = await read_frame(reader)
            if frame is None:
                return
            opcode, payload = frame
            if opcode == 0x9:  # ws ping -> ws pong (RFC 6455 §5.5.3:
                # pong must carry the ping's application data verbatim)
                queue.put_nowait(encode_frame(payload, opcode=0xA))
                continue
            if opcode != 0x1:
                continue
            text = payload.decode("utf-8", "replace")
            if not text:
                continue
            eio_type = text[0]
            if eio_type == "3":  # engine.io pong
                continue
            if eio_type == "2":  # engine.io ping (client-initiated, older)
                queue.put_nowait("3")
                continue
            if eio_type == "4":  # socket.io packet
                sio = text[1:]
                if sio.startswith("0"):  # connect -> ack
                    queue.put_nowait("40" + json.dumps({"sid": sid}))
                elif sio.startswith("2"):  # event from client
                    try:
                        event, *args = json.loads(sio[1:])
                        logger.debug("client event %s: %s", event, args)
                    except (json.JSONDecodeError, ValueError):
                        pass
                elif sio.startswith("1"):  # disconnect
                    return
