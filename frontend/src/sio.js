/* Self-built Socket.IO v5 / Engine.IO v4 browser client (websocket transport).
 *
 * Drop-in for the subset of `socket.io-client` the reference frontend uses
 * (reference frontend/src/api.js:128-167, App.jsx:189-206,
 * FaceUpload.jsx:99-115): `io(base, opts)` returning a socket with
 * `on/off/emit/connected/id/disconnect`, auto-connect, reconnection with
 * bounded attempts, and the `connect` / `disconnect` / `connect_error`
 * lifecycle events. Implements the wire protocol natively:
 *
 *   engine.io v4:  '0'=open '1'=close '2'=ping '3'=pong '4'=message
 *   socket.io v5:  '0'=CONNECT '1'=DISCONNECT '2'=EVENT '3'=ACK
 *                  '4'=CONNECT_ERROR '5'=BINARY_EVENT '6'=BINARY_ACK
 *
 * Binary events ('45<n>-' + n attachment frames with {_placeholder,num}
 * markers) are reassembled before dispatch, mirroring the server's support
 * (frp_tpu/api/socketio.py).
 */

const RECONNECT_BASE_MS = 500;
const RECONNECT_MAX_MS = 5000;

function buildWsUrl(base, path, query) {
  let origin;
  if (base) {
    origin = base.replace(/^http/, "ws").replace(/\/+$/, "");
  } else {
    const proto = location.protocol === "https:" ? "wss:" : "ws:";
    origin = `${proto}//${location.host}`;
  }
  const params = new URLSearchParams({ EIO: "4", transport: "websocket" });
  for (const [k, v] of Object.entries(query || {})) params.set(k, String(v));
  const p = (path || "/socket.io").replace(/\/+$/, "");
  return `${origin}${p}/?${params.toString()}`;
}

/** Replace {_placeholder:true,num:i} markers with the i-th binary buffer. */
function hydratePlaceholders(value, buffers) {
  if (value && typeof value === "object") {
    if (value._placeholder === true && Number.isInteger(value.num)) {
      return buffers[value.num];
    }
    if (Array.isArray(value)) return value.map((v) => hydratePlaceholders(v, buffers));
    const out = {};
    for (const [k, v] of Object.entries(value)) out[k] = hydratePlaceholders(v, buffers);
    return out;
  }
  return value;
}

class Socket {
  constructor(base, opts = {}) {
    this._base = base || "";
    this._path = opts.path || "/socket.io";
    this._query = opts.query || {};
    this._auth = opts.auth || null;
    this._reconnection = opts.reconnection !== false;
    this._reconnectionAttempts = opts.reconnectionAttempts ?? 5;
    this._handlers = new Map(); // event -> Set<fn>
    this._acks = new Map(); // ack id -> fn
    this._ackId = 0;
    this._attempts = 0;
    this._ws = null;
    this._pingTimer = null;
    this._pendingBinary = null; // {header, need, buffers}
    this.id = null;
    this.connected = false;
    this._closedByUser = false;
    if (opts.autoConnect !== false) this.connect();
  }

  on(event, fn) {
    if (!this._handlers.has(event)) this._handlers.set(event, new Set());
    this._handlers.get(event).add(fn);
    return this;
  }

  off(event, fn) {
    const set = this._handlers.get(event);
    if (!set) return this;
    if (fn) set.delete(fn);
    else set.clear();
    return this;
  }

  _fire(event, ...args) {
    const set = this._handlers.get(event);
    if (!set) return;
    for (const fn of [...set]) {
      try {
        fn(...args);
      } catch (e) {
        console.warn(`[sio] handler error for '${event}'`, e);
      }
    }
  }

  /** emit("event", ...args[, ackCallback]) — socket.io EVENT packet. */
  emit(event, ...args) {
    let ack = null;
    if (args.length && typeof args[args.length - 1] === "function") ack = args.pop();
    if (!this.connected || !this._ws || this._ws.readyState !== WebSocket.OPEN) {
      return this; // match socket.io-client: drop silently when disconnected
    }
    let idPart = "";
    if (ack) {
      const id = this._ackId++;
      this._acks.set(id, ack);
      idPart = String(id);
    }
    this._ws.send(`42${idPart}${JSON.stringify([event, ...args])}`);
    return this;
  }

  connect() {
    this._closedByUser = false;
    // no-op when a socket is already open/connecting (socket.io-client
    // semantics) — a second _open() here would orphan the live WebSocket
    // while its handlers keep firing against the replacement, double-
    // dispatching every event
    if (this._ws && this._ws.readyState <= WebSocket.OPEN) return this;
    if (this._reconnectTimer) {
      clearTimeout(this._reconnectTimer);
      this._reconnectTimer = null;
    }
    this._open();
    return this;
  }

  disconnect() {
    this._closedByUser = true;
    if (this._ws && this._ws.readyState <= WebSocket.OPEN) {
      try {
        if (this.connected) this._ws.send("41"); // socket.io DISCONNECT
        this._ws.close(1000);
      } catch (e) {}
    }
    this._teardown("io client disconnect");
    return this;
  }

  _open() {
    const url = buildWsUrl(this._base, this._path, this._query);
    let ws;
    try {
      ws = new WebSocket(url);
    } catch (e) {
      this._fire("connect_error", e);
      this._scheduleReconnect();
      return;
    }
    ws.binaryType = "arraybuffer";
    this._ws = ws;
    ws.onmessage = (ev) => this._onPacket(ev.data);
    ws.onerror = () => {
      if (!this.connected) this._fire("connect_error", new Error("websocket error"));
    };
    ws.onclose = (ev) => {
      const wasConnected = this.connected;
      this._teardown(ev.reason || "transport close");
      if (wasConnected || !this._closedByUser) this._scheduleReconnect();
    };
  }

  _armWatchdog() {
    if (this._pingTimer) clearTimeout(this._pingTimer);
    this._pingTimer = setTimeout(() => {
      // close() always fires onclose locally, which runs the one teardown +
      // reconnect path — no duplicate scheduling
      try {
        if (this._ws) this._ws.close(4000, "ping timeout");
      } catch (e) {}
    }, this._deadline || 45000);
  }

  _teardown(reason) {
    if (this._pingTimer) {
      clearTimeout(this._pingTimer);
      this._pingTimer = null;
    }
    const wasConnected = this.connected;
    this.connected = false;
    this._ws = null;
    this._pendingBinary = null;
    if (wasConnected) this._fire("disconnect", reason);
  }

  _scheduleReconnect() {
    if (this._closedByUser || !this._reconnection) return;
    if (this._attempts >= this._reconnectionAttempts) {
      this._fire("connect_error", new Error("reconnection attempts exhausted"));
      return;
    }
    const delay = Math.min(RECONNECT_MAX_MS, RECONNECT_BASE_MS * 2 ** this._attempts);
    this._attempts += 1;
    this._reconnectTimer = setTimeout(() => {
      this._reconnectTimer = null;
      // a connect() in the meantime may already have opened a socket —
      // opening another would orphan it (see connect())
      if (this._closedByUser || this.connected) return;
      if (this._ws && this._ws.readyState <= WebSocket.OPEN) return;
      this._open();
    }, delay);
  }

  _onPacket(data) {
    // Binary attachment frame for an in-flight BINARY_EVENT.
    if (data instanceof ArrayBuffer) {
      if (this._pendingBinary) {
        this._pendingBinary.buffers.push(data);
        if (this._pendingBinary.buffers.length >= this._pendingBinary.need) {
          const { payload, buffers } = this._pendingBinary;
          this._pendingBinary = null;
          this._dispatchEvent(hydratePlaceholders(payload, buffers));
        }
      }
      return;
    }
    const t = String(data);
    const eio = t[0];
    if (eio === "0") {
      // engine.io open: {"sid","pingInterval","pingTimeout","maxPayload"}
      let open = {};
      try {
        open = JSON.parse(t.slice(1));
      } catch (e) {}
      this._eioSid = open.sid;
      // heartbeat watchdog (engine.io v4): if no server ping arrives within
      // pingInterval + pingTimeout, the path is dead even though TCP never
      // closed (NAT timeout, frozen server) — drop and reconnect, like the
      // real socket.io-client
      this._deadline = (open.pingInterval || 25000) + (open.pingTimeout || 20000);
      this._armWatchdog();
      // socket.io CONNECT on the default namespace, with auth payload if any
      this._ws.send(this._auth ? `40${JSON.stringify(this._auth)}` : "40");
      return;
    }
    if (eio === "2") {
      // engine.io ping -> pong (server-initiated heartbeat, v4)
      this._armWatchdog();
      if (this._ws && this._ws.readyState === WebSocket.OPEN) this._ws.send("3");
      return;
    }
    if (eio === "1") {
      try {
        this._ws.close(1000);
      } catch (e) {}
      return;
    }
    if (eio !== "4") return; // message packets only below
    const sio = t[1];
    const body = t.slice(2);
    if (sio === "0") {
      // CONNECT ack: {"sid": ...}
      try {
        this.id = JSON.parse(body).sid;
      } catch (e) {
        this.id = this._eioSid;
      }
      this.connected = true;
      this._attempts = 0;
      this._fire("connect");
      return;
    }
    if (sio === "4") {
      let err = body;
      try {
        err = JSON.parse(body);
      } catch (e) {}
      this._fire("connect_error", err);
      return;
    }
    if (sio === "1") {
      this._teardown("io server disconnect");
      return;
    }
    if (sio === "2" || sio === "3") {
      // EVENT / ACK: optional numeric ack id precedes the JSON array
      const m = /^(\d*)(\[.*)$/s.exec(body);
      if (!m) return;
      const [, idStr, json] = m;
      let arr;
      try {
        arr = JSON.parse(json);
      } catch (e) {
        return;
      }
      if (sio === "3") {
        const fn = this._acks.get(Number(idStr));
        if (fn) {
          this._acks.delete(Number(idStr));
          fn(...arr);
        }
        return;
      }
      this._dispatchEvent(arr, idStr ? Number(idStr) : null);
      return;
    }
    if (sio === "5") {
      // BINARY_EVENT: '<n>-<id?>[json with placeholders]'
      const m = /^(\d+)-(\d*)(\[.*)$/s.exec(body);
      if (!m) return;
      const [, nStr, , json] = m;
      let arr;
      try {
        arr = JSON.parse(json);
      } catch (e) {
        return;
      }
      this._pendingBinary = { payload: arr, need: Number(nStr), buffers: [] };
      if (this._pendingBinary.need === 0) {
        this._pendingBinary = null;
        this._dispatchEvent(arr);
      }
    }
  }

  _dispatchEvent(arr, ackId = null) {
    if (!Array.isArray(arr) || !arr.length) return;
    const [event, ...args] = arr;
    if (ackId !== null && this._ws && this._ws.readyState === WebSocket.OPEN) {
      this._ws.send(`43${ackId}[]`); // auto-ack with empty payload
    }
    this._fire(event, ...args);
  }
}

/** socket.io-client compatible factory. */
export function io(base, opts) {
  return new Socket(base, opts);
}

export default io;
