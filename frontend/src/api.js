/* Centralized API client — dependency-free rebuild of the reference's
 * frontend/src/api.js (same export surface, same normalized response shape,
 * same retry/timeout/auth semantics) on top of the browser's native fetch /
 * XMLHttpRequest instead of axios, and our self-built socket.io client
 * (./sio.js) instead of socket.io-client.
 *
 * Contract parity (reference api.js):
 *   - safeRequest normalizer -> { ok, data, error: {message, code}, status }
 *     (api.js:80-109)
 *   - 12 s timeout, retry on network error / 5xx with exponential backoff
 *     300ms * 2^n, max 2 retries (api.js:16-24, 51-75)
 *   - Bearer token from localStorage "auth_token" (api.js:37-49)
 *   - shared socket factory, websocket-only, path /socket.io (api.js:128-172)
 *   - ~30 endpoint wrappers with identical paths/params (api.js:187-317)
 */

// exported so standalone components (camera_grid.js) hit the SAME backend
// origin and auth as every api.js call instead of bare relative fetches
export const BASE_URL = (window.FRP_API_BASE || "").replace(/\/+$/, ""); // same-origin default
const TIMEOUT_MS = Number(window.FRP_API_TIMEOUT_MS || 12000);
const MAX_RETRIES = Number(window.FRP_API_MAX_RETRIES ?? 2);
const RETRY_BASE_DELAY_MS = 300;

import { io } from "./sio.js";

/* ===========================
   fetch core: timeout + auth + retry
   =========================== */

export function authHeaders() {
  const headers = { Accept: "application/json" };
  try {
    const token = localStorage.getItem("auth_token");
    if (token) headers.Authorization = `Bearer ${token}`;
  } catch (e) {}
  return headers;
}

function withQuery(url, params) {
  if (!params) return url;
  const entries = Object.entries(params).filter(([, v]) => v !== undefined && v !== null);
  if (!entries.length) return url;
  const qs = new URLSearchParams(entries.map(([k, v]) => [k, String(v)]));
  return `${url}${url.includes("?") ? "&" : "?"}${qs.toString()}`;
}

async function doFetch(method, url, { params, body, headers, responseType, retryAllowed = true } = {}) {
  const fullUrl = BASE_URL + withQuery(url, params);
  let attempt = 0;
  for (;;) {
    const controller = new AbortController();
    const timer = setTimeout(() => controller.abort(), TIMEOUT_MS);
    let resp, networkError = null;
    try {
      resp = await fetch(fullUrl, {
        method,
        headers: { ...authHeaders(), ...(headers || {}) },
        body,
        signal: controller.signal,
      });
    } catch (e) {
      networkError = e;
    } finally {
      clearTimeout(timer);
    }
    const shouldRetry =
      retryAllowed &&
      attempt < MAX_RETRIES &&
      (networkError !== null || (resp && resp.status >= 500 && resp.status < 600));
    if (shouldRetry) {
      attempt += 1;
      await new Promise((r) => setTimeout(r, RETRY_BASE_DELAY_MS * 2 ** (attempt - 1)));
      continue;
    }
    if (networkError) throw networkError;
    return { resp, responseType };
  }
}

/* ===========================
   Response normalizer (reference api.js:80-109)
   =========================== */
export async function safeRequest(promise) {
  try {
    const { resp, responseType } = await promise;
    let data;
    if (responseType === "blob") {
      data = await resp.blob();
    } else {
      const text = await resp.text();
      try {
        data = text ? JSON.parse(text) : null;
      } catch (e) {
        data = text;
      }
    }
    if (!resp.ok) {
      let message;
      if (data && typeof data === "object" && (data.detail || data.message)) {
        message = data.detail || data.message;
      } else if (typeof data === "string" && data) {
        message = data;
      } else {
        try {
          message = JSON.stringify(data);
        } catch (e) {
          message = resp.statusText || `HTTP ${resp.status}`;
        }
      }
      return { ok: false, data: null, error: { message, code: resp.status } };
    }
    return { ok: true, data, error: null, status: resp.status };
  } catch (err) {
    const message =
      err && err.name === "AbortError"
        ? "No response from server (network or timeout)"
        : (err && err.message) || String(err);
    return { ok: false, data: null, error: { message, code: null } };
  }
}

const get = (url, opts) => doFetch("GET", url, opts);
const del = (url, opts) => doFetch("DELETE", url, opts);
// POSTs are mutations: a timed-out aggregate/upload that silently retries
// can double-enroll or run extra aggregation rounds (the reference axios
// interceptor retries every method on network error — a defect, not a
// contract; api.js:61-64). Opt back in per-call with retryAllowed: true.
const postJson = (url, payload, opts = {}) =>
  doFetch("POST", url, {
    retryAllowed: false,
    ...opts,
    body: JSON.stringify(payload ?? {}),
    headers: { "Content-Type": "application/json", ...(opts.headers || {}) },
  });
const postForm = (url, formData, opts = {}) =>
  doFetch("POST", url, { retryAllowed: false, ...opts, body: formData });

/* ===========================
   Socket.IO (single shared factory; reference api.js:126-172)
   =========================== */
let socket = null;
export function createSocket({ path = "/socket.io", query = {}, authToken = null, reconnectionAttempts = 5 } = {}) {
  // reuse the shared socket whenever one EXISTS — gating on .connected
  // would spawn (and leak) a second live socket for any call landing in
  // the async connect window or during a reconnect gap
  if (socket) return socket;
  if (!authToken) {
    try {
      authToken = localStorage.getItem("auth_token");
    } catch (e) {
      authToken = null;
    }
  }
  socket = io(BASE_URL, {
    path,
    transports: ["websocket"],
    reconnection: true,
    reconnectionAttempts,
    autoConnect: true,
    auth: authToken ? { token: authToken } : undefined,
    query,
  });
  socket.on("connect", () => console.info("[socket] connected", socket.id));
  socket.on("disconnect", (reason) => console.info("[socket] disconnected", reason));
  socket.on("connect_error", (err) => console.warn("[socket] connect_error", err?.message || err));
  return socket;
}

const defaultSocket = createSocket();
export { defaultSocket as socket };

/* ===========================
   Utility helpers
   =========================== */
function cacheBustingUrl(url) {
  const sep = url.includes("?") ? "&" : "?";
  return `${url}${sep}_cb=${Date.now()}`;
}

/* ===========================
   Endpoint wrappers (reference api.js:187-317 — identical paths)
   =========================== */

/* Basic status */
export const getStatus = () => safeRequest(get("/"));
export const getCameraStatus = () => safeRequest(get("/camera/status"));

/* Face management */
export const uploadFace = (formData) => safeRequest(postForm("/face/upload", formData));
export const compareFaces = (formData) => safeRequest(postForm("/face/compare", formData));
export const listFaces = () => safeRequest(get("/face/list"));
export const deleteFace = (targetName) =>
  safeRequest(del(`/face/delete/${encodeURIComponent(targetName)}`));

/* Camera alerts & tracking */
export const getCameraAlerts = () => safeRequest(get("/camera/alerts"));
export const getCameraFeed = async (cameraId) => {
  // /camera/{id}/feed is an INFINITE multipart/x-mixed-replace MJPEG
  // stream — piping it through safeRequest's resp.text() would never
  // resolve and buffer frames forever (the reference's axios wrapper has
  // the same defect, api.js:205). Probe the headers, abort the body, and
  // hand back the URL for an <img src>.
  const url = `${BASE_URL}/camera/${encodeURIComponent(cameraId)}/feed`;
  const controller = new AbortController();
  try {
    const resp = await fetch(url, {
      headers: authHeaders(),
      signal: controller.signal,
    });
    controller.abort(); // headers received; never consume the stream
    return {
      ok: resp.ok,
      data: { url, contentType: resp.headers.get("Content-Type") },
      error: resp.ok ? null : { message: `HTTP ${resp.status}`, code: resp.status },
      status: resp.status,
    };
  } catch (err) {
    return { ok: false, data: { url }, error: { message: (err && err.message) || String(err), code: null } };
  }
};
export const getTrackingStats = () => safeRequest(get("/camera/stats"));
export const getPersonMovement = (personName, limit = 20) =>
  safeRequest(get(`/camera/movement/${encodeURIComponent(personName)}`, { params: { limit } }));
export const analyzePatterns = (personName) =>
  safeRequest(get(`/camera/analyze/${encodeURIComponent(personName)}`));

/* Federated learning */
export const getFederatedStatus = (clientId) =>
  safeRequest(get("/face/fl/status", { params: { client_id: clientId } }));
export const getFLWeights = (target) =>
  safeRequest(get("/face/fl/get_weights", { params: { target } }));
export const uploadFLWeights = (target, weights) =>
  safeRequest(postJson("/face/fl/upload_weights", { target, weights }));
export const aggregateWeights = (clientIds = null, newVersion = 1) =>
  safeRequest(postJson("/face/fl/aggregate", { client_ids: clientIds, new_version: newVersion }));

/* Deepfake */
export const detectDeepfakeImage = (formData) =>
  safeRequest(postForm("/deepfake/detect-image", formData));
export const detectDeepfakeCCTV = (cameras) =>
  safeRequest(get("/deepfake/cctv", { params: { cameras } }));

/* Alert management */
export const getAlerts = (params = {}) => safeRequest(get("/alerts", { params }));
export const getLatestAlert = (target = null) =>
  safeRequest(get("/alerts/latest", { params: { target } }));
export const getWatchlist = () => safeRequest(get("/alerts/watchlist"));
export const addToWatchlist = (targetName) =>
  safeRequest(postJson(`/alerts/watchlist/${encodeURIComponent(targetName)}`, {}));
export const removeFromWatchlist = (targetName) =>
  safeRequest(del(`/alerts/watchlist/${encodeURIComponent(targetName)}`));
export const getGeofences = () => safeRequest(get("/alerts/geofences"));
export const createGeofence = (zoneData) => safeRequest(postJson("/alerts/geofences", zoneData));
export const getAlertStats = () => safeRequest(get("/alerts/stats"));
export const configureEmail = (configData) =>
  safeRequest(postJson("/alerts/config/email", configData));
export const configureSms = (configData) => safeRequest(postJson("/alerts/config/sms", configData));

/* ===========================
   Uploads with progress, snapshots, async jobs (reference api.js:262-313)
   =========================== */

/** XHR used here because fetch has no upload-progress events. */
export function uploadWithProgress(url, formData, onProgress) {
  const promise = new Promise((resolve, reject) => {
    const xhr = new XMLHttpRequest();
    xhr.open("POST", BASE_URL + url);
    xhr.timeout = TIMEOUT_MS;
    const headers = authHeaders();
    delete headers.Accept; // let the browser negotiate
    for (const [k, v] of Object.entries(headers)) xhr.setRequestHeader(k, v);
    xhr.upload.onprogress = (ev) => {
      try {
        if (onProgress) onProgress(ev.loaded, ev.lengthComputable ? ev.total : 0);
      } catch (e) {}
    };
    xhr.onload = () => {
      const headerObj = { get: () => null };
      resolve({
        resp: {
          ok: xhr.status >= 200 && xhr.status < 300,
          status: xhr.status,
          statusText: xhr.statusText,
          headers: headerObj,
          text: async () => xhr.responseText,
        },
      });
    };
    xhr.onerror = () => reject(new Error("network error"));
    xhr.ontimeout = () => reject(Object.assign(new Error("timeout"), { name: "AbortError" }));
    xhr.send(formData);
  });
  return safeRequest(promise);
}

export function fetchCameraSnapshot(cameraId, { enhance = false } = {}) {
  const url = `/api/camera/${encodeURIComponent(cameraId)}/snapshot${enhance ? "?enhance=1" : ""}`;
  return safeRequest(get(cacheBustingUrl(url), { responseType: "blob" }));
}

export function enqueueAsyncFaceSearch(fileOrFormData, onProgress) {
  let formData;
  if (fileOrFormData instanceof FormData) {
    formData = fileOrFormData;
  } else {
    formData = new FormData();
    formData.append("file", fileOrFormData);
  }
  return uploadWithProgress("/async/face/search", formData, onProgress);
}

export async function pollJob(jobId, { interval = 800, timeout = 60000, onUpdate = null } = {}) {
  const start = Date.now();
  for (;;) {
    const resp = await safeRequest(get(`/async/jobs/${encodeURIComponent(jobId)}`));
    if (onUpdate) {
      try {
        onUpdate(resp);
      } catch (e) {}
    }
    if (!resp.ok) return resp;
    const status = resp.data.status;
    if (status === "finished" || status === "failed") return resp;
    if (Date.now() - start > timeout) {
      return { ok: false, data: null, error: { message: "timeout waiting for job", code: "timeout" } };
    }
    await new Promise((r) => setTimeout(r, interval));
  }
}

/* The reference aliases this to aggregateWeights (api.js:316-317), so
 * "viewing" the model runs ANOTHER mutating aggregation — a defect, not a
 * contract. Fixed: fetch the stored global model read-only. */
export const getAggregatedModel = (version = null) =>
  safeRequest(get("/face/fl/global_model", { params: { version } }));

export const BACKEND_BASE = BASE_URL || `${location.protocol}//${location.host}`;
