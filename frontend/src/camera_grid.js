/* Standalone snapshot-polling camera grid — rebuild of the reference
 * frontend/src/components/CameraGrid.jsx. Behavior parity:
 *   - camera list from getCameraStatus, refreshed every 60 s, with a
 *     /api/cameras fetch fallback (CameraGrid.jssx:48-90)
 *   - random-4 rotation every refreshInterval (default 5 s), preferring
 *     healthy cameras (CameraGrid.jsx:93-109)
 *   - snapshot fetch as blob with per-camera AbortController, objectURL
 *     lifecycle with 60 s revoke, cache-busting ?ts= (CameraGrid.jsx:111-183)
 *   - X-Placeholder / X-Enhance-Requested response headers honored
 */

import { h, Component } from "./dom.js";
import { BASE_URL, authHeaders, getCameraStatus } from "./api.js";

function randomPick(arr, n) {
  // draw n without replacement: repeatedly splice a random element out of a
  // shrinking pool (small n makes this cheaper than a full shuffle)
  const pool = arr.slice();
  const picked = [];
  while (picked.length < n && pool.length > 0) {
    picked.push(pool.splice(Math.floor(Math.random() * pool.length), 1)[0]);
  }
  return picked;
}

export class CameraGrid extends Component {
  constructor(mount, { refreshInterval = 5000 } = {}) {
    super(mount);
    this.state = { cameras: [], displaySet: [], snapshots: {} };
    this.activeFetches = new Map(); // camId -> AbortController
    this.objectUrls = new Map(); // camId -> objectURL
    this.onCleanup(() => {
      this.objectUrls.forEach((url) => {
        try {
          URL.revokeObjectURL(url);
        } catch (e) {}
      });
      this.objectUrls.clear();
      this.activeFetches.forEach((ctrl) => {
        try {
          ctrl.abort();
        } catch (e) {}
      });
      this.activeFetches.clear();
    });
    this.update();
    this.fetchCams();
    this.every(60 * 1000, () => this.fetchCams());
    this.every(refreshInterval, () => this.refreshSet());
  }

  async fetchCams() {
    let list = [];
    try {
      const resp = await getCameraStatus();
      if (resp && resp.ok && resp.data) {
        const statusObj = resp.data.status || resp.data.cameras || resp.data;
        for (const [cid, meta] of Object.entries(statusObj || {})) {
          if (!meta || typeof meta !== "object") continue;
          list.push({
            id: cid,
            name: meta.name,
            geo: meta.geo,
            healthy: (meta.state ?? meta.status) === "ok" || meta.healthy === true,
          });
        }
      }
      if (list.length === 0) {
        // fallback endpoint (the reference probes /api/cameras, which exists
        // on neither backend — CameraGrid.jsx:71; /camera/list does)
        const r = await fetch(`${BASE_URL}/camera/list`, { headers: authHeaders() });
        if (r.ok) {
          const json = await r.json();
          list = Array.isArray(json) ? json : json.cameras || json;
        }
      }
    } catch (e) {
      console.error("Failed to fetch cameras:", e);
    }
    this.setState({ cameras: list || [] });
    if (this.state.displaySet.length === 0) this.refreshSet();
  }

  refreshSet() {
    const { cameras } = this.state;
    if (!cameras || cameras.length === 0) return;
    const healthy = cameras.filter((c) => c.healthy !== false);
    const pool = healthy.length > 0 ? healthy : cameras;
    const picked = randomPick(pool, Math.min(4, pool.length));
    this.setState({ displaySet: picked });
    picked.forEach((cam) => this.fetchSnapshot(cam));
  }

  async fetchSnapshot(cam, { cacheBust = true } = {}) {
    const camId = cam.id || cam.cam_id || cam.camera_id || cam._id;
    if (!camId) return;
    if (cam.healthy === false) {
      this.patchSnap(camId, { url: null, status: "unhealthy", placeholder: true });
      return;
    }
    const prevCtrl = this.activeFetches.get(camId);
    if (prevCtrl) {
      try {
        prevCtrl.abort();
      } catch (e) {}
      this.activeFetches.delete(camId);
    }
    const controller = new AbortController();
    this.activeFetches.set(camId, controller);
    const ts = cacheBust ? `?ts=${Date.now()}` : "";
    // BASE_URL + auth like every api.js call: a bare relative fetch would
    // hit the static-file origin (and skip the bearer token) whenever
    // window.FRP_API_BASE points at a separate backend
    const url = `${BASE_URL}/api/camera/${encodeURIComponent(camId)}/snapshot${ts}`;
    this.patchSnap(camId, { url: null, status: "loading", placeholder: false });
    try {
      const resp = await fetch(url, { signal: controller.signal, headers: authHeaders() });
      this.activeFetches.delete(camId);
      if (!resp.ok) {
        const placeholder = resp.headers.get("X-Placeholder") === "1" || resp.status === 404;
        this.patchSnap(camId, {
          url: null,
          status: placeholder ? "placeholder" : "error",
          placeholder,
        });
        return;
      }
      const isPlaceholderHeader = resp.headers.get("X-Placeholder") === "1";
      const enhanceHint = resp.headers.get("X-Enhance-Requested") === "1";
      const blob = await resp.blob();
      const prevUrl = this.objectUrls.get(camId);
      if (prevUrl) {
        try {
          URL.revokeObjectURL(prevUrl);
        } catch (e) {}
      }
      const objectUrl = URL.createObjectURL(blob);
      this.objectUrls.set(camId, objectUrl);
      this.patchSnap(camId, {
        url: objectUrl,
        status: enhanceHint ? "enhancing" : "ok",
        placeholder: isPlaceholderHeader,
      });
      setTimeout(() => {
        const cur = this.objectUrls.get(camId);
        if (cur === objectUrl) {
          try {
            URL.revokeObjectURL(objectUrl);
          } catch (e) {}
          this.objectUrls.delete(camId);
        }
      }, 60 * 1000);
    } catch (err) {
      this.activeFetches.delete(camId);
      if (err.name === "AbortError") return;
      console.error("Snapshot fetch error for", camId, err);
      this.patchSnap(camId, { url: null, status: "error", placeholder: false });
    }
  }

  patchSnap(camId, snap) {
    this.setState({ snapshots: { ...this.state.snapshots, [camId]: snap } });
  }

  render() {
    const { displaySet, snapshots } = this.state;
    return h("div", { class: "camera-grid grid-2", id: "standalone-grid" },
      displaySet.map((cam) => {
        const camId = cam.id || cam.cam_id || cam.camera_id || cam._id;
        const snap = snapshots[camId];
        return h("div", { class: "cam-card", key: camId },
          h("div", { class: "cam-name row-between" },
            h("span", {}, cam.name || cam.location || camId),
            h("span", { class: "muted small" }, cam.geo ? String(cam.geo) : "")),
          h("div", { class: "cam-body" },
            snap && snap.status === "loading" ? h("div", { class: "feed-missing small" }, "Loading...") : null,
            snap && snap.status === "enhancing" ? h("div", { class: "feed-missing small" }, "Enhancing...") : null,
            snap && snap.status === "unhealthy" ? h("div", { class: "feed-missing small" }, "Camera offline") : null,
            snap && snap.status === "error" ? h("div", { class: "feed-missing small" }, "Error") : null,
            snap && snap.placeholder && !snap.url ? h("div", { class: "feed-missing small" }, "No snapshot") : null,
            snap && snap.url ? h("img", { src: snap.url, alt: `cam-${camId}` }) : null,
            !snap ? h("div", { class: "feed-missing small" }, "No snapshot") : null),
          h("div", { class: "cam-footer row-between" },
            h("button", { class: "small", onClick: () => this.fetchSnapshot(cam, { cacheBust: true }) }, "Refresh"),
            h("small", { class: "muted" }, cam.healthy === false ? "Unhealthy" : "Live")));
      })
    );
  }
}
