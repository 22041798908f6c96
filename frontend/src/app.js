/* Main dashboard — rebuild of the reference frontend/src/App.jsx on the
 * dependency-free component layer (./dom.js). Behavior parity:
 *   - 5 s camera-status poll (App.jsx:59-81)
 *   - upload & encode panel posting target_name/save_raw (App.jsx:86-114)
 *   - socket listeners new_alert / update_movement_log / update_tracking_feed
 *     with the same caps: alerts 50, per-target history 10, movement 100
 *     (App.jsx:165-206)
 *   - random-4 healthy camera grid reshuffled on every 5 s status poll —
 *     reference behavior: its useEffect keys on the cameraStatus object,
 *     which is replaced each poll (App.jsx:212-240)
 *   - MJPEG <img> feeds, cache-busting ticker 5 s, broken-feed retry 15 s
 *     (App.jsx:245-253, 362-388)
 *   - distance badges <0.4 High / <0.6 Medium / Low (App.jsx:258-277)
 *   - FL demo panel: upload random 2-layer weights, aggregate, view global
 *     model (App.jsx:282-357)
 */

import { h, Component } from "./dom.js";
import {
  socket,
  getCameraStatus,
  uploadFace,
  getCameraAlerts,
  uploadFLWeights as apiUploadFLWeights,
  getFLWeights as apiGetFLWeights,
  aggregateWeights,
  getAggregatedModel,
  BACKEND_BASE,
} from "./api.js";

export class App extends Component {
  constructor(mount) {
    super(mount);
    this.state = {
      cameraStatus: {},
      alerts: [],
      history: {},
      movementLog: [],
      randomCameras: [],
      trackingCamera: null,
      trackingTarget: null,
      expanded: {},
      brokenFeeds: new Set(),
      socketConnected: !!socket.connected,
      uploadStatus: "",
      file: null,
      flClientId: "client_1",
      flWeights: {},
      aggregating: false,
      aggregatedModel: null,
    };
    this.feedTicker = Date.now();
    this._sections = {};
    this._buildShell();
    this._attachSocket();
    this._fetchCameraStatus();
    this._fetchInitialData();
    this.every(5000, () => this._fetchCameraStatus());
    this.every(5000, () => {
      // cache-busting ticker: refresh MJPEG <img> srcs (App.jsx:245-253)
      this.feedTicker = Date.now();
      this._renderTracking();
      this._renderGrid();
    });
    this.every(15000, () => {
      // broken-feed retry: clear the set so <img> tags reload (App.jsx:374-382)
      if (this.state.brokenFeeds.size) {
        this.state.brokenFeeds = new Set();
        this._renderTracking();
        this._renderGrid();
      }
    });
  }

  /* ---------- data ---------- */

  async _fetchCameraStatus() {
    const res = await getCameraStatus();
    const statusObj = res?.data?.status ?? res?.data?.cameras ?? res?.data ?? {};
    this.state.cameraStatus = statusObj && typeof statusObj === "object" ? statusObj : {};
    this._updateRandomCameras();
    this._renderHeader();
    this._renderTracking();
    this._renderGrid();
  }

  async _fetchInitialData() {
    const res = await getCameraAlerts();
    const data = res?.data ?? {};
    this.state.alerts = data.alerts ?? [];
    this.state.history = data.history ?? {};
    this.state.movementLog = data.movement_log ?? [];
    if (data.latest_detection) {
      this.state.trackingCamera = data.latest_detection.camera_id;
      this.state.trackingTarget = data.latest_detection.target;
    }
    this._renderAlerts();
    this._renderMovement();
    this._renderTracking();
  }

  _attachSocket() {
    const onConnect = () => {
      this.state.socketConnected = true;
      this._renderHeader();
      this._fetchInitialData();
      this._fetchCameraStatus();
    };
    const onDisconnect = () => {
      this.state.socketConnected = false;
      this._renderHeader();
    };
    const onNewAlert = (payload) => {
      const alert = payload?.alert ?? payload;
      if (!alert) return;
      this.state.alerts = [alert, ...this.state.alerts].slice(0, 50);
      this.state.history = {
        ...this.state.history,
        [alert.target]: [alert, ...(this.state.history[alert.target] || [])].slice(0, 10),
      };
      this._renderAlerts();
    };
    const onUpdateMovementLog = (payload) => {
      const log = payload?.log ?? payload;
      if (!log) return;
      // live tracking records carry 'person' (platform/tracking.py record);
      // the /camera/alerts movement_log rows carry 'target' — normalize
      const entry = { ...log, target: log.target ?? log.person };
      this.state.movementLog = [entry, ...this.state.movementLog].slice(0, 100);
      this._renderMovement();
    };
    const onUpdateTrackingFeed = (payload) => {
      const detection = payload?.detection ?? payload;
      if (!detection) return;
      this.state.trackingCamera = detection.camera_id;
      this.state.trackingTarget = detection.person || detection.target;
      this._renderTracking();
    };
    socket.on("connect", onConnect);
    socket.on("disconnect", onDisconnect);
    socket.on("new_alert", onNewAlert);
    socket.on("update_movement_log", onUpdateMovementLog);
    socket.on("update_tracking_feed", onUpdateTrackingFeed);
    this.onCleanup(() => {
      socket.off("connect", onConnect);
      socket.off("disconnect", onDisconnect);
      socket.off("new_alert", onNewAlert);
      socket.off("update_movement_log", onUpdateMovementLog);
      socket.off("update_tracking_feed", onUpdateTrackingFeed);
    });
  }

  _updateRandomCameras() {
    const available = Object.keys(this.state.cameraStatus || {}).filter((id) => {
      const entry = this.state.cameraStatus[id];
      const state = entry?.state ?? entry?.status ?? (entry?.healthy ? "ok" : null);
      return state === "ok" || state === "online" || state === "available" || state === true;
    });
    if (!available.length) return;
    const shuffled = [...available].sort(() => 0.5 - Math.random());
    const selected = shuffled.slice(0, 4);
    while (selected.length < 4 && available.length > 0) selected.push(available[0]);
    this.state.randomCameras = selected;
  }

  _feedUrl(cameraId) {
    return `${BACKEND_BASE}/camera/${cameraId}/feed?_=${this.feedTicker}`;
  }

  _handleFeedError(camId) {
    if (!this.state.brokenFeeds.has(camId)) {
      console.warn(`Camera feed error for Cam ID: ${camId}`);
      const copy = new Set(this.state.brokenFeeds);
      copy.add(camId);
      this.state.brokenFeeds = copy;
      this._renderTracking();
      this._renderGrid();
    }
  }

  /* ---------- actions ---------- */

  async _handleUpload() {
    const { file } = this.state;
    if (!file) return;
    this.state.uploadStatus = "Uploading...";
    this._renderUpload();
    const formData = new FormData();
    formData.append("file", file);
    formData.append("target_name", file.name);
    formData.append("save_raw", "false");
    const res = await uploadFace(formData);
    const data = res?.data ?? {};
    if (res.ok && data.status === "success") {
      this.state.uploadStatus = `✅ ${data.message || `Uploaded ${data.filename || file.name}`}`;
      this.state.file = null;
    } else {
      this.state.uploadStatus = `❌ ${data.message || res.error?.message || "Upload failed"}`;
    }
    this._renderUpload();
  }

  async _uploadFLWeights() {
    const target = this.state.flClientId;
    const weights = {
      layer1: [Math.random(), Math.random()],
      layer2: [Math.random(), Math.random()],
    };
    const res = await apiUploadFLWeights(target, weights);
    const data = res?.data ?? {};
    this._flNote(
      res.ok && data.status === "success"
        ? "✅ Federated weights uploaded successfully!"
        : `❌ Failed to upload FL weights: ${data.message || res.error?.message || "unknown"}`
    );
    await this._fetchFLWeights();
  }

  async _fetchFLWeights() {
    const res = await apiGetFLWeights(this.state.flClientId);
    const data = res?.data ?? {};
    this.state.flWeights = res.ok && data.status === "success" ? data.weights ?? {} : {};
    this._renderFL();
  }

  async _handleAggregate() {
    this.state.aggregating = true;
    this.state.aggregatedModel = null;
    this._renderFL();
    const res = await aggregateWeights(null, Date.now());
    const data = res?.data ?? {};
    if (res.ok && data.status === "success") {
      this._flNote(`✅ Aggregation successful! New model version: ${data.new_model_version}`);
      await this._handleGetAggregatedModel();
    } else {
      this._flNote(`❌ Aggregation failed: ${data.message || res.error?.message || "unknown"}`);
    }
    this.state.aggregating = false;
    this._renderFL();
  }

  async _handleGetAggregatedModel() {
    const res = await getAggregatedModel();
    const data = res?.data ?? {};
    if (res.ok && data.status === "success") {
      this.state.aggregatedModel = data;
    } else {
      this.state.aggregatedModel = null;
      this._flNote(`❌ Failed to get aggregated model: ${data.message || res.error?.message || "unknown"}`);
    }
    this._renderFL();
  }

  _flNote(msg) {
    this.state.flNote = msg;
    this._renderFL();
  }

  /* ---------- render ---------- */

  _buildShell() {
    const sec = (name) => {
      const div = h("div");
      this._sections[name] = div;
      return div;
    };
    this.mount.replaceChildren(
      h("div", { class: "page" },
        sec("header"),
        h("main", { class: "layout" },
          h("div", { class: "col-main" }, sec("tracking"), sec("grid")),
          h("div", { class: "col-side" }, sec("upload"), sec("fl"), sec("alerts"), sec("movement"))
        )
      )
    );
    this._renderHeader();
    this._renderTracking();
    this._renderGrid();
    this._renderUpload();
    this._renderFL();
    this._renderAlerts();
    this._renderMovement();
  }

  _renderHeader() {
    this._sections.header.replaceChildren(
      h("header", { class: "app-header" },
        h("h1", { class: "title" }, "Multi-Camera Face Recognition Platform"),
        h("p", { class: "subtitle" },
          `Backend: ${BACKEND_BASE} | WebSocket: `,
          h("span", {
            id: "ws-status",
            class: this.state.socketConnected ? "ws-on" : "ws-off",
          }, this.state.socketConnected ? "Connected" : "Disconnected")
        )
      )
    );
  }

  _badge(distance) {
    if (distance === undefined || distance === null) return null;
    if (distance < 0.4) return h("span", { class: "badge badge-high" }, "High");
    if (distance < 0.6) return h("span", { class: "badge badge-medium" }, "Medium");
    return h("span", { class: "badge badge-low" }, "Low");
  }

  _camName(camId) {
    return this.state.cameraStatus?.[camId]?.name || `Camera ${camId}`;
  }

  _renderTracking() {
    const { trackingCamera, trackingTarget, brokenFeeds } = this.state;
    let body;
    if (trackingCamera !== null && trackingTarget !== null) {
      const feed = brokenFeeds.has(trackingCamera)
        ? h("div", { class: "feed-missing" }, "Camera feed unavailable")
        : h("img", {
            src: this._feedUrl(trackingCamera),
            alt: `Tracking Camera ${trackingCamera}`,
            onError: () => this._handleFeedError(trackingCamera),
          });
      body = h("div", { class: "tracking-box" },
        h("p", { class: "tracking-label" },
          "Tracking ", h("b", {}, trackingTarget), " at ", h("b", {}, this._camName(trackingCamera))),
        feed
      );
    } else {
      body = h("div", { class: "feed-missing" }, "Awaiting target detection...");
    }
    this._sections.tracking.replaceChildren(
      h("section", { class: "card", id: "tracking-feed" }, h("h2", {}, "Live Tracking Feed"), body)
    );
  }

  _renderGrid() {
    const cards = this.state.randomCameras.map((camId, idx) =>
      h("div", { class: "cam-card", key: `${camId}-${idx}` },
        h("p", { class: "cam-name" }, this._camName(camId)),
        this.state.brokenFeeds.has(camId)
          ? h("div", { class: "feed-missing small" }, "Feed offline")
          : h("img", {
              src: this._feedUrl(camId),
              alt: `Camera ${camId}`,
              onError: () => this._handleFeedError(camId),
            })
      )
    );
    this._sections.grid.replaceChildren(
      h("section", { class: "card", id: "camera-grid" },
        h("h2", {}, "Camera Grid"),
        h("div", { class: "grid-2" }, cards))
    );
  }

  _renderUpload() {
    this._sections.upload.replaceChildren(
      h("section", { class: "card", id: "upload-panel" },
        h("h2", {}, "Upload Target Photo"),
        // kept across re-renders (dom.js keep): recreating the input on the
        // onChange-triggered render would reset its FileList display to
        // "No file chosen" the instant a file is selected
        this.keep("upload-input", () => h("input", {
          id: "upload-input",
          type: "file",
          accept: "image/*",
          onChange: (e) => {
            this.state.file = e.target.files?.[0] ?? null;
            this._renderUpload();
          },
        })),
        h("button", {
          id: "upload-btn",
          disabled: !this.state.file,
          onClick: () => this._handleUpload(),
        }, "Upload & Encode"),
        this.state.uploadStatus ? h("p", { class: "status", id: "upload-status" }, this.state.uploadStatus) : null
      )
    );
  }

  _renderFL() {
    const s = this.state;
    this._sections.fl.replaceChildren(
      h("section", { class: "card", id: "fl-panel" },
        h("h2", {}, "Federated Learning"),
        h("input", {
          type: "text",
          id: "fl-client-id",
          value: s.flClientId,
          placeholder: "Enter Client ID",
          onChange: (e) => {
            s.flClientId = e.target.value;
          },
        }),
        h("button", {
          id: "fl-upload",
          disabled: !s.flClientId.trim(),
          onClick: () => this._uploadFLWeights(),
        }, "Upload Local Weights (Demo)"),
        h("button", {
          id: "fl-aggregate",
          disabled: s.aggregating,
          onClick: () => this._handleAggregate(),
        }, s.aggregating ? "Aggregating..." : "Aggregate Weights"),
        h("button", { id: "fl-view", onClick: () => this._handleGetAggregatedModel() }, "View Aggregated Model"),
        s.flNote ? h("p", { class: "status", id: "fl-note" }, s.flNote) : null,
        h("h3", { class: "mini" },
          `Weights for '${s.flClientId}': `,
          h("button", { class: "link", id: "fl-refresh", onClick: () => this._fetchFLWeights() }, "(Refresh)")),
        h("pre", { class: "json", id: "fl-weights" }, JSON.stringify(s.flWeights, null, 2)),
        s.aggregatedModel
          ? [
              h("h3", { class: "mini" }, `Latest Aggregated Model (v${s.aggregatedModel.model_version ?? s.aggregatedModel.new_model_version}):`),
              h("pre", { class: "json", id: "fl-model" }, JSON.stringify(s.aggregatedModel, null, 2)),
            ]
          : null
      )
    );
  }

  _renderAlerts() {
    const { alerts, history, expanded } = this.state;
    const items = alerts.map((a, idx) => {
      const expandedKey = a.alert_id || a.target;
      const historyList = (Array.isArray(history?.[a.target]) ? history[a.target] : []).map((hh, hIdx) =>
        h("li", { key: hh.alert_id || `${a.target}-${hIdx}` },
          h("span", { class: "mono" }, `[${new Date(hh.timestamp).toLocaleTimeString()}]`),
          ` at ${hh.camera_name || `Cam ${hh.camera_id}`} - Dist: `,
          h("span", { class: "dist" }, typeof hh.distance === "number" ? hh.distance.toFixed(2) : String(hh.distance)))
      );
      return h("li", { class: "alert-item", key: a.alert_id || `${a.target}-${a.camera_id}-${idx}` },
        h("div", { class: "alert-row" },
          h("span", {},
            h("b", {}, a.target), " detected at ",
            h("i", {}, a.camera_name || `Cam ${a.camera_id}`),
            this._badge(a.distance)),
          h("button", {
            class: "link",
            onClick: () => {
              this.state.expanded = { ...expanded, [expandedKey]: !expanded[expandedKey] };
              this._renderAlerts();
            },
          }, expanded[expandedKey] ? "Hide" : "History")),
        expanded[expandedKey] ? h("ul", { class: "alert-history" }, historyList) : null
      );
    });
    this._sections.alerts.replaceChildren(
      h("section", { class: "card", id: "alerts-panel" },
        h("h2", {}, "Alerts"),
        alerts.length === 0
          ? h("p", { class: "muted" }, "No matches detected yet.")
          : h("ul", { class: "alert-list", id: "alert-list" }, items))
    );
  }

  _renderMovement() {
    const items = this.state.movementLog.map((log, idx) =>
      h("li", { key: `${log.timestamp}-${log.target}-${idx}` },
        h("span", { class: "mono" }, `[${new Date(log.timestamp).toLocaleTimeString()}]`),
        " ", h("b", {}, log.target), ` moved through ${log.camera_name || `Cam ${log.camera_id}`}.`)
    );
    this._sections.movement.replaceChildren(
      h("section", { class: "card", id: "movement-panel" },
        h("h2", {}, "Movement Log"),
        this.state.movementLog.length === 0
          ? h("p", { class: "muted" }, "No movement detected yet.")
          : h("ul", { class: "movement-list", id: "movement-list" }, items))
    );
  }

  render() {
    return this.mount.firstChild;
  }
}
