/* Enroll / compare / manage view — rebuild of the reference
 * frontend/src/components/FaceUpload.jsx. Behavior parity:
 *   - sync upload with XHR progress OR async-job mode: enqueue to
 *     /async/face/search, listen for the `job_finished` socket event, fall
 *     back to pollJob(800 ms, 120 s) (FaceUpload.jsx:157-232)
 *   - normalizeApiResponse supporting both safeRequest and raw payload
 *     shapes (FaceUpload.jsx:36-50)
 *   - compare table with match/distance columns (FaceUpload.jsx:485-561)
 *   - enrolled-face list with delete (FaceUpload.jsx:53-75, 119-139)
 */

import { h, Component } from "./dom.js";
import {
  uploadFace,
  compareFaces,
  listFaces,
  deleteFace,
  uploadWithProgress,
  enqueueAsyncFaceSearch,
  pollJob,
  socket,
} from "./api.js";

function normalizeApiResponse(res) {
  if (res && (res.ok === true || res.ok === false)) {
    return { ok: res.ok, payload: res.data, error: res.error };
  }
  if (res && res.data !== undefined) return { ok: true, payload: res.data, error: null };
  return { ok: false, payload: null, error: { message: "No response" } };
}

export class FaceUpload extends Component {
  constructor(mount) {
    super(mount);
    this.state = {
      selectedFile: null,
      uploadResult: null,
      compareFile: null,
      compareResult: null,
      uploading: false,
      comparing: false,
      targetName: "",
      saveRaw: false,
      enrolledFaces: [],
      loadingFaces: false,
      useAsyncUpload: false,
      uploadProgress: 0,
      currentJobId: null,
    };
    this._onJobFinished = (data) => {
      // backend emits { job_id, result } (FaceUpload.jsx:79-96)
      if (!data || !data.job_id) return;
      if (this.state.currentJobId && data.job_id === this.state.currentJobId) {
        this.setState({
          uploadResult: data.result ?? data,
          uploading: false,
          uploadProgress: 100,
          currentJobId: null,
        });
        this.fetchEnrolledFaces();
      }
    };
    socket.on("job_finished", this._onJobFinished);
    this.onCleanup(() => socket.off("job_finished", this._onJobFinished));
    this.update();
    this.fetchEnrolledFaces();
  }

  async fetchEnrolledFaces() {
    this.setState({ loadingFaces: true });
    const res = await listFaces();
    const { ok, payload } = normalizeApiResponse(res);
    let targets = [];
    if (ok && payload) targets = payload.targets || payload || [];
    this.setState({ enrolledFaces: Array.isArray(targets) ? targets : [], loadingFaces: false });
  }

  async handleDelete(target) {
    if (!window.confirm(`Are you sure you want to delete ${target}?`)) return;
    const res = await deleteFace(target);
    const { ok, payload, error } = normalizeApiResponse(res);
    if (ok && payload && payload.status === "success") {
      this.note(payload.message);
      this.fetchEnrolledFaces();
    } else {
      this.note(`Error: ${payload?.message || error?.message || "Failed to delete"}`);
    }
  }

  _clearUploadInputs() {
    // kept DOM inputs (dom.js keep) survive re-renders, so clearing the
    // state alone would leave the old filename/name visible
    this.setState({ selectedFile: null, targetName: "" });
    for (const id of ["upload-file-input", "target-name"]) {
      const el = this._kept.get(id);
      if (el) el.value = "";
    }
  }

  _syncValue(id, value, factory) {
    // kept text input whose value can also change programmatically: push
    // the state value into the node unless the user is typing in it
    const el = this.keep(id, factory);
    if (document.activeElement !== el && el.value !== value) {
      el.value = value;
    }
    return el;
  }

  note(msg) {
    this.setState({ note: msg });
  }

  async handleUploadAndEncode() {
    const s = this.state;
    if (!s.selectedFile) return;
    this.setState({ uploading: true, uploadResult: null, uploadProgress: 0 });
    try {
      const formData = new FormData();
      formData.append("file", s.selectedFile);
      formData.append("target_name", s.targetName || s.selectedFile.name);
      formData.append("save_raw", String(s.saveRaw));

      if (s.useAsyncUpload) {
        this.setState({ uploadProgress: 1 });
        const enqueueResp = await enqueueAsyncFaceSearch(formData, (loaded, total) => {
          this.setState({ uploadProgress: total ? Math.round((loaded / total) * 100) : 0 });
        });
        const { ok, payload, error } = normalizeApiResponse(enqueueResp);
        if (!ok) {
          const msg = error?.message || "Failed to enqueue job";
          this.setState({ uploadResult: { status: "error", message: msg } });
          this.note(`❌ ${msg}`);
          return;
        }
        const jobId = payload?.job_id || payload?.jobId || payload?.job || null;
        if (!jobId) {
          this.setState({ uploadResult: payload, uploadProgress: 100 });
          this.fetchEnrolledFaces();
          return;
        }
        this.setState({ currentJobId: jobId });
        // socket `job_finished` normally resolves first; poll as the fallback
        const pollResp = await pollJob(jobId, { interval: 800, timeout: 120000 });
        const { ok: pollOk, payload: pollPayload, error: pollError } = normalizeApiResponse(pollResp);
        if (!pollOk) {
          const msg = pollError?.message || "Job polling failed";
          this.setState({ uploadResult: { status: "error", message: msg } });
          this.note(`❌ ${msg}`);
        } else {
          this.setState({ uploadResult: pollPayload });
          if (pollPayload && (pollPayload.status === "success" || pollPayload.status === "finished")) {
            // The async pipeline is a gallery SEARCH (/async/face/search) —
            // it does not enroll. The reference UI claimed enrollment here,
            // but its async jobs always failed so that path never actually
            // ran (async_task_manager.py:116-147); be honest instead of
            // clearing the form and implying the face was stored.
            this.note("ℹ️ Async search finished — result below. " +
                      "Uncheck 'Use Async Upload' to enroll this face.");
          }
        }
      } else {
        const resp = await uploadWithProgress("/face/upload", formData, (loaded, total) => {
          this.setState({ uploadProgress: total ? Math.round((loaded / total) * 100) : 0 });
        });
        const { ok, payload, error } = normalizeApiResponse(resp);
        if (ok && payload) {
          this.setState({ uploadResult: payload });
          if (payload.status === "success") {
            this.note(`✅ Face encoded for ${payload.target}`);
            this.fetchEnrolledFaces();
            this._clearUploadInputs();
          } else {
            this.note(`❌ ${payload.message || "Upload returned warning/error"}`);
          }
        } else {
          const msg = error?.message || "Upload failed";
          this.setState({ uploadResult: { status: "error", message: msg } });
          this.note(`❌ ${msg}`);
        }
      }
    } finally {
      this.setState({ uploading: false, uploadProgress: 0, currentJobId: null });
    }
  }

  async handleCompare() {
    if (!this.state.compareFile) return;
    this.setState({ comparing: true, compareResult: null });
    const formData = new FormData();
    formData.append("file", this.state.compareFile);
    const res = await compareFaces(formData);
    const { ok, payload, error } = normalizeApiResponse(res);
    if (ok) {
      this.setState({ compareResult: payload });
    } else {
      const message = error?.message || "Comparison failed!";
      this.setState({ compareResult: { status: "error", message } });
      this.note(`❌ ${message}`);
    }
    this.setState({ comparing: false });
  }

  render() {
    const s = this.state;
    const compareTable =
      s.compareResult && s.compareResult.status === "success" && s.compareResult.comparisons
        ? s.compareResult.comparisons.length === 0
          ? h("p", {}, "No matches found")
          : h("table", { class: "cmp-table", id: "compare-table" },
              h("thead", {}, h("tr", {}, h("th", {}, "Target"), h("th", {}, "Match"), h("th", {}, "Distance"))),
              h("tbody", {},
                s.compareResult.comparisons.map((comp, idx) =>
                  h("tr", { key: idx },
                    h("td", {}, comp.target),
                    h("td", { class: comp.match ? "match-yes" : "match-no" }, comp.match ? "✓ Yes" : "✗ No"),
                    h("td", {}, typeof comp.distance === "number" ? comp.distance.toFixed(3) : String(comp.distance))))))
        : s.compareResult
          ? h("pre", { class: "json" }, JSON.stringify(s.compareResult, null, 2))
          : null;

    return h("div", { class: "face-upload", id: "face-upload" },
      h("h2", {}, "📤 Upload Target Photo"),
      s.note ? h("p", { class: "status", id: "fu-note" }, s.note) : null,

      h("div", { class: "card" },
        h("h3", {}, "Step 1: Upload & Encode Face"),
        // kept (dom.js): every setState — including per-XHR-progress ones
        // during an upload — re-renders the whole view; a recreated file
        // input would display "No file chosen" mid-upload, and a recreated
        // text input would drop uncommitted typing
        this.keep("upload-file-input", () => h("input", {
          id: "upload-file-input", type: "file", accept: "image/*",
          onChange: (e) => {
            const f = e.target.files[0];
            this.setState({
              selectedFile: f, uploadResult: null, compareResult: null,
              targetName: this.state.targetName || (f ? f.name : ""),
            });
          },
        })),
        this._syncValue("target-name", s.targetName, () => h("input", {
          type: "text", id: "target-name", placeholder: "Enter Target Name (defaults to filename)",
          value: s.targetName,
          onChange: (e) => { this.state.targetName = e.target.value; },
        })),
        h("label", {},
          h("input", { type: "checkbox", id: "save-raw", checked: s.saveRaw,
            onChange: (e) => { this.state.saveRaw = e.target.checked; } }),
          " Save Raw Image on Server"),
        h("label", {},
          h("input", { type: "checkbox", id: "use-async", checked: s.useAsyncUpload,
            onChange: (e) => { this.state.useAsyncUpload = e.target.checked; } }),
          " Use Async Upload (enqueue job and process in background)"),
        h("button", {
          id: "encode-btn",
          disabled: s.uploading || !s.selectedFile,
          onClick: () => this.handleUploadAndEncode(),
        }, s.uploading ? "Uploading..." : "Upload & Encode"),
        s.uploading
          ? h("div", { class: "progress" },
              h("div", { class: "progress-bar", style: { width: `${s.uploadProgress}%` } }),
              h("div", { class: "progress-label" }, `${s.uploadProgress}% complete`))
          : null,
        s.uploadResult
          ? h("div", { class: `result ${s.uploadResult.status === "error" ? "result-bad" : "result-ok"}`, id: "upload-result" },
              h("h4", {}, "Upload Result:"),
              s.uploadResult.status === "warning"
                ? h("p", { class: "warn" },
                    `${s.uploadResult.message} (Score: ${s.uploadResult.quality_score}) — Issues: ${(s.uploadResult.issues || []).join(", ")}`)
                : null,
              h("pre", { class: "json" }, JSON.stringify(s.uploadResult, null, 2)))
          : null),

      h("div", { class: "card" },
        h("h3", {}, "Step 2: Compare Another Face"),
        h("p", { class: "muted" }, "Upload a different image to compare against all stored faces"),
        this.keep("compare-file-input", () => h("input", {
          type: "file", accept: "image/*", id: "compare-file-input",
          onChange: (e) => this.setState({ compareFile: e.target.files[0], compareResult: null }),
        })),
        h("button", {
          id: "compare-btn",
          disabled: s.comparing || !s.compareFile,
          onClick: () => this.handleCompare(),
        }, s.comparing ? "Comparing..." : "Compare Face"),
        compareTable ? h("div", { class: "result result-ok", id: "compare-result" }, h("h4", {}, "Comparison Results:"), compareTable) : null),

      h("div", { class: "card" },
        h("h3", {}, "Step 3: Manage Enrolled Faces"),
        s.loadingFaces
          ? h("p", {}, "Loading faces...")
          : s.enrolledFaces.length === 0
            ? h("p", { class: "muted" }, "No faces enrolled yet.")
            : h("ul", { class: "face-list", id: "face-list" },
                s.enrolledFaces.map((target) =>
                  h("li", { key: target },
                    h("span", { class: "mono" }, target),
                    h("button", { class: "danger", onClick: () => this.handleDelete(target) }, "Delete")))))
    );
  }
}
