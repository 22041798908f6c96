/* Entry point (reference frontend/src/main.jsx renders <App/>; the
 * FaceUpload and CameraGrid components are standalone in the reference —
 * here a small nav makes all three reachable). */

import { App } from "./app.js";
import { FaceUpload } from "./face_upload.js";
import { CameraGrid } from "./camera_grid.js";
import { h } from "./dom.js";

const VIEWS = {
  dashboard: (mount) => new App(mount),
  faces: (mount) => new FaceUpload(mount),
  grid: (mount) => new CameraGrid(mount),
};

let current = null;

function show(view) {
  if (current) current.destroy();
  const mount = document.getElementById("view");
  current = VIEWS[view](mount);
  for (const a of document.querySelectorAll("nav a")) {
    a.classList.toggle("active", a.dataset.view === view);
  }
  try {
    history.replaceState(null, "", `#${view}`);
  } catch (e) {}
}

function boot() {
  const nav = h("nav", {},
    h("a", { href: "#dashboard", dataset: { view: "dashboard" }, onClick: () => show("dashboard") }, "Dashboard"),
    h("a", { href: "#faces", dataset: { view: "faces" }, onClick: () => show("faces") }, "Face Manager"),
    h("a", { href: "#grid", dataset: { view: "grid" }, onClick: () => show("grid") }, "Camera Grid"));
  document.body.prepend(nav);
  const initial = (location.hash || "#dashboard").slice(1);
  show(VIEWS[initial] ? initial : "dashboard");
}

boot();
