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

let shownView = null;

function show(view) {
  if (view === shownView) return;
  if (current) current.destroy();
  shownView = view;
  const mount = document.getElementById("view");
  current = VIEWS[view](mount);
  for (const a of document.querySelectorAll("nav a")) {
    a.classList.toggle("active", a.dataset.view === view);
  }
  if (location.hash !== `#${view}`) {
    try {
      history.replaceState(null, "", `#${view}`);
    } catch (e) {}
  }
}

function boot() {
  // navigation rides the hash: anchors just set it, and ONE hashchange
  // listener mounts the view — so browser back/forward stay in sync with
  // what's rendered (replaceState-only left them desynced)
  const nav = h("nav", {},
    h("a", { href: "#dashboard", dataset: { view: "dashboard" } }, "Dashboard"),
    h("a", { href: "#faces", dataset: { view: "faces" } }, "Face Manager"),
    h("a", { href: "#grid", dataset: { view: "grid" } }, "Camera Grid"));
  document.body.prepend(nav);
  window.addEventListener("hashchange", () => {
    const view = (location.hash || "#dashboard").slice(1);
    show(VIEWS[view] ? view : "dashboard");
  });
  const initial = (location.hash || "#dashboard").slice(1);
  show(VIEWS[initial] ? initial : "dashboard");
}

boot();
