/* Minimal component layer standing in for React in the rebuilt frontend.
 *
 * h(tag, props, ...children) builds real DOM nodes; Component holds state
 * with setState -> re-render into its mount point. Coarse-grained re-render
 * is fine at this app's size; refs to live nodes (e.g. MJPEG <img>) are
 * preserved across renders via the `keep` prop so streams aren't restarted.
 */

export function h(tag, props, ...children) {
  const el = document.createElement(tag);
  for (const [k, v] of Object.entries(props || {})) {
    if (v === null || v === undefined || v === false) continue;
    if (k.startsWith("on") && typeof v === "function") {
      el.addEventListener(k.slice(2).toLowerCase(), v);
    } else if (k === "class") {
      el.className = v;
    } else if (k === "style" && typeof v === "object") {
      Object.assign(el.style, v);
    } else if (k === "checked" || k === "disabled" || k === "value") {
      el[k] = v;
    } else if (k === "dataset") {
      Object.assign(el.dataset, v);
    } else {
      el.setAttribute(k, v === true ? "" : String(v));
    }
  }
  appendChildren(el, children);
  return el;
}

function appendChildren(el, children) {
  for (const child of children.flat(Infinity)) {
    if (child === null || child === undefined || child === false) continue;
    if (child instanceof Node) el.appendChild(child);
    else el.appendChild(document.createTextNode(String(child)));
  }
}

export class Component {
  constructor(mount) {
    this.mount = mount;
    this.state = {};
    this._timers = new Set();
    this._cleanups = [];
    this._kept = new Map();
  }

  keep(id, factory) {
    // Node preservation across coarse re-renders (the stand-in for React's
    // keyed reconciliation): the element is created once and MOVED into
    // each new tree, so live MJPEG <img> streams aren't torn down and
    // <input type=file> selections survive setState. Drop with unkeep(id)
    // when the underlying resource must actually change.
    let el = this._kept.get(id);
    if (!el) {
      el = factory();
      this._kept.set(id, el);
    }
    return el;
  }

  unkeep(id) {
    this._kept.delete(id);
  }

  setState(patch) {
    Object.assign(this.state, typeof patch === "function" ? patch(this.state) : patch);
    this.update();
  }

  update() {
    const next = this.render();
    this.mount.replaceChildren(next);
  }

  every(ms, fn) {
    const t = setInterval(fn, ms);
    this._timers.add(t);
    return t;
  }

  onCleanup(fn) {
    this._cleanups.push(fn);
  }

  destroy() {
    for (const t of this._timers) clearInterval(t);
    this._timers.clear();
    this._kept.clear();
    for (const fn of this._cleanups.splice(0)) {
      try {
        fn();
      } catch (e) {}
    }
    this.mount.replaceChildren();
  }
}
