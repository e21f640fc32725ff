/* Shared frontend helpers (loaded by index.html and wall.html). */
"use strict";

/* escape operator/model-provided strings before any innerHTML use —
 * security-critical; keep the ONE copy here */
function escHtml(s) {
  return String(s)
    .replaceAll("&", "&amp;").replaceAll("<", "&lt;").replaceAll(">", "&gt;")
    .replaceAll('"', "&quot;").replaceAll("'", "&#39;");
}

/* frame previews must be data: images — anything else (e.g. an injected
 * attribute payload or javascript: URI) is dropped */
function safeFrameSrc(v) {
  return typeof v === "string" && v.startsWith("data:image/") ? v : null;
}

window.escHtml = escHtml;
window.safeFrameSrc = safeFrameSrc;
