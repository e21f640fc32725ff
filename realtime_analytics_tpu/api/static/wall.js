/* 32-stream wall: one live card per stream (counterpart of the reference's
 * showcase dashboards, built on the same WS protocol). ?mock=1 works. */
"use strict";

const wall = {
  events: new Map(),
  lastSeen: new Map(),
  ws: null,
};

function escw(s) {
  return String(s)
    .replaceAll("&", "&amp;").replaceAll("<", "&lt;").replaceAll(">", "&gt;")
    .replaceAll('"', "&quot;").replaceAll("'", "&#39;");
}

function setConn(up) {
  document.getElementById("conn-dot").className = "dot " + (up ? "up" : "down");
  document.getElementById("chip-ws").textContent = up ? "WS: live" : "WS: reconnecting…";
}

function ingest(evt) {
  if (!evt || !evt.stream) return;
  wall.events.set(evt.stream, evt);
  wall.lastSeen.set(evt.stream, Date.now());
}

function connect() {
  const proto = location.protocol === "https:" ? "wss" : "ws";
  const ws = new WebSocket(`${proto}://${location.host}/ws`);
  wall.ws = ws;
  ws.onopen = () => setConn(true);
  ws.onclose = () => { setConn(false); setTimeout(connect, 2000); };
  ws.onerror = () => ws.close();
  ws.onmessage = (msg) => {
    let data;
    try { data = JSON.parse(msg.data); } catch { return; }
    if (data.type === "snapshot") (data.payload.events || []).forEach(ingest);
    else if (data.type === "event") ingest(data.payload);
  };
}

function render() {
  const now = Date.now();
  const names = [...wall.events.keys()].sort();
  document.getElementById("chip-count").textContent = `streams: ${names.length}`;
  const cards = names.map((name) => {
    const evt = wall.events.get(name);
    const age = now - (wall.lastSeen.get(name) || 0);
    const active = age < 5000;
    const tracks = (evt.tracks || []).length;
    const fps = active && typeof evt.fps === "number" ? evt.fps.toFixed(1) : "–";
    const health = active && typeof evt.health === "number"
      ? Math.max(0, Math.min(1, evt.health)) : 0;
    const img = evt.frame_jpeg
      ? `<img src="${evt.frame_jpeg}" alt="">` : "";
    return `<div class="card ${active ? "" : "idle"}" id="card-${escw(name)}">
      <div class="card-head">
        <span class="card-name">${escw(name)}</span>
        <span class="card-fps">${fps} fps</span>
      </div>
      ${img}
      <div class="card-stats">
        <span>frame ${evt.frame_id ?? "–"}</span>
        <span>${tracks} track${tracks === 1 ? "" : "s"}</span>
        <span>${active ? (age / 1000).toFixed(1) + "s" : "idle"}</span>
      </div>
      <div class="hbar"><span style="width:${(health * 100).toFixed(0)}%"></span></div>
    </div>`;
  });
  document.getElementById("wall").innerHTML = cards.join("")
    || '<div class="hint">waiting for events…</div>';
}

async function boot() {
  if (mockEnabled()) {
    new MockFeed(ingest, 32).start();
    setConn(true);
  } else {
    try {
      const snap = await (await fetch("/api/snapshot")).json();
      (snap.events || []).forEach(ingest);
    } catch { /* server may still be starting */ }
    connect();
  }
  setInterval(render, 1000);
  render();
}

boot();
