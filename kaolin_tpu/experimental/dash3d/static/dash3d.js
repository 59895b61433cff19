/* Dash3D client: dependency-free canvas renderer + websocket geometry
 * streaming. Parses the same binary wire format as the reference
 * (kaolin/experimental/dash3d/util.py:28,64): framed messages of
 * int32[4] (type_id, view_id, snap_time, reserved) + geometry payload.
 * Renders meshes as flat-shaded triangles (painter's algorithm) and
 * point clouds as dots; drag to orbit, wheel to zoom.
 */
"use strict";

const views = [];  // {canvas, ctx, geom, rotX, rotY, zoom, type, category, id, time}

function normalizeGeom(positions) {
  let mn = [Infinity, Infinity, Infinity], mx = [-Infinity, -Infinity, -Infinity];
  for (let i = 0; i < positions.length; i += 3) {
    for (let a = 0; a < 3; a++) {
      mn[a] = Math.min(mn[a], positions[i + a]);
      mx[a] = Math.max(mx[a], positions[i + a]);
    }
  }
  const c = [0, 1, 2].map(a => 0.5 * (mn[a] + mx[a]));
  const s = Math.max(mx[0] - mn[0], mx[1] - mn[1], mx[2] - mn[2]) || 1;
  return {center: c, scale: 2.0 / s};
}

function parseMeshes(dv, off) {
  const nmeshes = dv.getInt32(off, true); off += 16;
  const meshes = [];
  for (let m = 0; m < nmeshes; m++) {
    const nv = dv.getInt32(off, true), nf = dv.getInt32(off + 4, true);
    off += 8;
    const verts = new Float32Array(dv.buffer, off, nv * 3); off += nv * 12;
    const faces = new Int32Array(dv.buffer.slice(off, off + nf * 12)); off += nf * 12;
    meshes.push({verts, faces});
  }
  return meshes;
}

function parseClouds(dv, off) {
  const nclouds = dv.getInt32(off, true); off += 16;
  const clouds = [];
  for (let c = 0; c < nclouds; c++) {
    const npts = dv.getInt32(off, true); off += 8;
    off += 24;  // bbox min/max
    const pts = new Float32Array(dv.buffer, off, npts * 3); off += npts * 12;
    clouds.push({pts});
  }
  return clouds;
}

function project(v, view, w, h) {
  // rotate around Y then X, orthographic
  const cy = Math.cos(view.rotY), sy = Math.sin(view.rotY);
  const cx = Math.cos(view.rotX), sx = Math.sin(view.rotX);
  let x = v[0] * cy + v[2] * sy;
  let z = -v[0] * sy + v[2] * cy;
  let y = v[1] * cx - z * sx;
  z = v[1] * sx + z * cx;
  const s = 0.4 * Math.min(w, h) * view.zoom;
  return [w / 2 + x * s, h / 2 - y * s, z];
}

function drawView(view) {
  const ctx = view.ctx, w = view.canvas.width, h = view.canvas.height;
  ctx.fillStyle = "#111";
  ctx.fillRect(0, 0, w, h);
  if (!view.geom) return;
  const g = view.geom;
  const norm = g.norm;
  const tv = (i, arr) => {
    const v = [(arr[3 * i] - norm.center[0]) * norm.scale,
               (arr[3 * i + 1] - norm.center[1]) * norm.scale,
               (arr[3 * i + 2] - norm.center[2]) * norm.scale];
    return project(v, view, w, h);
  };
  if (g.meshes) {
    for (const mesh of g.meshes) {
      const tris = [];
      for (let f = 0; f < mesh.faces.length; f += 3) {
        const a = tv(mesh.faces[f], mesh.verts);
        const b = tv(mesh.faces[f + 1], mesh.verts);
        const c = tv(mesh.faces[f + 2], mesh.verts);
        // flat shade by screen-space normal z
        const nz = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]);
        tris.push({a, b, c, z: (a[2] + b[2] + c[2]) / 3, nz});
      }
      tris.sort((p, q) => p.z - q.z);
      for (const t of tris) {
        const shade = Math.max(40, Math.min(230,
          128 + 120 * t.nz / (Math.abs(t.nz) + 1e-5) *
          Math.min(1, Math.abs(t.nz) / 2000)));
        ctx.fillStyle = `rgb(${shade * 0.4},${shade * 0.75},${shade})`;
        ctx.beginPath();
        ctx.moveTo(t.a[0], t.a[1]);
        ctx.lineTo(t.b[0], t.b[1]);
        ctx.lineTo(t.c[0], t.c[1]);
        ctx.closePath();
        ctx.fill();
      }
    }
  }
  if (g.clouds) {
    ctx.fillStyle = "#7fc8ff";
    for (const cloud of g.clouds) {
      for (let i = 0; i < cloud.pts.length / 3; i++) {
        const p = tv(i, cloud.pts);
        ctx.fillRect(p[0] - 1, p[1] - 1, 2, 2);
      }
    }
  }
}

function setupView(canvas, type, category, id) {
  const view = {canvas, ctx: canvas.getContext("2d"), geom: null,
                rotX: -0.4, rotY: 0.7, zoom: 1.0, type, category, id,
                time: 1e9, current_time: null};
  let dragging = false, px = 0, py = 0;
  canvas.addEventListener("mousedown", e => {dragging = true; px = e.offsetX; py = e.offsetY;});
  window.addEventListener("mouseup", () => dragging = false);
  canvas.addEventListener("mousemove", e => {
    if (!dragging) return;
    view.rotY += (e.offsetX - px) * 0.01;
    view.rotX += (e.offsetY - py) * 0.01;
    px = e.offsetX; py = e.offsetY;
    drawView(view);
  });
  canvas.addEventListener("wheel", e => {
    e.preventDefault();
    view.zoom *= Math.exp(-e.deltaY * 0.001);
    drawView(view);
  });
  views.push(view);
  drawView(view);
  return view;
}

function connect() {
  const ws = new WebSocket(`ws://${location.host}/websocket/`);
  ws.binaryType = "arraybuffer";

  ws.onmessage = ev => {
    if (typeof ev.data === "string") {
      const msg = JSON.parse(ev.data);
      if (msg.type === "dirinfo") buildViews(JSON.parse(msg.data), ws);
      return;
    }
    const dv = new DataView(ev.data);
    const typeId = dv.getInt32(0, true);
    const viewId = dv.getInt32(4, true);
    const snap = dv.getInt32(8, true);
    const view = views[viewId];
    if (!view) return;
    view.current_time = snap;
    if (typeId === 0) {
      const meshes = parseMeshes(dv, 16);
      const all = meshes.length ? meshes[0].verts : new Float32Array(0);
      view.geom = {meshes, norm: normalizeGeom(all)};
    } else {
      const clouds = parseClouds(dv, 16);
      const all = clouds.length ? clouds[0].pts : new Float32Array(0);
      view.geom = {clouds, norm: normalizeGeom(all)};
    }
    drawView(view);
    const label = document.getElementById(`label-${viewId}`);
    if (label) label.textContent =
      `${view.type} "${view.category}"[${view.id}] @ t=${snap}`;
  };

  ws.onopen = () => console.log("dash3d socket open");
  return ws;
}

function buildViews(dirinfo, ws) {
  const container = document.getElementById("views");
  container.innerHTML = "";
  views.length = 0;
  const requests = [];
  for (const type of ["mesh", "pointcloud"]) {
    for (const category in dirinfo[type] || {}) {
      for (const id of dirinfo[type][category]) {
        const viewId = views.length;
        const div = document.createElement("div");
        div.className = "viewport";
        const label = document.createElement("div");
        label.id = `label-${viewId}`;
        label.textContent = `${type} "${category}"[${id}]`;
        const canvas = document.createElement("canvas");
        canvas.width = 420; canvas.height = 340;
        div.appendChild(label);
        div.appendChild(canvas);
        container.appendChild(div);
        setupView(canvas, type, category, id);
        requests.push({type, category, id, time: 1e9, view_id: viewId});
      }
    }
  }
  if (requests.length) ws.send(JSON.stringify({type: "geometry", data: requests}));

  // time slider re-requests geometry at a chosen timestamp
  const slider = document.getElementById("time-slider");
  if (slider) slider.addEventListener("change", () => {
    const reqs = views.map((v, i) => ({
      type: v.type, category: v.category, id: v.id,
      time: Number(slider.value), view_id: i,
      current_time: v.current_time}));
    ws.send(JSON.stringify({type: "geometry", data: reqs}));
  });
}

window.addEventListener("load", connect);
