#!/usr/bin/env python
"""Interactive neural-volume viewer — the reference's GUI apps rebuilt for
headless TPU hosts as a zero-dependency web viewer.

Covers the interactive capability of both `vnr_int_single` (view a trained
model: drag-orbit camera, live render-mode switching; reference
apps/int_volume.cpp:375-427) and `vnr_int_dual` (ONLINE training inside the
render loop with progressive decode so the view sharpens as it learns;
reference apps/int_dual_volume.cpp:498-699) — with the browser standing in
for ImGui and HTTP polling for the GL swapchain.

Control flow mirrors the reference's background_work thread: user edits land
as transactional values (int_volume.cpp:389-427, vidi::TransactionalValue)
that the render loop applies between frames; training steps and progressive
decode blobs run in the same loop (int_dual_volume.cpp:662-674).

    # online training (int_dual):
    python apps/vnr_int_viewer.py --synthetic vorts --dims 64 --port 8642
    # view a trained model (int_single):
    python apps/vnr_int_viewer.py --load params.json --port 8642

then open http://127.0.0.1:8642/ — drag orbits, wheel zooms, the toolbar
switches render modes and pauses/resumes training.
"""
from __future__ import annotations

import argparse
import io
import json
import math
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from common import add_model_args, add_volume_args, load_model_config, \
    load_simple_volume

_PAGE = """<!doctype html>
<html><head><title>instantvnr-tpu viewer</title><style>
 body { background:#181818; color:#ddd; font:13px monospace; margin:12px }
 #view { border:1px solid #444; image-rendering:pixelated; cursor:grab }
 #bar { margin:6px 0 } select,button,label { font:inherit }
 #stats { color:#8c8 }
</style></head><body>
<div id="bar">
 mode <select id="mode"></select>
 <label><input type="checkbox" id="train"> train</label>
 <label><input type="checkbox" id="shade"> shading</label>
 <label><input type="checkbox" id="shadow"> shadows</label>
 iso <input type="range" id="iso" min="0" max="1" step="0.01" value="0.5"
   style="vertical-align:middle">
 density <input type="range" id="den" min="-1" max="1" step="0.05" value="0"
   style="vertical-align:middle">
 <span id="stats"></span>
</div>
<img id="view" draggable="false">
<div><canvas id="curve" width="512" height="90"
  style="border:1px solid #333; background:#111"></canvas></div>
<script>
const img = document.getElementById('view');
let cam = null, drag = null;
async function state() {
  const s = await (await fetch('/api/state')).json();
  if (cam === null) cam = s.camera;
  const sel = document.getElementById('mode');
  if (!sel.options.length) {
    for (const m of s.modes) {
      const o = document.createElement('option');
      o.value = o.textContent = m; sel.appendChild(o);
    }
    sel.onchange = () => fetch('/api/mode?name=' + sel.value);
    const tr = document.getElementById('train');
    tr.onchange = () => fetch('/api/training?on=' + (tr.checked ? 1 : 0));
    const iso = document.getElementById('iso');
    iso.oninput = () => fetch('/api/iso?value=' + iso.value);
    const den = document.getElementById('den');
    den.onchange = () =>
      fetch('/api/density?value=' + Math.pow(10, den.value));
    const sh = document.getElementById('shade');
    sh.onchange = () => fetch('/api/shading?on=' + (sh.checked ? 1 : 0));
    const sv = document.getElementById('shadow');
    sv.onchange = () => fetch('/api/shadows?on=' + (sv.checked ? 1 : 0));
  }
  sel.value = s.mode;
  document.getElementById('train').checked = s.training;
  let extra = '';
  if (s.streaming_cache && s.streaming_cache.quality !== 'n/a')
    extra = `  [cache ${s.streaming_cache.resolved}: `
          + `${s.streaming_cache.quality}]`;
  document.getElementById('stats').textContent =
    ` step ${s.step}  loss ${s.loss.toFixed(5)}  ${s.fps.toFixed(1)} fps`
    + extra;
}
// live training curve (int_dual_volume.cpp:426-431 implot panel)
async function curve() {
  const c = await (await fetch('/api/curve')).json();
  const cv = document.getElementById('curve'), g = cv.getContext('2d');
  g.clearRect(0, 0, cv.width, cv.height);
  if (c.step.length < 2) return;
  const ls = c.loss.map(v => Math.log10(Math.max(v, 1e-8)));
  const lmin = Math.min(...ls), lmax = Math.max(...ls, lmin + 1e-6);
  const smin = c.step[0], smax = c.step[c.step.length - 1];
  g.strokeStyle = '#8c8'; g.beginPath();
  for (let i = 0; i < ls.length; i++) {
    const x = (c.step[i] - smin) / Math.max(smax - smin, 1) * (cv.width - 8) + 4;
    const y = cv.height - 6 - (ls[i] - lmin) / (lmax - lmin) * (cv.height - 12);
    i ? g.lineTo(x, y) : g.moveTo(x, y);
  }
  g.stroke();
  g.fillStyle = '#888'; g.font = '10px monospace';
  g.fillText(`loss ${c.loss[c.loss.length-1].toExponential(2)} @ ${smax}`,
             6, 12);
}
function sendCam() {
  fetch(`/api/camera?yaw=${cam.yaw}&pitch=${cam.pitch}&dist=${cam.dist}`);
}
img.onmousedown = e => { drag = [e.clientX, e.clientY]; };
window.onmouseup = () => { drag = null; };
window.onmousemove = e => {
  if (!drag || !cam) return;
  cam.yaw += (e.clientX - drag[0]) * 0.01;
  cam.pitch = Math.max(-1.5, Math.min(1.5,
    cam.pitch + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY]; sendCam();
};
img.onwheel = e => {
  if (!cam) return;
  cam.dist *= Math.exp(e.deltaY * 0.001); sendCam(); e.preventDefault();
};
setInterval(() => { img.src = '/frame.png?t=' + Date.now(); }, 150);
setInterval(state, 500); state();
setInterval(curve, 1000); curve();
</script></body></html>"""


@dataclass
class Orbit:
    """Spherical orbit camera (the GUI apps' arcball equivalent)."""

    yaw: float
    pitch: float
    dist: float
    center: tuple = (0.0, 0.0, 0.0)

    def to_camera(self):
        from instantvnr_tpu.render.camera import Camera

        cp, sp = math.cos(self.pitch), math.sin(self.pitch)
        cy, sy = math.cos(self.yaw), math.sin(self.yaw)
        eye = (self.center[0] + self.dist * cp * sy,
               self.center[1] + self.dist * sp,
               self.center[2] - self.dist * cp * cy)
        return Camera(eye=eye, center=self.center, up=(0, 1, 0), fovy=45)

    @classmethod
    def default_for_dims(cls, dims):
        d = max(dims)
        # the apps' default eye (0.15d, 0.1d, -2d), in spherical form
        dist = math.sqrt(0.15**2 + 0.1**2 + 4.0) * d
        return cls(yaw=math.atan2(0.15 * d, 2.0 * d),
                   pitch=math.asin(0.1 * d / dist), dist=dist)


class ViewerApp:
    """Render loop + shared state; HTTP handlers read/write via the lock."""

    MAX_ACCUM = 32  # keep accumulating this many frames after the last edit

    def __init__(self, renderer, nv=None, train_steps=10, blobs=2,
                 refresh_bricks=64,
                 training=False):
        from instantvnr_tpu.api import RenderMode

        self.renderer = renderer
        self.nv = nv
        self.train_steps = train_steps
        # bricks of the streaming cache refreshed per trained frame
        # (round-robin; bounds the per-frame hitch — api.refresh_params)
        self.refresh_bricks = refresh_bricks
        self.blobs = blobs
        self.lock = threading.Lock()
        self.orbit = Orbit.default_for_dims(
            (renderer.neural or renderer.simple).dims)
        self.training = training and nv is not None
        self.pending_mode = None
        self.pending_tf = None  # TF spec dict (the GUI TF-editor edit)
        self.pending_density = None
        self.pending_shading = None  # "none" | "gradient"
        self.pending_shadows = None  # bool
        self.pending_isovalue = None  # float
        self.dirty = True
        self.stop_event = threading.Event()
        self.png = b""
        self.frame_id = 0
        self.fps = 0.0
        # training curve ring buffer (step, loss, fps) — the int_dual live
        # plot data (int_dual_volume.cpp:426-431)
        from collections import deque

        self.curve = deque(maxlen=512)
        self.modes = []
        for m in RenderMode:
            needs_neural = m.name.startswith(("DECODED", "NEURAL")) or \
                m.name in ("PATHTRACE_NEURAL", "PATHTRACE_DECODED",
                           "ISOSURFACE_DECODED", "FULL_SHADOW_DECODED")
            needs_simple = m.name.startswith("REFERENCE") or \
                m.name in ("PATHTRACE_REFERENCE", "ISOSURFACE_REFERENCE",
                           "FULL_SHADOW_REFERENCE")
            if needs_neural and nv is None:
                continue
            if needs_simple and renderer.simple is None:
                continue
            self.modes.append(m.name)
        self._accum_left = self.MAX_ACCUM

    # ---- render loop (the reference's background_work thread) ----------

    def loop(self):
        import numpy as np
        import traceback

        while not self.stop_event.is_set():
            try:
                self._loop_once(np)
            except Exception:  # noqa: BLE001 — a bad edit (e.g. malformed
                # TF spec) must not kill the render thread; log and keep
                # serving (the edit is already consumed, state stays clean)
                traceback.print_exc()
                time.sleep(0.1)

    def _loop_once(self, np):
        t0 = time.time()
        with self.lock:
            dirty, self.dirty = self.dirty, False
            mode, self.pending_mode = self.pending_mode, None
            tf_spec, self.pending_tf = self.pending_tf, None
            density, self.pending_density = self.pending_density, None
            iso, self.pending_isovalue = self.pending_isovalue, None
            cam = self.orbit.to_camera()
            training = self.training
        if mode is not None:
            from instantvnr_tpu.api import RenderMode

            self.renderer.set_mode(RenderMode[mode])
            dirty = True
        if tf_spec is not None:
            # interactive TF edit (the reference GUI's TF editor path:
            # per-change macrocell max-opacity refresh via
            # set_transfer_function, int_volume.cpp:389-427)
            from instantvnr_tpu.config import TransferFunctionConfig

            base = TransferFunctionConfig()
            cfg = TransferFunctionConfig(
                colors=tuple(tuple(c) for c in
                             tf_spec.get("colors", base.colors)),
                alphas=tuple(tuple(a) for a in
                             tf_spec.get("alphas", base.alphas)),
                range=tuple(tf_spec.get("range", base.range)),
            )
            self.renderer.set_transfer_function(cfg)
            dirty = True
        if density is not None:
            self.renderer.set_volume_density_scale(density)
            dirty = True
        if iso is not None:
            self.renderer.set_isovalue(iso)
            dirty = True
        from instantvnr_tpu.api import RenderMode

        decoded = self.renderer.mode == RenderMode.DECODED_SLAB
        if decoded:
            # shading/shadow edits apply only on the decoded path; they stay
            # PENDING (not consumed) in other modes so checking the box and
            # then switching to DECODED_SLAB honors it
            with self.lock:
                shading, self.pending_shading = self.pending_shading, None
                shadows, self.pending_shadows = self.pending_shadows, None
            if shading is not None:
                # decoded-path gradient shading toggle (the reference GUI's
                # shading combo, int_volume.cpp:389-427)
                self.renderer.set_slab_shading(shading)
                dirty = True
            if shadows is not None:
                if shadows:
                    self.renderer.enable_shadows()
                else:
                    self.renderer.disable_shadows()
                dirty = True
        trained = False
        if training and self.nv is not None and self.nv.simple is not None:
            # int_dual_volume.cpp:662-674 training slice
            self.nv.train(self.train_steps, fast_mode=False)
            st = self.nv.statistics()
            with self.lock:
                self.curve.append((int(st.step), float(st.loss), self.fps))
            if decoded:
                # progressive decode feeds only the decoded-slab grid;
                # refresh_params below rebinds the network-sampling modes
                self.nv.decode_progressive(self.blobs)
            trained = True
        if dirty:
            self.renderer.set_camera(cam)
            self._accum_left = self.MAX_ACCUM
        if trained:
            self.renderer.refresh_params(
                budget_bricks=self.refresh_bricks or None)
            self.renderer.reset_accumulation()
            self._accum_left = self.MAX_ACCUM
        if self._accum_left <= 0:
            time.sleep(0.03)
            return
        self._accum_left -= 1
        self.renderer.render()
        frame = self.renderer.mapframe()
        png = _encode_png(np.asarray(frame))
        with self.lock:
            self.png = png
            self.frame_id += 1
            self.fps = 1.0 / max(time.time() - t0, 1e-9)

    # ---- state for /api/state ------------------------------------------

    def state(self):
        with self.lock:
            s = {
                "frame": self.frame_id,
                "mode": self.renderer.mode.name,
                "modes": self.modes,
                "training": self.training,
                "fps": self.fps,
                "camera": {"yaw": self.orbit.yaw, "pitch": self.orbit.pitch,
                           "dist": self.orbit.dist},
                "isovalue": self.renderer.isovalue,
                "step": 0, "loss": 0.0,
            }
        if self.nv is not None:
            st = self.nv.statistics()
            s["step"], s["loss"] = st.step, float(st.loss)
        # the NEURAL_WAVEFRONT* sampling quality is policy-dependent
        # (decoded-grade brick pool by default) — surface it (VERDICT r3 #9)
        s["streaming_cache"] = self.renderer.streaming_cache_info
        # schedule-replay diagnostics (compaction.drive_compacted): how
        # many frames rode the free-running fast path vs re-recorded
        sc = getattr(self.renderer._impl, "_sched_cache", None)
        if sc:
            s["replay"] = {k: sc.get(k, 0)
                           for k in ("replays", "serialized", "invalidated")}
        return s


def _encode_png(rgba) -> bytes:
    from PIL import Image

    from common import framebuffer_to_u8

    buf = io.BytesIO()
    Image.fromarray(framebuffer_to_u8(rgba)).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(app: ViewerApp, server_holder):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0) or 0)
            self._body = self.rfile.read(length) if length else b""
            self.do_GET()

        def do_GET(self):
            url = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(url.query).items()}
            if url.path == "/":
                return self._send(200, _PAGE.encode(), "text/html")
            if url.path == "/frame.png":
                with app.lock:
                    png = app.png
                if not png:
                    return self._send(503, b"no frame yet")
                return self._send(200, png, "image/png")
            if url.path == "/api/state":
                return self._send(200, json.dumps(app.state()).encode(),
                                  "application/json")
            if url.path == "/api/curve":
                # training curve ring buffer (step, loss, fps columns)
                with app.lock:
                    pts = list(app.curve)
                body = json.dumps({
                    "step": [p[0] for p in pts],
                    "loss": [p[1] for p in pts],
                    "fps": [p[2] for p in pts],
                }).encode()
                return self._send(200, body, "application/json")
            if url.path == "/api/camera":
                with app.lock:
                    o = app.orbit
                    app.orbit = Orbit(
                        yaw=float(q.get("yaw", o.yaw)),
                        pitch=float(q.get("pitch", o.pitch)),
                        dist=float(q.get("dist", o.dist)),
                        center=o.center)
                    app.dirty = True
                return self._send(200, b"ok")
            if url.path == "/api/mode":
                name = q.get("name", "")
                if name not in app.modes:
                    return self._send(400, b"unknown mode")
                with app.lock:
                    app.pending_mode = name
                return self._send(200, b"ok")
            if url.path == "/api/iso":
                # transactional like every other edit: mutating the
                # renderer from the HTTP thread would race the render loop
                with app.lock:
                    app.pending_isovalue = float(q.get("value", 0.5))
                return self._send(200, b"ok")
            if url.path == "/api/tf":
                try:
                    spec = json.loads(getattr(self, "_body", b"")
                                      or q.get("spec", ""))
                except Exception:
                    return self._send(400, b"bad tf json")
                with app.lock:
                    app.pending_tf = spec
                return self._send(200, b"ok")
            if url.path == "/api/density":
                with app.lock:
                    app.pending_density = float(q.get("value", 1.0))
                return self._send(200, b"ok")
            if url.path == "/api/shading":
                with app.lock:
                    app.pending_shading = ("gradient"
                                           if q.get("on", "0") == "1"
                                           else "none")
                return self._send(200, b"ok")
            if url.path == "/api/shadows":
                with app.lock:
                    app.pending_shadows = q.get("on", "0") == "1"
                return self._send(200, b"ok")
            if url.path == "/api/training":
                with app.lock:
                    # training needs GROUND TRUTH too: a checkpoint-loaded
                    # volume (nv.simple is None) would assertion-crash the
                    # render loop on every iteration
                    app.training = (q.get("on", "0") == "1"
                                    and app.nv is not None
                                    and app.nv.simple is not None)
                return self._send(200, b"ok")
            if url.path == "/api/quit":
                self._send(200, b"bye")
                app.stop_event.set()
                threading.Thread(
                    target=server_holder[0].shutdown, daemon=True).start()
                return None
            return self._send(404, b"not found")

    return Handler


def main():
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    add_volume_args(p)
    add_model_args(p)
    p.add_argument("--load", help="trained checkpoint (view like vnr_int_single)")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8642)
    p.add_argument("--mode", default=None,
                   help="initial render mode name (default: decoded slab "
                        "for neural volumes, reference raymarch otherwise)")
    p.add_argument("--train-steps-per-frame", type=int, default=10)
    p.add_argument("--infer-blobs-per-frame", type=int, default=2)
    p.add_argument("--refresh-bricks-per-frame", type=int, default=64,
                   help="streaming-cache bricks re-decoded per trained "
                        "frame (0 = full rebuild each refresh)")
    p.add_argument("--streaming-cache", default="auto",
                   choices=("auto", "brick", "hq", "lazy", "none"),
                   help="sample-streaming cache policy for the "
                        "NEURAL_WAVEFRONT* modes (hq = 2x-supersampled "
                        "pool, near-exact quality; lazy = decode bricks "
                        "on first visibility; none = exact network "
                        "sampling)")
    p.add_argument("--pause-training", action="store_true")
    p.add_argument("--view-only", action="store_true",
                   help="view the ground-truth volume without a network")
    args = p.parse_args()

    from instantvnr_tpu.api import NeuralVolume, RenderMode, VNRenderer

    nv = None
    if args.load:
        nv = NeuralVolume.from_checkpoint(args.load)
        volume = nv
        training = False
    elif (args.synthetic or args.scene) and args.view_only:
        # ground-truth-only interactive viewing (no network): the
        # REFERENCE_* / PATHTRACE_REFERENCE / ISOSURFACE_REFERENCE modes
        volume = load_simple_volume(args)
        training = False
    elif args.synthetic or args.scene:
        simple = load_simple_volume(args)
        cfg = load_model_config(args)
        if not args.model:
            import dataclasses

            # interactive default (see vnr_int_online.py): 2^14 hash cap
            cfg = dataclasses.replace(cfg, encoding=dataclasses.replace(
                cfg.encoding, log2_hashmap_size=14))
        nv = NeuralVolume(cfg, simple=simple, seed=args.seed,
                          train_batch=args.batch)
        volume = nv
        training = not args.pause_training
    else:
        p.error("need --load, --synthetic, or --scene")

    mode = (RenderMode[args.mode] if args.mode
            else (RenderMode.DECODED_SLAB if nv is not None
                  else RenderMode.REFERENCE_RAYMARCH))
    renderer = VNRenderer(volume, args.size, args.size, mode=mode,
                          streaming_cache=args.streaming_cache)
    app = ViewerApp(renderer, nv=nv,
                    train_steps=args.train_steps_per_frame,
                    refresh_bricks=args.refresh_bricks_per_frame,
                    blobs=args.infer_blobs_per_frame, training=training)

    holder = [None]
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(app, holder))
    holder[0] = server
    server.daemon_threads = True
    print(f"[vnr] serving on http://{args.host}:{server.server_address[1]}/",
          flush=True)

    t = threading.Thread(target=app.loop, daemon=True)
    t.start()
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    app.stop_event.set()
    t.join(timeout=30)
    print("[vnr] viewer stopped")


if __name__ == "__main__":
    main()
