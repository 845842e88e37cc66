"""Interactive realtime 2-D demo — web edition.

The reference demo is a LuaGL window with live mouse force splats and
keyboard solver/force toggles (torch/fluid_net_2d_demo.lua:203-287 keys,
:556-594 mouse). This host is headless, so the interactive loop is a tiny
zero-dependency HTTP server instead: the sim steps continuously in a
background thread; a browser page polls PNG frames and sends mouse drags
as force splats and key presses as runtime toggles.

  python -m fluidnet_tpu.cli.serve --res 128 --port 8642
  # then open http://localhost:8642/

Endpoints:
  GET  /            the viewer page (canvas + key/mouse handlers)
  GET  /frame.png   latest density frame (polled ~20 Hz by the page)
  GET  /stats       JSON {frame, fps, sim_method, plume, ...}
  POST /splat?x=&y=&fx=&fy=   mouse-drag force splat (normalized coords)
  POST /toggle?k=&v=          runtime toggle (sim_method, dt, plume,
                              buoyancy, gravity, vorticity, max_iter —
                              the reference's keyboard switches)

Interactions are queued and applied between sim steps (one writer thread
owns all JAX state; handlers only enqueue), so toggles that change the
jitted config swap executables exactly like demo2d's scripted toggles.
"""

import argparse
import json
import struct
import sys
import threading
import time
import zlib
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.cli.demo2d import density_to_rgb, sphere_force_splat
from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.models.fluidnet import apply_model
from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf

_TOGGLE_ALIASES = {"vorticity": "vorticity_confinement_amp",
                   "buoyancy": "buoyancy_scale", "gravity": "gravity_scale",
                   "advection": "advection_method"}

# Toggleable mconf fields (canonical names). Anything else is rejected at
# the HTTP layer with a 400 — a bad key/value must never reach the sim
# thread, where an uncaught exception would kill the loop and leave the
# server serving one stale frame forever.
_TOGGLE_FIELDS = frozenset((
    "plume", "sim_method", "advection_method", "dt", "max_iter",
    "maccormack_strength", "buoyancy_scale", "gravity_scale",
    "vorticity_confinement_amp", "polish_iters"))
_STRING_FIELDS = frozenset(("sim_method", "advection_method"))


def validate_toggle(k: str, v: str) -> None:
    """Raises ValueError unless (k, v) is a toggle _apply can execute."""
    k = _TOGGLE_ALIASES.get(k, k)
    if k not in _TOGGLE_FIELDS:
        raise ValueError(f"unknown toggle key {k!r}")
    if k == "plume" or k in _STRING_FIELDS:
        return
    if v in ("cycle", "half", "double"):
        return
    float(v)  # numeric field: must parse (raises ValueError otherwise)

PAGE = """<!doctype html>
<html><head><title>fluidnet_tpu live demo</title><style>
 body { background:#111; color:#ddd; font:14px monospace; margin:1em; }
 #view { image-rendering:pixelated; width:640px; height:640px;
         border:1px solid #444; cursor:crosshair; }
 #bar { margin:.5em 0; }
 kbd { background:#333; padding:1px 5px; border-radius:3px; }
</style></head><body>
<h3>fluidnet_tpu &mdash; interactive 2-D plume</h3>
<div id="bar">loading&hellip;</div>
<img id="view" src="/frame.png">
<p>drag: force splat &nbsp; <kbd>c</kbd> convnet <kbd>j</kbd> jacobi
 <kbd>g</kbd> pcg &nbsp; <kbd>p</kbd> plume on/off &nbsp;
 <kbd>b</kbd> buoyancy <kbd>v</kbd> vorticity (cycle) &nbsp;
 <kbd>[</kbd>/<kbd>]</kbd> dt &divide;/&times;2</p>
<script>
const img = document.getElementById('view'), bar = document.getElementById('bar');
let t = 0;
setInterval(() => { img.src = '/frame.png?t=' + (t++); }, 50);
setInterval(async () => {
  const s = await (await fetch('/stats')).json();
  bar.textContent = `frame ${s.frame}  ${s.fps.toFixed(1)} fps  ` +
    `solver=${s.sim_method}  plume=${s.plume}  buoyancy=${s.buoyancy}  ` +
    `vorticity=${s.vorticity}  dt=${s.dt}`;
}, 500);
let drag = null;
img.onmousedown = e => { drag = [e.offsetX, e.offsetY]; };
window.onmouseup = () => { drag = null; };
img.onmousemove = e => {
  if (!drag) return;
  const r = img.getBoundingClientRect();
  const x = e.offsetX / r.width, y = e.offsetY / r.height;
  const fx = (e.offsetX - drag[0]) / r.width, fy = (e.offsetY - drag[1]) / r.height;
  drag = [e.offsetX, e.offsetY];
  if (fx || fy) fetch(`/splat?x=${x}&y=${y}&fx=${fx}&fy=${fy}`, {method:'POST'});
};
const KEYS = {c:['sim_method','convnet'], j:['sim_method','jacobi'],
              g:['sim_method','pcg'], p:['plume','toggle'],
              b:['buoyancy','cycle'], v:['vorticity','cycle'],
              '[':['dt','half'], ']':['dt','double']};
window.onkeydown = e => {
  const kv = KEYS[e.key];
  if (kv) fetch(`/toggle?k=${kv[0]}&v=${kv[1]}`, {method:'POST'});
};
</script></body></html>"""


def png_bytes(rgb):
    """demo2d.write_png, to memory."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + \
            struct.pack(">I", zlib.crc32(c) & 0xffffffff)

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", hdr) +
            chunk(b"IDAT", zlib.compress(raw, 3)) + chunk(b"IEND", b""))


class DemoSim:
    """Owns all JAX state; steps on its own thread. HTTP handlers enqueue
    interactions and read the latest encoded frame under a lock."""

    def __init__(self, res=128, model="", sim_method="convnet", dt=0.1,
                 max_iter=34, target_fps=30.0):
        self.res = res
        self.target_dt = 1.0 / target_fps
        if model:
            mconf = load_mconf(model)
            assert not mconf.is_3d, "serve needs a 2-D model"
            tmpl = init_train_state(jax.random.PRNGKey(0), mconf)
            tstate, mconf, _ = load_checkpoint(model, tmpl)
            self.params = tstate.params
            mconf = mconf.replace(sim_method=sim_method)
        else:
            mconf = ModelConfig(is_3d=False, sim_method=sim_method)
            self.params = init_train_state(
                jax.random.PRNGKey(0), mconf).params
        self.mconf = mconf.replace(
            dt=dt, buoyancy_scale=1.0, vorticity_confinement_amp=0.0,
            advection_method="maccormackOurs", max_iter=max_iter)
        B, Z, Y, X = 1, 1, res, res
        self.state = FluidState(
            u=jnp.zeros((B, 2, Z, Y, X), jnp.float32),
            p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
            flags=empty_domain((B, 1, Z, Y, X), False),
            density=jnp.zeros((B, 3, Z, Y, X), jnp.float32))
        self.plume = True
        self.bcs = create_plume_bcs(self.state, [1.0, 0.8, 0.3],
                                    u_scale=0.6, rad=0.15)
        self.step = self._make_step(self.mconf)
        self.lock = threading.Lock()
        self.queue = []          # pending (kind, payload) interactions
        self.frame_png = png_bytes(
            density_to_rgb(np.asarray(self.state.density)[0, :, 0]))
        self.frame_i = 0
        self.fps = 0.0
        self.running = True

    def _make_step(self, mc):
        # dt and the force scales ride as TRACED arguments (simulate's
        # training-loop override path), so the dt / buoyancy / vorticity
        # keyboard toggles are instant; only solver / advection-method
        # switches recompile.
        def model_fn(pr, p, u, f, **kw):
            return apply_model(pr, mc, p, u, f, **kw)
        return jax.jit(lambda s, prm, b, dt, bs, va: simulate(
            s, mc, model_fn if mc.sim_method == "convnet" else None,
            prm, b, dt=dt, buoyancy_scale=bs, vorticity_amp=va))

    # -- handler side ------------------------------------------------------
    def enqueue(self, kind, payload):
        with self.lock:
            self.queue.append((kind, payload))

    def stats(self):
        m = self.mconf
        return {"frame": self.frame_i, "fps": round(self.fps, 2),
                "sim_method": m.sim_method, "plume": self.plume,
                "buoyancy": m.buoyancy_scale,
                "vorticity": m.vorticity_confinement_amp,
                "dt": m.dt, "res": self.res}

    # -- sim side ----------------------------------------------------------
    def _apply(self, kind, p):
        if kind == "splat":
            # Normalized page coords -> grid (page y is down, grid y up).
            cy = (1.0 - p["y"]) * (self.res - 1)
            cx = p["x"] * (self.res - 1)
            f = (-p["fy"] * self.res, p["fx"] * self.res)
            self.state = sphere_force_splat(
                self.state, (cy, cx), f, radius=self.res / 10)
            return
        k, v = _TOGGLE_ALIASES.get(p["k"], p["k"]), p["v"]
        if k == "plume":
            self.plume = (not self.plume) if v == "toggle" else \
                v in ("1", "on", "true")
            self.bcs = create_plume_bcs(
                self.state, [1.0, 0.8, 0.3], u_scale=0.6, rad=0.15) \
                if self.plume else None
            return
        m = self.mconf
        if v == "cycle":                       # 0 -> 1 -> 2 -> 4 -> 0 ...
            cur = getattr(m, k)
            v = 0.0 if cur >= 4 else (1.0 if cur == 0 else cur * 2)
        elif v == "half":
            v = getattr(m, k) / 2
        elif v == "double":
            v = getattr(m, k) * 2
        elif isinstance(getattr(m, k), (int, float)):
            v = type(getattr(m, k))(float(v))
        self.mconf = m.replace(**{k: v})
        if k not in ("dt", "buoyancy_scale", "vorticity_confinement_amp"):
            self.step = self._make_step(self.mconf)  # recompile toggles

    def loop(self):
        t_prev = time.perf_counter()
        deadline = t_prev
        while self.running:
            with self.lock:
                pending, self.queue = self.queue, []
            for kind, payload in pending:
                # Defense in depth behind validate_toggle: the sim thread
                # must survive any bad interaction (log and keep running).
                try:
                    self._apply(kind, payload)
                except Exception as e:
                    print(f"serve: ignoring bad {kind} {payload}: {e}",
                          file=sys.stderr)
            m = self.mconf
            self.state = self.step(
                self.state, self.params, self.bcs, jnp.asarray(m.dt),
                jnp.asarray(m.buoyancy_scale),
                jnp.asarray(m.vorticity_confinement_amp))
            rgb = density_to_rgb(np.asarray(self.state.density)[0, :, 0])
            png = png_bytes(rgb)
            now = time.perf_counter()
            with self.lock:
                self.frame_png = png
                self.frame_i += 1
                self.fps = 0.9 * self.fps + 0.1 / max(now - t_prev, 1e-6)
            t_prev = now
            # Deadline throttle (not per-frame sleep arithmetic, which
            # alternates 0/2x when the step is faster than the target).
            deadline = max(deadline + self.target_dt,
                           now - self.target_dt)
            if deadline > now:
                time.sleep(deadline - now)


def make_handler(sim: DemoSim):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/":
                self._send(200, "text/html", PAGE.encode())
            elif path == "/frame.png":
                with sim.lock:
                    png = sim.frame_png
                self._send(200, "image/png", png)
            elif path == "/stats":
                self._send(200, "application/json",
                           json.dumps(sim.stats()).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if u.path == "/splat":
                    sim.enqueue("splat", {k: float(q[k])
                                          for k in ("x", "y", "fx", "fy")})
                elif u.path == "/toggle":
                    validate_toggle(q["k"], q["v"])
                    sim.enqueue("toggle", {"k": q["k"], "v": q["v"]})
                else:
                    return self._send(404, "text/plain", b"not found")
            except (KeyError, ValueError) as e:
                return self._send(400, "text/plain", str(e).encode())
            self._send(200, "application/json", b"{}")

        def log_message(self, *a):   # quiet
            pass

    return Handler


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--max_iter", type=int, default=34)
    ap.add_argument("--target_fps", type=float, default=30.0)
    ap.add_argument("--sim_method", default="convnet",
                    choices=["convnet", "jacobi", "pcg"])
    ap.add_argument("--model", default="",
                    help="trained 2-D checkpoint dir (else random init)")
    args = ap.parse_args(argv)

    sim = DemoSim(res=args.res, model=args.model,
                  sim_method=args.sim_method, dt=args.dt,
                  max_iter=args.max_iter, target_fps=args.target_fps)
    threading.Thread(target=sim.loop, daemon=True).start()
    srv = ThreadingHTTPServer((args.host, args.port), make_handler(sim))
    print(f"serving on http://{args.host}:{args.port}/ "
          f"({args.res}^2, {sim.mconf.sim_method})", flush=True)
    try:
        srv.serve_forever()
    finally:
        sim.running = False


if __name__ == "__main__":
    main()
