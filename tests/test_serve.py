"""Interactive web demo server (cli/serve.py) — the headless-host stand-in
for the reference's LuaGL window with mouse splats + keyboard toggles
(fluid_net_2d_demo.lua:203-287, :556-594)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from fluidnet_tpu.cli.serve import DemoSim, make_handler, png_bytes


def _mk_sim():
    # jacobi: no model init, fast CPU compile at 16^2.
    return DemoSim(res=16, sim_method="jacobi", max_iter=4,
                   target_fps=1000.0)


def _run_frames(sim, n):
    for _ in range(n):
        with sim.lock:
            pending, sim.queue = sim.queue, []
        for kind, payload in pending:
            sim._apply(kind, payload)
        import jax.numpy as jnp
        m = sim.mconf
        sim.state = sim.step(sim.state, sim.params, sim.bcs,
                             jnp.asarray(m.dt),
                             jnp.asarray(m.buoyancy_scale),
                             jnp.asarray(m.vorticity_confinement_amp))
        sim.frame_i += 1


def test_png_bytes_roundtrip():
    rgb = (np.random.default_rng(0).random((16, 16, 3)) * 255).astype(
        np.uint8)
    data = png_bytes(rgb)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    back = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(back, rgb)


def test_sim_splat_and_toggles():
    sim = _mk_sim()
    _run_frames(sim, 2)
    u0 = np.asarray(sim.state.u).copy()
    # Mouse splat: enqueued, applied next frame, changes the velocity.
    sim.enqueue("splat", {"x": 0.5, "y": 0.5, "fx": 0.2, "fy": -0.1})
    _run_frames(sim, 1)
    assert not np.allclose(np.asarray(sim.state.u), u0)
    # Keyboard toggles: traced (dt) and recompiling (plume) paths.
    sim.enqueue("toggle", {"k": "dt", "v": "half"})
    sim.enqueue("toggle", {"k": "buoyancy", "v": "cycle"})
    sim.enqueue("toggle", {"k": "plume", "v": "toggle"})
    _run_frames(sim, 1)
    assert sim.mconf.dt == 0.05
    assert sim.mconf.buoyancy_scale == 2.0
    assert sim.plume is False and sim.bcs is None
    st = sim.stats()
    assert st["sim_method"] == "jacobi" and st["frame"] == 4


def test_http_endpoints():
    sim = _mk_sim()
    _run_frames(sim, 1)
    sim.frame_png = png_bytes(np.zeros((16, 16, 3), np.uint8))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(sim))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "fluidnet_tpu" in page and "/frame.png" in page
        png = urllib.request.urlopen(base + "/frame.png").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        stats = json.loads(
            urllib.request.urlopen(base + "/stats").read())
        assert stats["res"] == 16
        req = urllib.request.Request(
            base + "/splat?x=0.5&y=0.5&fx=0.1&fy=0.1", method="POST")
        assert urllib.request.urlopen(req).status == 200
        req = urllib.request.Request(
            base + "/toggle?k=vorticity&v=cycle", method="POST")
        assert urllib.request.urlopen(req).status == 200
        assert len(sim.queue) == 2
        req = urllib.request.Request(base + "/splat?x=bad", method="POST")
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
