"""2-D realtime demo, headless edition.

Equivalent of `qlua -lenv fluid_net_2d_demo.lua`
(torch/fluid_net_2d_demo.lua): a 2-D plume with RGB density advection and
interactive force splats — the LuaGL window becomes PNG/PPM frame dumps
(zero-dependency writer) plus an optional mouse-free scripted "interaction"
(random force splats with the same sphere falloff as lib/emitter.lua:172).

  python -m fluidnet_tpu.cli.demo2d --res 128 --frames 256 \\
      --sim_method convnet --out_dir data/output/demo2d
"""

import argparse
import os
import struct
import time
import zlib

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.models.fluidnet import apply_model
from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf


def write_png(path, rgb):
    """Minimal PNG writer (8-bit RGB, no deps). rgb: (h, w, 3) uint8."""
    h, w, _ = rgb.shape
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + \
            struct.pack(">I", zlib.crc32(c) & 0xffffffff)

    hdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", hdr) +
           chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


def sphere_force_splat(state, center_yx, force_yx, radius):
    """Mouse-splat equivalent: adds a smoothstep-falloff force blob to U
    (lib/emitter.lua sphereForceFalloff + fluid_net_2d_demo.lua:556-594)."""
    _, _, Z, Y, X = state.u.shape
    yy, xx = np.meshgrid(np.arange(Y), np.arange(X), indexing="ij")
    d = np.sqrt((yy - center_yx[0]) ** 2 + (xx - center_yx[1]) ** 2) / radius
    t = np.clip(1.0 - d, 0.0, 1.0)
    fall = (t * t * (3 - 2 * t)).astype(np.float32)  # smoothstep
    du = np.zeros(state.u.shape, np.float32)
    du[0, 0, 0] = force_yx[1] * fall
    du[0, 1, 0] = force_yx[0] * fall
    return state.replace(u=state.u + jnp.asarray(du))


def save_velocity_quiver(path, u, density=None, stride=4):
    """Velocity-arrow visualization — the headless equivalent of the GL
    drawVelocityField (generic/tfluids.cc:350-424)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    ux, uy = np.asarray(u[0, 0, 0]), np.asarray(u[0, 1, 0])
    Y, X = ux.shape
    fig, ax = plt.subplots(figsize=(5, 5))
    if density is not None:
        img = density_to_rgb(density[0, :, 0])
        ax.imshow(img, origin="lower", extent=(0, X, 0, Y))
    yy, xx = np.mgrid[0:Y:stride, 0:X:stride]
    ax.quiver(xx, yy, ux[::stride, ::stride], uy[::stride, ::stride],
              color="w" if density is not None else "k", scale=30)
    ax.set_xlim(0, X)
    ax.set_ylim(0, Y)
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def density_to_rgb(density):
    """density: (c, y, x) in [0, 1]; 1 or 3 channels -> (y, x, 3) uint8."""
    d = np.asarray(density)
    if d.shape[0] == 1:
        d = np.repeat(d, 3, axis=0)
    img = np.clip(d[:3], 0, 1).transpose(1, 2, 0)
    return (img[::-1] * 255).astype(np.uint8)  # flip y for image coords


def parse_toggle_script(spec):
    """Parses '--script 40:sim_method=jacobi;80:dt=0.05,vorticity=2' into
    {frame: {field: value}} — the headless, reproducible equivalent of the
    reference demo's runtime keyboard toggles (fluid_net_2d_demo.lua:
    203-287: solver convnet/jacobi/pcg, advection method, dt, plume,
    buoyancy/gravity/vorticity switches)."""
    events = {}
    if not spec:
        return events
    aliases = {"vorticity": "vorticity_confinement_amp",
               "buoyancy": "buoyancy_scale", "gravity": "gravity_scale",
               "advection": "advection_method"}
    for part in spec.split(";"):
        frame_s, kvs = part.split(":", 1)
        ev = {}
        for kv in kvs.split(","):
            k, v = kv.split("=", 1)
            k = aliases.get(k.strip(), k.strip())
            vs = v.strip()
            if vs.lstrip("-").isdigit():
                v = int(vs)
            else:
                try:
                    v = float(vs)
                except ValueError:
                    v = vs
            if k == "plume":
                v = v in ("1", "on", "true", 1.0)
            ev[k] = v
        events[int(frame_s)] = ev
    return events


def run(args):
    res = args.res
    toggles = parse_toggle_script(args.script)
    if args.model:
        mconf = load_mconf(args.model)
        assert not mconf.is_3d, "demo2d needs a 2-D model"
        tmpl = init_train_state(jax.random.PRNGKey(0), mconf)
        tstate, mconf, _ = load_checkpoint(args.model, tmpl)
        params = tstate.params
        mconf = mconf.replace(sim_method="convnet")
    else:
        mconf = ModelConfig(is_3d=False, sim_method=args.sim_method)
        params = None
        if args.sim_method == "convnet":
            params = init_train_state(jax.random.PRNGKey(0), mconf).params
    mconf = mconf.replace(dt=args.dt, buoyancy_scale=1.0,
                          vorticity_confinement_amp=args.vorticity,
                          advection_method="maccormackOurs",
                          max_iter=args.max_iter)

    B, Z, Y, X = 1, 1, res, res
    # RGB density like the reference demo's image-colored smoke.
    rng = np.random.default_rng(0)
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=empty_domain((B, 1, Z, Y, X), False),
        density=jnp.zeros((B, 3, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0, 0.8, 0.3], u_scale=0.6, rad=0.15)

    def make_step(mc):
        def model_fn(pr, p, u, f):
            return apply_model(pr, mc, p, u, f)
        return jax.jit(lambda s, prm, b: simulate(
            s, mc, model_fn if mc.sim_method == "convnet" else None,
            prm, b))

    step = make_step(mconf)

    os.makedirs(args.out_dir, exist_ok=True)
    t_start = time.perf_counter()
    n_img = 0
    for i in range(args.frames):
        if i in toggles:
            ev = dict(toggles[i])
            plume = ev.pop("plume", None)
            if plume is not None:
                bcs = create_plume_bcs(state, [1.0, 0.8, 0.3], u_scale=0.6,
                                       rad=0.15) if plume else None
            if ev:
                if ev.get("sim_method") == "convnet" and params is None:
                    params = init_train_state(jax.random.PRNGKey(0),
                                              mconf).params
                mconf = mconf.replace(**ev)
                step = make_step(mconf)  # jit cache keyed per config
            print(f"  frame {i}: toggled {toggles[i]}")
        if args.splats and i % 40 == 20:
            c = (rng.integers(res // 4, 3 * res // 4),
                 rng.integers(res // 4, 3 * res // 4))
            f = (rng.standard_normal() * 2, rng.standard_normal() * 2)
            state = sphere_force_splat(state, c, f, radius=res / 10)
        state = step(state, params, bcs)
        if i % args.save_every == 0:
            img = density_to_rgb(np.asarray(state.density)[0, :, 0])
            write_png(os.path.join(args.out_dir, f"frame_{i:05d}.png"), img)
            if args.draw_velocity:
                save_velocity_quiver(
                    os.path.join(args.out_dir, f"vel_{i:05d}.png"),
                    state.u, state.density)
            n_img += 1
    jax.block_until_ready(state.u)
    fps = args.frames / (time.perf_counter() - t_start)
    print(f"demo2d: {args.frames} frames at {res}^2, {fps:.1f} fps "
          f"({mconf.sim_method}); wrote {n_img} PNGs to {args.out_dir}")
    return fps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--save_every", type=int, default=8)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--vorticity", type=float, default=0.0)
    ap.add_argument("--max_iter", type=int, default=34)
    ap.add_argument("--sim_method", default="convnet",
                    choices=["convnet", "jacobi", "pcg"])
    ap.add_argument("--model", default="")
    ap.add_argument("--splats", action="store_true",
                    help="periodic scripted force splats")
    ap.add_argument("--draw_velocity", action="store_true",
                    help="also write velocity-arrow overlays (the GL "
                         "drawVelocityField equivalent)")
    ap.add_argument("--out_dir", default="data/output/demo2d")
    ap.add_argument("--script", default="", help="runtime toggle script "
                    "'FRAME:key=val,key=val;FRAME:...' — keys: sim_method, "
                    "advection, dt, plume, buoyancy, gravity, vorticity, "
                    "max_iter (the reference demo's keyboard switches, "
                    "fluid_net_2d_demo.lua:203-287)")
    run(ap.parse_args(argv))


if __name__ == "__main__":
    main()
