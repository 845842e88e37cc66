"""3-D smoke simulation entry point.

Equivalent of `qlua fluid_net_3d_sim.lua` (torch/fluid_net_3d_sim.lua):
a res^3 buoyant plume, optional voxelized obstacle model, stepped with the
ConvNet / Jacobi / PCG projection; density volumes exported as .vbox for
the Blender pipeline; prints ms/frame and projection-ms/frame at exit
(fluid_net_3d_sim.lua:300-304).

  python -m fluidnet_tpu.cli.sim3d --res 128 --num_frames 768 \\
      --sim_method convnet --model data/models/my3d --voxel_model none
"""

import argparse
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.io.binvox import load_binvox
from fluidnet_tpu.io.vbox import VboxWriter
from fluidnet_tpu.io.voxel_utils import (flip_diagonal, pad_voxels_to_dims,
                                         place_voxels_in_flags)
from fluidnet_tpu.models.fluidnet import apply_model
from fluidnet_tpu.sim.simulate import create_plume_bcs, rollout, simulate
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf


def build_scene(res, voxel_model=None):
    """res^3 empty domain + plume + optional voxel obstacle
    (fluid_net_3d_sim.lua:62-152)."""
    B, Z, Y, X = 1, res, res, res
    flags = empty_domain((B, 1, Z, Y, X), True)
    if voxel_model:
        vox = load_binvox(voxel_model)["data"]     # (x, y, z)
        vox = flip_diagonal(vox, 1)                # like loadVoxelModel flips
        vox = pad_voxels_to_dims(X, Y, Z, vox)
        flags = jnp.asarray(place_voxels_in_flags(np.asarray(flags), vox))
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags,
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6 * (res / 128),
                           rad=0.15)
    return state, bcs


def run(args):
    res = args.res
    # Scene knobs mirror fluid_net_3d_sim.lua:73-87.
    if args.model:
        mconf = load_mconf(args.model)
        assert mconf.is_3d, "model must be 3-D"
        mconf = mconf.replace(sim_method="convnet")
        tmpl = init_train_state(jax.random.PRNGKey(0), mconf)
        tstate, mconf, _ = load_checkpoint(args.model, tmpl)
        params = tstate.params
    else:
        mconf = ModelConfig(is_3d=True, sim_method=args.sim_method)
        params = None
        if args.sim_method == "convnet":
            tstate = init_train_state(jax.random.PRNGKey(0), mconf)
            params = tstate.params  # random weights: full-path smoke test
    mconf = mconf.replace(
        dt=0.1, buoyancy_scale=2.0 * (res / 128.0),
        vorticity_confinement_amp=3.0, maccormack_strength=0.6,
        advection_method="maccormackOurs", max_iter=args.max_iter,
        pcg_tol=args.pcg_tol, polish_iters=args.polish_iters)

    state, bcs = build_scene(res, args.voxel_model or None)

    def model_fn(pr, p, u, f, **kw):
        return apply_model(pr, mconf, p, u, f, **kw)

    # params/bcs as jit args (large closed-over arrays become XLA
    # constants and destroy compile/run time).
    mf = model_fn if mconf.sim_method == "convnet" else None
    step = jax.jit(lambda s, prm, b: simulate(s, mconf, mf, prm, b))
    # Chunked scanned rollout (sim.rollout): `decimation` steps per
    # device dispatch, materializing only the frame that gets written —
    # the vbox cadence of fluid_net_3d_sim.lua:266-291 without the
    # ~1.3 ms/step host round trip.
    chunk = jax.jit(lambda s, prm, b: rollout(s, mconf, args.decimation,
                                              mf, prm, b))

    writers = {}
    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        # Frames are written for i in [1, num_frames) with i % decimation
        # == 0 (the reference saves every 3rd frame,
        # fluid_net_3d_sim.lua:286-290).
        writers["density"] = VboxWriter(
            os.path.join(args.out_dir,
                         f"density_output_dt{mconf.dt}.vbox"),
            res, res, res, (args.num_frames - 1) // args.decimation)
        with VboxWriter(os.path.join(args.out_dir, "geom_output.vbox"),
                        res, res, res, 1) as gw:
            occ = (np.asarray(state.flags)[0, 0] & 2) > 0
            gw.write_frame(occ.astype(np.float32))

    # Compile + first step outside timing.
    state = step(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])      # materialization fence
    t0 = time.perf_counter()
    # Steps i = 1..num_frames-1; a frame is written after every
    # `decimation`-step chunk (step index i % decimation == 0).
    n_steps = args.num_frames - 1
    n_chunks, rem = divmod(n_steps, args.decimation)
    for _ in range(n_chunks):
        state = chunk(state, params, bcs)
        if "density" in writers:
            writers["density"].write_frame(np.asarray(state.density)[0, 0])
    for _ in range(rem):
        state = step(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])
    dt_frame = (time.perf_counter() - t0) / max(n_steps, 1)
    for w in writers.values():
        w.close()
    print(f"Simulation done: {dt_frame * 1e3:.3f} ms/frame at {res}^3 "
          f"({mconf.sim_method} projection)")
    return dt_frame


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--num_frames", type=int, default=768)
    ap.add_argument("--decimation", type=int, default=3)
    ap.add_argument("--sim_method", default="convnet",
                    choices=["convnet", "jacobi", "pcg"])
    ap.add_argument("--max_iter", type=int, default=34)
    ap.add_argument("--pcg_tol", type=float, default=1e-4,
                    help="pcg residual tolerance (pTol, default_conf.lua)")
    ap.add_argument("--polish_iters", type=int, default=0,
                    help="hybrid Jacobi polish sweeps after the convnet "
                    "projection (ModelConfig.polish_iters)")
    ap.add_argument("--model", default="",
                    help="checkpoint dir of a trained 3-D model")
    ap.add_argument("--voxel_model", default="",
                    help=".binvox obstacle file (e.g. bunny)")
    ap.add_argument("--out_dir", default="data/output")
    run(ap.parse_args(argv))


if __name__ == "__main__":
    main()
