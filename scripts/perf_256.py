"""256^3 single-chip stretch measurement (SURVEY.md §7 stage 7).

HBM budget at 256^3 f32 (67 MB per scalar field):
  state: u(3) + p + flags + density            = 6 fields  ~0.4 GB
  step peak (MacCormack): src+mn+mx pack per MAC component (9), fwd/bwd
  (6), positions (9), weights ephemeral, CNN activations (<= 8ch bf16
  ~0.5 GB) — comfortably inside the 16 GB of a v5e chip.

Run on the real chip:  python scripts/perf_256.py [--res 256] [--steps 10]
"""

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs")
    params = init_train_state(jax.random.PRNGKey(0), mconf).params

    R = args.res
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags,
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f):
        return apply_model(pr, mconf, p, u, f)

    step = jax.jit(lambda s, prm, b: simulate(s, mconf, model_fn, prm, b))

    t0 = time.perf_counter()
    state = step(state, params, bcs)
    np.asarray(jax.device_get(state.u.ravel()[:4]))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state = step(state, params, bcs)
    np.asarray(jax.device_get(state.u.ravel()[:4]))
    dt_step = (time.perf_counter() - t0) / args.steps
    cells = R ** 3
    print(f"{R}^3 step: {dt_step * 1e3:.1f} ms = {1.0 / dt_step:.2f} "
          f"steps/s ({cells / dt_step / 1e9:.2f} Gcell/s)")
    assert np.all(np.isfinite(np.asarray(state.u[0, :, R // 2, R // 2,
                                                 R // 2])))


if __name__ == "__main__":
    main()
