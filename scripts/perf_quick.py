"""Minimal headline-config timer: scanned 128^3 smoke steps, no
checkpoints, no per-step host loop. Knobs via env:
  FLUIDNET_SWEEP_BF16, FLUIDNET_SLICES_PER_PROGRAM, PERF_RES, PERF_STEPS.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fluidnet_tpu.utils import compile_cache
    compile_cache.enable()
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, rollout
    from fluidnet_tpu.train.train import init_train_state

    R = int(os.environ.get("PERF_RES", 128))
    N = int(os.environ.get("PERF_STEPS", 30))
    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1)
    params = init_train_state(jax.random.PRNGKey(0), mconf).params
    B, Z, Y, X = 1, R, R, R
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=empty_domain((B, 1, Z, Y, X), True),
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f, **kw):
        return apply_model(pr, mconf, p, u, f, **kw)

    roll = jax.jit(lambda s, prm, b: rollout(
        s, mconf, N, model_fn, prm, b), donate_argnums=0)
    t0 = time.perf_counter()
    state = roll(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    REPS = 4
    for _ in range(REPS):
        state = roll(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / (N * REPS)
    assert bool(np.isfinite(np.asarray(state.u[0, :, ::16, ::16, ::16])).all())
    print(f"bf16={os.environ.get('FLUIDNET_SWEEP_BF16', '0')} "
          f"S={os.environ.get('FLUIDNET_SLICES_PER_PROGRAM', '4')} "
          f"res={R}: {dt * 1e3:.3f} ms/step = {1.0 / dt:.1f} steps/s",
          flush=True)


if __name__ == "__main__":
    main()
