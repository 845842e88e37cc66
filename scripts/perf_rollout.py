"""Time the on-device scanned rollout vs the per-step host loop at 128^3."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, rollout, simulate
    from fluidnet_tpu.train.train import init_train_state

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1)
    params = init_train_state(jax.random.PRNGKey(0), mconf).params
    R = 128
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags,
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f, **kw):
        return apply_model(pr, mconf, p, u, f, **kw)

    N = 30
    roll = jax.jit(lambda s, prm, b: rollout(
        s, mconf, N, model_fn, prm, b), donate_argnums=0)

    s = roll(state, params, bcs)
    _ = np.asarray(s.u[0, 0, 0, :4])
    t0 = time.perf_counter()
    REP = 4
    for _ in range(REP):
        s = roll(s, params, bcs)
    _ = np.asarray(s.u[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / (REP * N) * 1e3
    print(f"scanned rollout: {dt:.3f} ms/step = {1e3/dt:.1f} steps/s")
    assert bool(np.isfinite(np.asarray(s.u)).all())


if __name__ == "__main__":
    main()
