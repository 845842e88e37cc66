"""2-D realtime-parity timer: scanned 128^2 plume steps (convnet
projection, the web demo's sim loop unthrottled). The reference's
realtime claim is 2-D on a GTX 1080/Titan (README.md:281-283; bundled
fprop profile 0.948 ms/sample at 128^2, myModel2D_mconf.txt:18) — this
records our equivalent full-step number for docs/STATUS.md.

Env knobs: PERF_RES (128), PERF_STEPS (60), PERF_MODEL
(data/models/m2d — falls back to random-init weights if absent).
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
    from fluidnet_tpu.utils.checkpoint import load_checkpoint

    R = int(os.environ.get("PERF_RES", 128))
    N = int(os.environ.get("PERF_STEPS", 60))
    path = os.environ.get("PERF_MODEL", "data/models_bundled/m2d")

    mconf = ModelConfig(is_3d=False, sim_method="convnet", dt=0.1,
                        buoyancy_scale=1.0, maccormack_strength=0.6,
                        advection_method="maccormackOurs")
    params = None
    if os.path.isdir(path):
        try:
            tstate = init_train_state(jax.random.PRNGKey(0), mconf)
            tstate, mconf, _ = load_checkpoint(path, tstate)
            mconf = mconf.replace(sim_method="convnet", dt=0.1)
            params = tstate.params
            print(f"loaded {path}", flush=True)
        except Exception as e:
            print(f"checkpoint load failed ({e}); random init", flush=True)
    if params is None:
        params = init_train_state(jax.random.PRNGKey(0), mconf).params

    B, Z, Y, X = 1, 1, R, R
    state = FluidState(
        u=jnp.zeros((B, 2, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=empty_domain((B, 1, Z, Y, X), False),
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f):
        return apply_model(pr, mconf, p, u, f)

    roll = jax.jit(lambda s, prm, b: rollout(s, mconf, N, model_fn,
                                             prm, b), donate_argnums=0)
    t0 = time.perf_counter()
    state = roll(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])
    print(f"compile+warmup {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    REPS = 8
    for _ in range(REPS):
        state = roll(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / (N * REPS)
    assert bool(np.isfinite(np.asarray(state.u)).all())
    print(f"2d res={R}: {dt * 1e3:.3f} ms/step = {1.0 / dt:.1f} steps/s",
          flush=True)


if __name__ == "__main__":
    main()
