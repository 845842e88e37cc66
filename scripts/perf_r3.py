"""Round-3 per-stage timing of the production 128^3 bench step (W=1 fixed).

Times each component in isolation with bench.py's fencing discipline.
Run on the real chip: python scripts/perf_r3.py [--res 128]
"""

import argparse
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
        _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:46s} {dt:8.3f} ms")
    return dt


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:4]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    args = ap.parse_args()

    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate, \
        apply_boundaries
    from fluidnet_tpu.train.train import init_train_state
    from fluidnet_tpu.ops.advect_fast import (advect_vel_scalar_fast,
                                              chebyshev_free_space)
    from fluidnet_tpu.ops.forces import add_buoyancy, vorticity_confinement
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.ops.divergence import velocity_divergence

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1)
    params = init_train_state(jax.random.PRNGKey(0), mconf).params

    R = args.res
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    key = jax.random.PRNGKey(1)
    u = 0.5 * jax.random.normal(key, (B, 3, Z, Y, X), jnp.float32)
    p = jnp.zeros((B, 1, Z, Y, X), jnp.float32)
    density = jax.random.uniform(key, (B, 1, Z, Y, X), jnp.float32)
    state = FluidState(u=u, p=p, flags=flags, density=density)
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, pp, uu, ff):
        return apply_model(pr, mconf, pp, uu, ff)

    step = jax.jit(lambda s, prm, b: simulate(s, mconf, model_fn, prm, b))
    t_full = timeit("full step (prod W=1)", step, state, params, bcs)

    free = jax.jit(lambda ff: chebyshev_free_space(ff, 2))(flags)
    _fence(free)
    timeit("chebyshev_free_space(2)",
           jax.jit(lambda ff: chebyshev_free_space(ff, 2)), flags)

    adv = jax.jit(lambda dd, uu, ff, fr: advect_vel_scalar_fast(
        0.1, dd, uu, ff, "maccormackOurs", False, 0.6, 1, free=fr))
    timeit("advect_vel_scalar_fast W=1 (given free)", adv,
           density, u, flags, free)

    proj = jax.jit(lambda prm, pp, uu, ff: apply_model(prm, mconf, pp, uu, ff))
    timeit("CNN projection (apply_model)", proj, params, p, u, flags)

    g = jnp.array([0.0, 1.0, 0.0]) * (-0.5 / 4.0 * 2.0)
    timeit("add_buoyancy", jax.jit(
        lambda uu, ff, dd: add_buoyancy(uu, ff, dd, g, 0.1)),
        u, flags, density)
    timeit("vorticity_confinement", jax.jit(
        lambda uu, ff: vorticity_confinement(uu, ff, 0.01)), u, flags)
    timeit("set_wall_bcs", jax.jit(set_wall_bcs), u, flags)
    timeit("velocity_divergence", jax.jit(velocity_divergence), u, flags)
    timeit("apply_boundaries x1", jax.jit(
        lambda s, b: apply_boundaries(s, b)), state, bcs)

    # host-dispatch estimate: trivial jit
    triv = jax.jit(lambda x: x + 1.0)
    timeit("trivial jit dispatch (1-elem)", triv, jnp.zeros(()))
    print(f"full step total: {t_full:.3f} ms")


if __name__ == "__main__":
    main()
