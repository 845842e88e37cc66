"""Per-stage device-time breakdown of the 128^3 headline step.

Times each component in isolation with the same fencing discipline as
bench.py (materialize a slice of the result). Run on the real chip:

    python scripts/perf_breakdown.py [--res 128]
"""

import argparse
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
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
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state
    from fluidnet_tpu.ops.advect_fast import (advect_vel_fast,
                                              advect_scalar_fast,
                                              chebyshev_free_space)
    from fluidnet_tpu.ops.forces import (add_buoyancy, vorticity_confinement)
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.ops.divergence import velocity_divergence

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs")
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

    # Full step
    step = jax.jit(lambda s, prm, b: simulate(s, mconf, model_fn, prm, b))
    timeit("full step (advect+forces+CNN)", step, state, params, bcs)

    # CNN projection only
    proj = jax.jit(lambda prm, pp, uu, ff: apply_model(prm, mconf, pp, uu, ff))
    timeit("CNN projection (apply_model)", proj, params, p, u, flags)

    # Advection W=1 / W=2
    for W in (1, 2):
        adv = jax.jit(lambda uu, ff, W=W: advect_vel_fast(
            0.1, uu, ff, "maccormackOurs", 0.6, W))
        timeit(f"advect_vel_fast W={W}", adv, u, flags)
        advs = jax.jit(lambda dd, uu, ff, W=W: advect_scalar_fast(
            0.1, dd, uu, ff, "maccormackOurs", False, 0.6, W))
        timeit(f"advect_scalar_fast W={W}", advs, density, u, flags)

    # chebyshev free space
    cfs = jax.jit(lambda ff: chebyshev_free_space(ff, 2))
    timeit("chebyshev_free_space(max_d=2)", cfs, flags)

    # forces
    g = jnp.array([0.0, 1.0, 0.0]) * (-0.5 / 4.0 * 2.0)
    timeit("add_buoyancy", jax.jit(
        lambda uu, ff, dd: add_buoyancy(uu, ff, dd, g, 0.1)),
        u, flags, density)
    timeit("vorticity_confinement", jax.jit(
        lambda uu, ff: vorticity_confinement(uu, ff, 0.01)), u, flags)
    timeit("set_wall_bcs", jax.jit(set_wall_bcs), u, flags)
    timeit("velocity_divergence", jax.jit(velocity_divergence), u, flags)


if __name__ == "__main__":
    main()
