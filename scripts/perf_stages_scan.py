"""Clean per-stage device times at 128^3: scan each stage N times so the
~1.3 ms host-dispatch overhead amortizes away."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 50


def scan_time(name, step_fn, init):
    """step_fn: carry -> carry. Returns ms per iteration."""
    def body(c, _):
        return step_fn(c), None
    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=N)[0],
                donate_argnums=0)
    c = f(jax.tree.map(jnp.copy, init))
    leaf = jax.tree_util.tree_leaves(c)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:4]))
    t0 = time.perf_counter()
    REP = 4
    for _ in range(REP):
        c = f(c)
    leaf = jax.tree_util.tree_leaves(c)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:4]))
    dt = (time.perf_counter() - t0) / (REP * N) * 1e3
    print(f"{name:48s} {dt:8.3f} ms")
    return dt


def main():
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import (apply_boundaries,
                                           create_plume_bcs, simulate)
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
    R = 128
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    key = jax.random.PRNGKey(1)
    u = 0.1 * jax.random.normal(key, (B, 3, Z, Y, X), jnp.float32)
    p = jnp.zeros((B, 1, Z, Y, X), jnp.float32)
    density = jax.random.uniform(key, (B, 1, Z, Y, X), jnp.float32)
    state = FluidState(u=u, p=p, flags=flags, density=density)
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, pp, uu, ff):
        return apply_model(pr, mconf, pp, uu, ff)

    scan_time("full step", lambda s: simulate(s, mconf, model_fn, params,
                                              bcs), state)

    free = jax.jit(lambda ff: chebyshev_free_space(ff, 2))(flags)

    def adv(s):
        d_, u_ = advect_vel_scalar_fast(
            0.1, s.density, s.u, s.flags, "maccormackOurs", False, 0.6, 1,
            free=free)
        return s.replace(u=u_, density=d_)
    scan_time("advect fused (given free)", adv, state)

    def adv_cheby(s):
        fr = chebyshev_free_space(s.flags, 2)
        d_, u_ = advect_vel_scalar_fast(
            0.1, s.density, s.u, s.flags, "maccormackOurs", False, 0.6, 1,
            free=fr)
        return s.replace(u=u_, density=d_)
    scan_time("advect fused + cheby", adv_cheby, state)

    def proj(s):
        pp, uu = apply_model(params, mconf, s.p, s.u, s.flags)
        return s.replace(p=pp, u=uu)
    scan_time("CNN projection", proj, state)

    g = jnp.array([0.0, 1.0, 0.0]) * (-0.5 / 4.0 * 2.0)
    scan_time("buoyancy", lambda s: s.replace(
        u=add_buoyancy(s.u, s.flags, s.density, g, 0.1)), state)
    scan_time("vorticity_confinement", lambda s: s.replace(
        u=vorticity_confinement(s.u, s.flags, 0.01)), state)
    scan_time("set_wall_bcs", lambda s: s.replace(
        u=set_wall_bcs(s.u, s.flags)), state)
    scan_time("velocity_divergence (as p)", lambda s: s.replace(
        p=velocity_divergence(s.u, s.flags)), state)
    scan_time("apply_boundaries", lambda s: apply_boundaries(s, bcs), state)
    scan_time("noop clamp", lambda s: s.replace(
        u=jnp.clip(s.u, -1e6, 1e6)), state)


if __name__ == "__main__":
    main()
