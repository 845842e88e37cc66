"""Finer perf decomposition: chains N copies of a stage inside ONE jit and
reports marginal per-copy time (removes the ~1.9 ms dispatch floor seen on
isolated calls through the tunneled backend)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def marginal(name, make_chain, n1=1, n2=3, reps=5):
    """time(chain of n2) - time(chain of n1) / (n2 - n1)."""
    ts = {}
    for n in (n1, n2):
        fn = jax.jit(make_chain(n))
        out = fn()
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        ts[n] = (time.perf_counter() - t0) / reps
    dt = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{name:52s} {dt * 1e3:8.3f} ms/copy")
    return dt


def main():
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import empty_domain, flags_to_occupancy
    from fluidnet_tpu.models.fluidnet import apply_model, _conv
    from fluidnet_tpu.train.train import init_train_state
    from fluidnet_tpu.ops.boundary import set_wall_bcs
    from fluidnet_tpu.ops.divergence import velocity_divergence
    from fluidnet_tpu.ops.pallas.warp import (warp_trilinear, warp_group,
                                              gather_cells)
    from fluidnet_tpu.ops.advect_fast import advect_vel_fast, advect_scalar_fast

    R = 128
    B, Z, Y, X = 1, R, R, R
    key = jax.random.PRNGKey(0)
    flags = empty_domain((B, 1, Z, Y, X), True)
    u = 0.5 * jax.random.normal(key, (B, 3, Z, Y, X), jnp.float32)
    p = jnp.zeros((B, 1, Z, Y, X), jnp.float32)
    rho = jax.random.uniform(key, (B, 1, Z, Y, X), jnp.float32)

    mconf = ModelConfig(is_3d=True, sim_method="convnet")
    params = init_train_state(jax.random.PRNGKey(0), mconf).params

    # Full apply_model chained
    def mk_model(n):
        def f():
            pp, uu = p, u
            for _ in range(n):
                pp, uu = apply_model(params, mconf, pp, uu, flags)
            return uu
        return f
    marginal("apply_model (full projection)", mk_model)

    # One z-fold conv stage 8->8 k3 (bf16)
    x8 = jax.random.normal(key, (B, 8, Z, Y, X), jnp.float32)
    w = {"w": jax.random.normal(key, (8, 8, 3, 3, 3), jnp.float32) * 0.1,
         "b": jnp.zeros((8,))}
    def mk_conv(n):
        def f():
            h = x8
            for _ in range(n):
                h = jax.nn.relu(_conv(h, w, 3))
            return h
        return f
    marginal("z-fold conv 8->8 k3 + relu", mk_conv)

    # physics wrap: set_wall_bcs + divergence
    def mk_phys(n):
        def f():
            uu = u
            for _ in range(n):
                uu = set_wall_bcs(uu, flags)
                uu = uu + velocity_divergence(uu, flags)  # keep a chain
            return uu
        return f
    marginal("set_wall_bcs + divergence", mk_phys)

    # warp_trilinear G=3 W=1 alone
    px = jnp.clip(jax.lax.broadcasted_iota(jnp.float32, (B, 3, Z, Y, X), 4)
                  + 0.5 + 0.3, 0.5, X - 0.5)
    py = jnp.clip(jax.lax.broadcasted_iota(jnp.float32, (B, 3, Z, Y, X), 3)
                  + 0.5 - 0.2, 0.5, Y - 0.5)
    pz = jnp.clip(jax.lax.broadcasted_iota(jnp.float32, (B, 3, Z, Y, X), 2)
                  + 0.5 + 0.1, 0.5, Z - 0.5)
    for W in (1, 2):
        def mk_warp(n, W=W):
            def f():
                uu = u
                for _ in range(n):
                    uu = warp_trilinear(uu, px, py, pz, window=W)
                return uu
            return f
        marginal(f"warp_trilinear G=3 W={W}", mk_warp)

    # grouped nearest gather (the clamp lookup) G=3 F=2 W=1
    packed = jax.random.normal(key, (B, 3, 2, Z, Y, X), jnp.float32)
    def mk_gather(n):
        def f():
            g = packed
            for _ in range(n):
                out = warp_group(g, px, py, pz, window=1, nearest=True)
                g = g.at[:, :, 0].set(out[:, :, 0])
            return g
        return f
    marginal("warp_group nearest G=3 F=2 W=1", mk_gather)

    # full advect_vel chained
    for W in (1, 2):
        def mk_adv(n, W=W):
            def f():
                uu = u
                for _ in range(n):
                    uu = advect_vel_fast(0.1, uu, flags, "maccormackOurs",
                                         0.6, W)
                return uu
            return f
        marginal(f"advect_vel_fast W={W}", mk_adv, n1=1, n2=3)
        def mk_advs(n, W=W):
            def f():
                dd = rho
                for _ in range(n):
                    dd = advect_scalar_fast(0.1, dd, u, flags,
                                            "maccormackOurs", False, 0.6, W)
                return dd
            return f
        marginal(f"advect_scalar_fast W={W}", mk_advs, n1=1, n2=3)


if __name__ == "__main__":
    main()
