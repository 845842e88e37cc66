"""Micro-attribution inside the fused advection at 128^3 (scanned)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

N = 50


def scan_time(name, step_fn, init):
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
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.core.celltype import is_fluid
    from fluidnet_tpu.ops.advect_fast import chebyshev_free_space
    from fluidnet_tpu.ops.pallas.mac_sweep import advect_sweep

    R = 128
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    key = jax.random.PRNGKey(1)
    u = 0.1 * jax.random.normal(key, (B, 3, Z, Y, X), jnp.float32)
    p = jnp.zeros((B, 1, Z, Y, X), jnp.float32)
    density = jax.random.uniform(key, (B, 1, Z, Y, X), jnp.float32)
    state = FluidState(u=u, p=p, flags=flags, density=density)
    free = jax.jit(lambda ff: chebyshev_free_space(ff, 2))(flags)
    m = is_fluid(flags).astype(jnp.float32)

    def fwd_only(s):
        o1 = advect_sweep(s.u, s.density, m, None, None, free, -0.1, 1,
                          True, True, True)
        return s.replace(u=o1["u_w"], density=o1["s_plain"])
    scan_time("fwd sweep only", fwd_only, state)

    def both(s):
        o1 = advect_sweep(s.u, s.density, m, None, None, free, -0.1, 1,
                          True, True, True)
        o2 = advect_sweep(s.u, None, m, o1["u_w"], o1["s_plain"], free,
                          0.1, 1, True, True, True)
        return s.replace(u=o2["u_w"], density=o2["s_plain"])
    scan_time("fwd+bwd sweeps only", both, state)


if __name__ == "__main__":
    main()
