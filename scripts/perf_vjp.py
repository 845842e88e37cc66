"""Forward+backward advection benchmark (training path, VERDICT r1 #7).

Measures value_and_grad through the full windowed advection (the Pallas
warp forward + its XLA transposed-scatter VJP) at 64^3, the 3-D training
resolution — the cost that gates long_term_grad_mode='full' 3-D training.

Run on the real chip:  python scripts/perf_vjp.py [--res 64]
"""

import argparse
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--window", type=int, default=1)
    args = ap.parse_args()

    from fluidnet_tpu.core.grids import empty_domain
    from fluidnet_tpu.ops.advect_fast import (advect_scalar_fast,
                                              advect_vel_fast)

    R, W = args.res, args.window
    B, Z, Y, X = 1, R, R, R
    key = jax.random.PRNGKey(0)
    flags = empty_domain((B, 1, Z, Y, X), True)
    u = 0.5 * jax.random.normal(key, (B, 3, Z, Y, X), jnp.float32)
    rho = jax.random.uniform(key, (B, 1, Z, Y, X), jnp.float32)

    fwd_v = jax.jit(lambda uu: advect_vel_fast(
        0.1, uu, flags, "maccormackOurs", 0.6, W))
    timeit(f"advect_vel fwd (W={W})", fwd_v, u)

    grad_v = jax.jit(jax.grad(lambda uu: jnp.sum(advect_vel_fast(
        0.1, uu, flags, "maccormackOurs", 0.6, W) ** 2)))
    timeit(f"advect_vel fwd+bwd (W={W})", grad_v, u)

    fwd_s = jax.jit(lambda dd: advect_scalar_fast(
        0.1, dd, u, flags, "maccormackOurs", False, 0.6, W))
    timeit(f"advect_scalar fwd (W={W})", fwd_s, rho)

    grad_s = jax.jit(jax.grad(lambda dd: jnp.sum(advect_scalar_fast(
        0.1, dd, u, flags, "maccormackOurs", False, 0.6, W) ** 2)))
    timeit(f"advect_scalar fwd+bwd (W={W})", grad_s, rho)

    # Raw adjoint-scatter comparison: Pallas kernel vs the XLA shifted-add
    # oracle, G=3/F=1 per-component positions (the MAC advection shape).
    from fluidnet_tpu.ops.pallas import warp as WP
    b, G, F = 1, 3, 1
    g = jax.random.normal(key, (b, G, F, Z, Y, X), jnp.float32)
    base = jnp.stack(jnp.meshgrid(
        jnp.arange(Z, dtype=jnp.float32),
        jnp.arange(Y, dtype=jnp.float32),
        jnp.arange(X, dtype=jnp.float32), indexing="ij"), 0) + 0.5
    disp = 0.9 * jax.random.normal(key, (3, b, G, Z, Y, X), jnp.float32)
    pz = jnp.clip(base[0] + disp[0], 0.0, Z - 1e-3)
    py = jnp.clip(base[1] + disp[1], 0.0, Y - 1e-3)
    px = jnp.clip(base[2] + disp[2], 0.0, X - 1e-3)
    f_pal = jax.jit(lambda gg: WP._warp_transpose_pallas(
        gg, px, py, pz, W, False))
    f_xla = jax.jit(lambda gg: WP._warp_transpose_xla(
        gg, px, py, pz, W, False, F, (Z, Y, X)))
    timeit(f"warp^T pallas  G=3 (W={W})", f_pal, g)
    timeit(f"warp^T xla     G=3 (W={W})", f_xla, g)


if __name__ == "__main__":
    main()
