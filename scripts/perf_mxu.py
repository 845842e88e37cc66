"""MXU ceiling probe: what does this chip actually sustain, and what does
the FluidNet conv shape (tiny out_c=8) achieve in different formulations?

Marginal per-op device time via chained jits (the same fencing discipline
as bench.py). Run on the real chip:  python scripts/perf_mxu.py
"""

import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, n=30, warmup=3, flops=None):
    for _ in range(warmup):
        out = fn(*args)
    _fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fence(out)
    dt = (time.perf_counter() - t0) / n
    tf = (flops / dt / 1e12) if flops else 0.0
    print(f"{name:58s} {dt * 1e3:9.3f} ms  {tf:7.2f} TFLOP/s")
    return dt


def _fence(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:4]))


def main():
    key = jax.random.PRNGKey(0)

    # 1. Peak: big square bf16 matmul (done twice per call to amortize).
    for m in (4096, 8192):
        a = jax.random.normal(key, (m, m), jnp.bfloat16)
        b = jax.random.normal(key, (m, m), jnp.bfloat16)

        @jax.jit
        def mm(a, b):
            c = a @ b
            return c @ b
        timeit(f"bf16 matmul {m}x{m} (x2 chained)", mm, a, b,
               flops=2 * 2 * m ** 3)

    # 2. im2col shapes: N = 128^3 pixels, K = 216 (8ch * k3^3), out_c sweep.
    N = 128 ** 3
    K = 216
    x = jax.random.normal(key, (N, K), jnp.bfloat16)
    for oc in (8, 32, 128, 256):
        w = jax.random.normal(key, (K, oc), jnp.bfloat16)

        @jax.jit
        def mv(x, w):
            return x @ w
        timeit(f"im2col matmul ({N}x{K}) @ ({K}x{oc})", mv, x, w,
               flops=2 * N * K * oc)

    # 3. The actual conv layers, current z2d decomposition vs direct 3-D,
    #    at 128^3, 8->8 k3.
    B, C, R = 1, 8, 128
    xz = jax.random.normal(key, (B * R, C, R, R), jnp.bfloat16)
    w2 = jax.random.normal(key, (C, C, 3, 3), jnp.bfloat16)

    @jax.jit
    def conv2d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
    timeit("2-D conv (B*Z=128) 8->8 k3 @128^2 (1 of 3 z-taps)", conv2d,
           xz, w2, flops=2 * B * R ** 3 * C * C * 9)

    # channels-last variant
    xl = jax.random.normal(key, (B * R, R, R, C), jnp.bfloat16)
    wl = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)

    @jax.jit
    def conv2d_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timeit("2-D conv NHWC 8->8 k3 @128^2 (1 of 3 z-taps)", conv2d_nhwc,
           xl, wl, flops=2 * B * R ** 3 * C * C * 9)

    x3 = jax.random.normal(key, (B, C, R, R, R), jnp.bfloat16)
    w3 = jax.random.normal(key, (C, C, 3, 3, 3), jnp.bfloat16)

    @jax.jit
    def conv3d(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    timeit("3-D conv 8->8 k3^3 @128^3", conv3d, x3, w3,
           flops=2 * R ** 3 * C * C * 27)

    # 4. space-to-depth packed: 64ch at 64^3, k3 dense (8x the FLOPs of the
    #    original but out_c=64).
    xp = jax.random.normal(key, (B * 64, 64, 64, 64), jnp.bfloat16)
    wp = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16)

    @jax.jit
    def conv2d_packed(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    timeit("packed s2d conv NHWC 64->64 k3 @64^2x64 (1 of 3 z)",
           conv2d_packed, xp, wp, flops=2 * 64 ** 3 * 64 * 64 * 9)


if __name__ == "__main__":
    main()
