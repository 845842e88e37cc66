"""Experiments: 3-D small-channel conv formulations at 128^3 on TPU.

Variants:
  xla-ncdhw   current production path (conv_general_dilated, NCDHW, bf16)
  xla-ndhwc   channels-last layout
  z2d         k3 z-taps as 3 shifted 2-D convs on (B*Z) batch
  ovlgemm     x-overlapped im2col GEMM: A (m, c*9*18) @ B (c*9*18, 16*out)
  matmul-cal  calibration: dense (2^21, 256) @ (256, 128) bf16
"""

import time
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

R = 128
CIN, COUT = 8, 8


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:4]))


def timeit(name, fn, *args, n=20, useful_gflop=None):
    for _ in range(2):
        fence(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    extra = ""
    if useful_gflop:
        extra = f"  ({useful_gflop / dt:7.2f} TF/s useful)"
    print(f"{name:30s} {dt:8.3f} ms{extra}")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, CIN, R, R, R), jnp.float32)
    w = jax.random.normal(key, (COUT, CIN, 3, 3, 3), jnp.float32) * 0.1
    useful = 2 * CIN * 27 * COUT * R**3 / 1e9  # GFLOP

    # --- current path ---
    @jax.jit
    def conv_ncdhw(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW")).astype(jnp.float32)
    timeit("xla-ncdhw bf16", conv_ncdhw, x, w, useful_gflop=useful)

    # --- channels-last ---
    xl = jnp.transpose(x, (0, 2, 3, 4, 1))
    wl = jnp.transpose(w, (2, 3, 4, 1, 0))

    @jax.jit
    def conv_ndhwc(x, w):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(jnp.float32)
    timeit("xla-ndhwc bf16", conv_ndhwc, xl, wl, useful_gflop=useful)

    # --- z as batch, 3 shifted 2-D convs ---
    @jax.jit
    def conv_z2d(x, w):
        xb = x[0].transpose(1, 0, 2, 3).astype(jnp.bfloat16)  # (Z, C, Y, X)
        xp = jnp.pad(xb, ((1, 1), (0, 0), (0, 0), (0, 0)))
        acc = None
        for dz in range(3):
            part = jax.lax.conv_general_dilated(
                xp[dz:dz + R], w[:, :, dz].astype(jnp.bfloat16),
                (1, 1), [(1, 1)] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            acc = part if acc is None else acc + part
        return acc.astype(jnp.float32)
    timeit("z2d bf16", conv_z2d, x, w, useful_gflop=useful)

    # --- x-overlap GEMM ---
    T = 16          # outputs per x-block
    NBLK = R // T
    K = CIN * 9 * (T + 2)

    def build_B(w):
        # B[(c,dz,dy,xi), (t,co)] = w[co,c,dz,dy,dx=xi-1-t] for xi-1-t in -1..1
        B = np.zeros((CIN, 3, 3, T + 2, T, COUT), np.float32)
        wn = np.asarray(w)
        for t in range(T):
            for dx in (-1, 0, 1):
                xi = t + 1 + dx
                B[:, :, :, xi, t, :] = wn[:, :, :, :, dx + 1].transpose(
                    1, 2, 3, 0)
        return jnp.asarray(B.reshape(K, T * COUT), jnp.bfloat16)

    Bm = build_B(w)

    @jax.jit
    def conv_ovl(x, Bm):
        xb = x[0].astype(jnp.bfloat16)                      # (C, Z, Y, X)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (1, 1)))  # halo 1
        # windows along x: (C, Z+2, Y+2, NBLK, T+2)
        win = jnp.stack([xp[..., s:s + T + 2]
                         for s in range(0, R, T)], axis=-2)
        # taps over (dz, dy): 9 shifted views -> K dim
        taps = [win[:, dz:dz + R, dy:dy + R]
                for dz in range(3) for dy in range(3)]
        A = jnp.stack(taps, axis=1)          # (C, 9, Z, Y, NBLK, T+2)
        A = A.transpose(2, 3, 4, 0, 1, 5).reshape(R * R * NBLK, K)
        out = jnp.dot(A, Bm, preferred_element_type=jnp.float32)
        out = out.reshape(R, R, NBLK, T, COUT).reshape(R, R, R, COUT)
        return out
    timeit("ovlgemm bf16", conv_ovl, x, Bm, useful_gflop=useful)

    # --- calibration matmul ---
    M = 1 << 21
    a = jax.random.normal(key, (M, 256), jnp.bfloat16)
    b = jax.random.normal(key, (256, 128), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    timeit("matmul (2^21,256)@(256,128)", mm, a, b,
           useful_gflop=2 * M * 256 * 128 / 1e9)

    M2 = 1 << 17
    a2 = jax.random.normal(key, (M2, 1296), jnp.bfloat16)
    b2 = jax.random.normal(key, (1296, 128), jnp.bfloat16)
    timeit("matmul (2^17,1296)@(1296,128)", mm, a2, b2,
           useful_gflop=2 * M2 * 1296 * 128 / 1e9)

    # correctness of ovlgemm vs reference
    ref = conv_ncdhw(x, w)[0].transpose(1, 2, 3, 0)
    got = conv_ovl(x, Bm)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"ovlgemm max err vs xla conv: {err:.2e}")


if __name__ == "__main__":
    main()
