"""Shift/stencil helpers for 5-D (b, c, z, y, x) grids.

All reference kernels access neighbors via strided index math
(third_party/grid.h:63-77). Vectorized on TPU, a neighbor access
`a(i + off)` becomes a static slice + pad, which XLA fuses into the
surrounding elementwise work (no HBM round-trips).
"""

import jax.numpy as jnp

# Negative axis aliases: valid for both (b, c, z, y, x) and (b, z, y, x).
AX_Z, AX_Y, AX_X = -3, -2, -1


def shift(a, off: int, axis: int, fill=0):
    """out[..., i, ...] = a[..., i + off, ...], `fill` out of range.

    `off` and `axis` are static. E.g. shift(a, -1, AX_X) reads the -x
    neighbor: out(i,j,k) = a(i-1,j,k).
    """
    if off == 0:
        return a
    axis = axis % a.ndim
    n = a.shape[axis]
    lo = [slice(None)] * a.ndim
    if off > 0:
        lo[axis] = slice(off, n)
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (0, off)
    else:
        lo[axis] = slice(0, n + off)
        pad_width = [(0, 0)] * a.ndim
        pad_width[axis] = (-off, 0)
    sliced = a[tuple(lo)]
    if fill is False and a.dtype == jnp.bool_:
        fill_val = False
    else:
        fill_val = fill
    return jnp.pad(sliced, pad_width, mode="constant", constant_values=fill_val)


def xm(a, fill=0):
    """a(i-1, j, k); fill at i == 0."""
    return shift(a, -1, AX_X, fill)


def xp(a, fill=0):
    """a(i+1, j, k); fill at i == X-1."""
    return shift(a, 1, AX_X, fill)


def ym(a, fill=0):
    return shift(a, -1, AX_Y, fill)


def yp(a, fill=0):
    return shift(a, 1, AX_Y, fill)


def zm(a, fill=0):
    return shift(a, -1, AX_Z, fill)


def zp(a, fill=0):
    return shift(a, 1, AX_Z, fill)
