"""Connected fluid components + per-component pressure mean removal.

The reference does this on the CPU with a stack-based flood fill
(generic/find_connected_fluid_components.cc:17-82) and syncs GPU tensors
across the PCIe bus (torch/tfluids/init.lua:747-766). The TPU-native
replacement keeps everything on-device:

  - connected_components: iterative min-label propagation (a 4/6-neighbor
    min-filter until fixpoint) — each sweep is one fused stencil, the
    fixpoint loop is a `lax.while_loop`.
  - normalize_pressure_mean: per-component mean via segment_sum over the
    converged labels, subtracted from fluid cells (the DC null space of
    each pressure component, generic/tfluids.cc:845-921).
"""

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid
from fluidnet_tpu.ops import stencil as st


def connected_components(flags, max_iter: int = 0):
    """Labels connected fluid components (4/6-connectivity).

    Returns int32 labels of shape (b, 1, z, y, x): fluid cells get the
    minimum linear index of their component; non-fluid cells get N (one
    past the last valid label, convenient for segment_sum drops).

    max_iter == 0 picks Z+Y+X sweeps — enough for convex components; the
    while_loop exits early at fixpoint, and pathological serpentine regions
    are bounded by the explicit cap.
    """
    b, _, Z, Y, X = flags.shape
    n = Z * Y * X
    is_3d = Z > 1
    if max_iter <= 0:
        max_iter = Z + Y + X
    fl = is_fluid(flags)

    lin = jnp.arange(n, dtype=jnp.int32).reshape(1, 1, Z, Y, X)
    lin = jnp.broadcast_to(lin, flags.shape)
    labels0 = jnp.where(fl, lin, n)

    big = jnp.int32(n)

    def sweep(lab):
        m = lab
        for sh in (st.xm, st.xp, st.ym, st.yp) + ((st.zm, st.zp) if is_3d else ()):
            m = jnp.minimum(m, sh(lab, fill=big))
        return jnp.where(fl, m, big)

    def cond(state):
        lab, prev, it = state
        return (it < max_iter) & jnp.any(lab != prev)

    def body(state):
        lab, _, it = state
        return sweep(lab), lab, it + 1

    first = sweep(labels0)
    lab, _, _ = jax.lax.while_loop(cond, body, (first, labels0, 1))
    return lab


def component_mean(x, labels, fluid_mask):
    """Per-component mean of x over fluid cells, scattered back to cells.

    labels: from connected_components. Non-fluid cells return 0.
    """
    b, _, Z, Y, X = x.shape
    n = Z * Y * X

    def one(xb, lb, fb):
        xf = jnp.where(fb, xb, 0.0).reshape(-1)
        lf = lb.reshape(-1)
        sums = jax.ops.segment_sum(xf, lf, num_segments=n + 1)
        cnts = jax.ops.segment_sum(fb.reshape(-1).astype(x.dtype), lf,
                                   num_segments=n + 1)
        means = sums / jnp.maximum(cnts, 1.0)
        return means[lf].reshape(xb.shape)

    return jax.vmap(one)(x, labels, fluid_mask)


def normalize_pressure_mean(p, flags, labels=None):
    """Subtracts the mean pressure of each connected fluid component.

    Mirrors tfluids.normalizePressureMean (init.lua:747-766 +
    generic/tfluids.cc:845-921) but stays on-device. Returns new p.
    """
    if labels is None:
        labels = connected_components(flags)
    fl = is_fluid(flags)
    mean = component_mean(p, labels, fl)
    return jnp.where(fl, p - mean, p)
