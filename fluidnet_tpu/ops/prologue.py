"""Fused projection prologue: everything between advection and the
ConvNet projection as ONE Pallas pass.

The unfused convnet step (sim.simulate, mirroring simulate.lua:201-272)
spends 4+ full-field XLA passes between the advection output and the
model input: apply_boundaries (u slab), buoyancy+gravity+vorticity
(already fused as forces_block), apply_boundaries again, then — inside
the model — setWallBcs and velocityDivergence. This op folds the u-slab
boundary application, the forces block, the second slab application,
setWallBcs (ops.boundary semantics incl. Stick, tfluids.cc:926-1002)
and the Manta-RHS divergence (tfluids.cc:1008-1066) into the existing
forces kernel's VMEM window: one HBM read of (u, flags, rho), one write
of (u'', div).

Differentiation: like forces_block/fused-epilogue, the custom VJP
replays the unfused XLA composition, so gradients are exactly those of
the composition the tests pin.
"""

import functools

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.grids import get_dx
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.forces import forces_block_xla


def fused_prologue_enabled() -> bool:
    """Call-time knob (FLUIDNET_FUSED_PROLOGUE, default ON): fuse the
    convnet projection's input stage (slab BCs + forces + setWallBcs +
    divergence) into one Pallas pass. Gradients always recompute the
    unfused composition via custom_vjp."""
    import os as _os
    return _os.environ.get("FLUIDNET_FUSED_PROLOGUE", "1") == "1"


def _slab(field, bc, inv):
    """apply_boundaries' slab update (sim.simulate._apply_bc)."""
    yb = bc.shape[3]
    if yb == field.shape[3]:
        return field * inv + bc
    slab = field[:, :, :, :yb] * inv + bc
    return jax.lax.dynamic_update_slice_in_dim(field, slab, 0, axis=3)


def prologue_xla(u, flags, density, buoy_g, grav_g, amp, dt,
                 u_bc=None, u_inv=None):
    """Unfused reference composition (the exact ops the fused kernel
    replaces, in simulate()'s order). Returns (u'', div)."""
    if u_bc is not None:
        u = _slab(u, u_bc, u_inv)
    u = forces_block_xla(u, flags, density, buoy_g, grav_g, amp, dt)
    if u_bc is not None:
        u = _slab(u, u_bc, u_inv)
    u = set_wall_bcs(u, flags)
    return u, velocity_divergence(u, flags)


def _scal7(buoy_g, grav_g, amp, dt, flags):
    dx = get_dx(flags)
    buoy_g = jnp.broadcast_to(jnp.asarray(buoy_g, jnp.float32), (3,))
    grav_g = jnp.broadcast_to(jnp.asarray(grav_g, jnp.float32), (3,))
    return jnp.concatenate([
        -buoy_g * (dt / dx), grav_g * (dt / dx),
        jnp.asarray(amp, jnp.float32).reshape(1)])


def _pro_run(u, flags, density, buoy_g, grav_g, amp, dt, u_bc, u_inv):
    from fluidnet_tpu.ops.pallas.forces_kernel import _pro_pallas_impl
    has_ubc = u_bc is not None
    if not has_ubc:
        u_bc = u_inv = jnp.zeros((1,), jnp.float32)  # ignored
    out = _pro_pallas_impl(u, flags, density[:, 0:1],
                           _scal7(buoy_g, grav_g, amp, dt, flags),
                           u_bc, u_inv, has_ubc)
    return out[:, 0:3], out[:, 3:4]


@jax.custom_vjp
def projection_prologue(u, flags, density, buoy_g, grav_g, amp, dt,
                        u_bc, u_inv):
    """Fused (slab BC -> forces -> slab BC -> setWallBcs -> divergence);
    matches prologue_xla exactly (tested). u_bc/u_inv: frozen slab masks
    of y-extent <= 8 (sim.Boundaries), or None."""
    return _pro_run(u, flags, density, buoy_g, grav_g, amp, dt, u_bc,
                    u_inv)


def _pro_fwd(u, flags, density, buoy_g, grav_g, amp, dt, u_bc, u_inv):
    out = _pro_run(u, flags, density, buoy_g, grav_g, amp, dt, u_bc,
                   u_inv)
    return out, (u, flags, density, buoy_g, grav_g, amp, dt, u_bc, u_inv)


def _pro_bwd(res, g):
    u, flags, density, buoy_g, grav_g, amp, dt, u_bc, u_inv = res
    _, vjp = jax.vjp(
        lambda uu, rr, bb, gg, aa: prologue_xla(
            uu, flags, rr, bb, gg, aa, dt, u_bc, u_inv),
        u, density, buoy_g, grav_g, jnp.asarray(amp, jnp.float32))
    gu, grho, gb, gg_, ga = vjp(g)
    return gu, None, grho, gb, gg_, ga, None, None, None


projection_prologue.defvjp(_pro_fwd, _pro_bwd)
