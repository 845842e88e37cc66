"""Body forces: buoyancy, gravity, vorticity confinement.

Vectorized ports of Main_addBuoyancy (tfluids.cc:1162-1233),
Main_addGravity (:1239-1306) and Main_vorticityConfinement (:1312-1458)
from torch/tfluids/third_party/tfluids.cc. Pure functions; the reference
mutates U in place.
"""

import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_empty, is_fluid
from fluidnet_tpu.core.grids import border_mask, check_shapes, get_dx
from fluidnet_tpu.ops import stencil as st

_VEC3_EPS = 1e-6  # vec3 kEpsilon (generic/vec3.cu.h:21).


def _gcomp(gravity, c):
    """Component c of a gravity vector that is either (3,) — the reference
    semantics (init.lua:463-464) — or (B, 3) for per-sample force scales
    (used by batched scene generation). Returns a scalar or (B, 1, 1, 1)
    so it broadcasts against (B, z, y, x) fields."""
    if gravity.ndim == 1:
        return gravity[c]
    return gravity[:, c].reshape(-1, 1, 1, 1)


def _samp(strength, ndim=4):
    """A confinement strength that is a scalar or (B,); reshaped to
    broadcast against an (B, z, y, x) field."""
    s = jnp.asarray(strength)
    if s.ndim == 0:
        return s
    return s.reshape(s.shape + (1,) * (ndim - 1))


def add_buoyancy(u, flags, density, gravity, dt):
    """U += 0.5 * strength * (rho(i) + rho(i-1)) on fluid-fluid faces.

    strength = -gravity * dt / dx (tfluids.cc:1190-1191). `gravity` is a
    3-vector even in 2-D (init.lua:463-464), or (B, 3) for per-sample
    scales.
    """
    is_3d = check_shapes(u, flags, density)
    gravity = jnp.asarray(gravity, dtype=u.dtype)
    dx = get_dx(flags)
    strength = -gravity * (dt / dx)

    fl = is_fluid(flags)[:, 0]
    interior = ~border_mask(flags.shape, is_3d, bnd=1)[:, 0]
    rho = density[:, 0]

    def face(uc, s, fl_m, rho_m):
        add = 0.5 * s * (rho + rho_m)
        return jnp.where(fl & fl_m & interior, uc + add, uc)

    ux = face(u[:, 0], _gcomp(strength, 0), st.xm(fl, False), st.xm(rho))
    uy = face(u[:, 1], _gcomp(strength, 1), st.ym(fl, False), st.ym(rho))
    if is_3d:
        uz = face(u[:, 2], _gcomp(strength, 2), st.zm(fl, False),
                  st.zm(rho))
        return jnp.stack([ux, uy, uz], axis=1)
    return jnp.stack([ux, uy], axis=1)


def add_gravity(u, flags, gravity, dt):
    """U += gravity * dt / dx on faces between fluid/empty cells.

    Face rule (tfluids.cc:1280-1300): current cell must be fluid or empty;
    add force.x if fluid(i-1) or (cur fluid and empty(i-1)).
    """
    is_3d = check_shapes(u, flags)
    gravity = jnp.asarray(gravity, dtype=u.dtype)
    force = gravity * (dt / get_dx(flags))

    fl = is_fluid(flags)[:, 0]
    em = is_empty(flags)[:, 0]
    cur = (fl | em) & ~border_mask(flags.shape, is_3d, bnd=1)[:, 0]

    def face(uc, f, fl_m, em_m):
        m = cur & (fl_m | (fl & em_m))
        return jnp.where(m, uc + f, uc)

    ux = face(u[:, 0], _gcomp(force, 0), st.xm(fl, False), st.xm(em, False))
    uy = face(u[:, 1], _gcomp(force, 1), st.ym(fl, False), st.ym(em, False))
    if is_3d:
        uz = face(u[:, 2], _gcomp(force, 2), st.zm(fl, False),
                  st.zm(em, False))
        return jnp.stack([ux, uy, uz], axis=1)
    return jnp.stack([ux, uy], axis=1)


def get_centered(u, is_3d):
    """Cell-centered velocity from MAC faces (grid.cc:346-356).

    Returns (b, 3, z, y, x); zero on the 1-cell border like the reference's
    first vorticity pass (tfluids.cc:1374-1388). The reference's
    getCentered is not border-safe so callers always zero the border.
    """
    cx = 0.5 * (u[:, 0] + st.xp(u[:, 0]))
    cy = 0.5 * (u[:, 1] + st.yp(u[:, 1]))
    if is_3d:
        cz = 0.5 * (u[:, 2] + st.zp(u[:, 2]))
    else:
        cz = jnp.zeros_like(cx)
    c = jnp.stack([cx, cy, cz], axis=1)
    interior = ~border_mask(u.shape, is_3d, bnd=1)
    return jnp.where(interior, c, jnp.zeros_like(c))


def _curl(cent, is_3d):
    """Central-difference curl of a centered vector field (grid.cc:497-515).

    2-D returns the scalar curl in the z component. Not valid on the border
    (callers zero it).
    """
    x, y, z = cent[:, 0], cent[:, 1], cent[:, 2]
    cz = 0.5 * ((st.xp(y) - st.xm(y)) - (st.yp(x) - st.ym(x)))
    if is_3d:
        cx = 0.5 * ((st.yp(z) - st.ym(z)) - (st.zp(y) - st.zm(y)))
        cy = 0.5 * ((st.zp(x) - st.zm(x)) - (st.xp(z) - st.xm(z)))
    else:
        cx = jnp.zeros_like(cz)
        cy = jnp.zeros_like(cz)
    return jnp.stack([cx, cy, cz], axis=1)


def vorticity_confinement(u, flags, strength):
    """Adds the vorticity-confinement force (tfluids.cc:1312-1458).

    3-D runs the fused Pallas kernel (one VMEM-resident pass instead of
    the 4-stage XLA stencil chain); 2-D, per-sample (B,) strengths and
    the kernel's own VJP use the XLA formulation below."""
    if check_shapes(u, flags) and jnp.ndim(strength) == 0:
        from fluidnet_tpu.ops.pallas.forces_kernel import \
            vorticity_confinement_pallas
        return vorticity_confinement_pallas(u, flags, strength)
    return vorticity_confinement_xla(u, flags, strength)


def vorticity_confinement_xla(u, flags, strength):
    """XLA reference formulation, 4 passes like the reference:

    centered vel -> curl + |curl| -> force = strength * (grad_hat|w| x w)
    -> face-wise AddForceField apply (tfluids.cc:1312-1458).
    """
    is_3d = check_shapes(u, flags)
    interior5 = ~border_mask(flags.shape, is_3d, bnd=1)
    interior = interior5[:, 0]

    cent = get_centered(u, is_3d)

    curl = _curl(cent, is_3d)
    curl = jnp.where(interior5, curl, jnp.zeros_like(curl))
    norm_sq = jnp.sum(curl * curl, axis=1)
    # vec3::norm returns 0 below kEpsilon (vec3.cu.h:119-127). The inner
    # where keeps sqrt off 0 so the cotangent of the untaken branch stays
    # finite (d sqrt(0) = inf; 0 * inf = NaN under full-rollout grads).
    nz = norm_sq > _VEC3_EPS
    curl_norm = jnp.where(nz, jnp.sqrt(jnp.where(nz, norm_sq, 1.0)), 0.0)
    curl_norm = jnp.where(interior, curl_norm, 0.0)

    gx = 0.5 * (st.xp(curl_norm) - st.xm(curl_norm))
    gy = 0.5 * (st.yp(curl_norm) - st.ym(curl_norm))
    if is_3d:
        gz = 0.5 * (st.zp(curl_norm) - st.zm(curl_norm))
    else:
        gz = jnp.zeros_like(gx)
    g_sq = gx * gx + gy * gy + gz * gz
    gz_ok = g_sq > _VEC3_EPS
    g_norm = jnp.where(gz_ok, jnp.sqrt(jnp.where(gz_ok, g_sq, 1.0)), 0.0)
    safe = g_norm > _VEC3_EPS
    inv = jnp.where(safe, 1.0 / jnp.where(safe, g_norm, 1.0), 0.0)
    gx, gy, gz = gx * inv, gy * inv, gz * inv

    # force = cross(grad_hat, curl) * strength (scalar or per-sample (B,)).
    s = _samp(strength)
    fx = (gy * curl[:, 2] - gz * curl[:, 1]) * s
    fy = (gz * curl[:, 0] - gx * curl[:, 2]) * s
    fz = (gx * curl[:, 1] - gy * curl[:, 0]) * s
    force = jnp.stack([fx, fy, fz], axis=1)
    force = jnp.where(interior5, force, jnp.zeros_like(force))

    return _add_force_field(u, flags, force, is_3d)


def forces_block_xla(u, flags, density, buoy_g, grav_g, amp, dt):
    """The simulate() forces block as one composition: buoyancy ->
    gravity -> vorticity confinement (simulate.lua:216-239 ordering).

    `buoy_g`/`grav_g` are the scaled gravity 3-vectors simulate passes to
    add_buoyancy/add_gravity; `amp` the confinement strength (already
    dx-scaled). Zero scalars are exact no-ops, so one formulation serves
    every on/off combination without recompiling (the training loop's
    traced force randomization, run_epoch.lua:133-158)."""
    u = add_buoyancy(u, flags, density, buoy_g, dt)
    u = add_gravity(u, flags, grav_g, dt)
    u = vorticity_confinement_xla(u, flags, amp)
    return u


def forces_block(u, flags, density, buoy_g, grav_g, amp, dt):
    """Fused forces block: the 3-D path runs one Pallas kernel (buoyancy +
    gravity + the 4-stage confinement chain in a single VMEM-resident
    pass); 2-D, per-sample force scales ((B, 3) vectors / (B,) amp) and
    the VJP use the XLA composition."""
    batched = (jnp.ndim(buoy_g) > 1 or jnp.ndim(grav_g) > 1 or
               jnp.ndim(amp) > 0)
    if check_shapes(u, flags, density) and not batched:
        from fluidnet_tpu.ops.pallas.forces_kernel import \
            forces_block_pallas
        return forces_block_pallas(u, flags, density, buoy_g, grav_g,
                                   amp, dt)
    return forces_block_xla(u, flags, density, buoy_g, grav_g, amp, dt)


def _add_force_field(u, flags, force, is_3d):
    """AddForceField (tfluids.cc:1312-1339): face-averaged force apply with
    the same fluid/empty gating as add_gravity, interior only."""
    fl = is_fluid(flags)[:, 0]
    em = is_empty(flags)[:, 0]
    cur = (fl | em) & ~border_mask(flags.shape, is_3d, bnd=1)[:, 0]

    def face(uc, fc, fl_m, em_m, f_m):
        m = cur & (fl_m | (fl & em_m))
        return jnp.where(m, uc + 0.5 * (f_m + fc), uc)

    ux = face(u[:, 0], force[:, 0], st.xm(fl, False), st.xm(em, False),
              st.xm(force[:, 0]))
    uy = face(u[:, 1], force[:, 1], st.ym(fl, False), st.ym(em, False),
              st.ym(force[:, 1]))
    if is_3d:
        uz = face(u[:, 2], force[:, 2], st.zm(fl, False), st.zm(em, False),
                  st.zm(force[:, 2]))
        return jnp.stack([ux, uy, uz], axis=1)
    return jnp.stack([ux, uy], axis=1)
