"""The top-level time-integration loop: advect -> forces -> project.

Functional port of tfluids.simulate (torch/lib/simulate.lua:175-327):
one call advances the state a single timestep using the ConvNet, Jacobi or
PCG pressure projection. Pure: takes and returns a FluidState; jittable
with a static ModelConfig (sim-method switches are compile-time).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, get_dx
from fluidnet_tpu.ops.advect import advect_scalar, advect_vel
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity,
                                     forces_block, vorticity_confinement)
from fluidnet_tpu.ops.velocity_update import velocity_update
from fluidnet_tpu.solvers.cg import solve_pcg
from fluidnet_tpu.solvers.jacobi import solve_jacobi

U_CLAMP = 1e6  # blow-up containment (simulate.lua:323-326)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Boundaries:
    """Frozen boundary-condition masks (simulate.lua:125-160 setConstVals).

    value' = value * inv_mask + bc. All fields optional.

    A bc/mask pair whose y-extent is smaller than the field's applies to
    the leading y-rows only (an in-place dynamic-update-slice instead of a
    full-field multiply-add): the plume inflow touches 4 rows of the
    domain, so full-size masks would spend 3 full-field HBM passes per
    step on a 4-row update.
    """
    u_bc: Optional[jax.Array] = None
    u_bc_inv_mask: Optional[jax.Array] = None
    p_bc: Optional[jax.Array] = None
    p_bc_inv_mask: Optional[jax.Array] = None
    density_bc: Optional[jax.Array] = None
    density_bc_inv_mask: Optional[jax.Array] = None


def _apply_bc(field, bc, inv):
    yb = bc.shape[3]
    if yb == field.shape[3]:
        return field * inv + bc
    slab = field[:, :, :, :yb] * inv + bc
    return jax.lax.dynamic_update_slice_in_dim(field, slab, 0, axis=3)


def apply_boundaries(state: FluidState, bcs: Optional[Boundaries]):
    if bcs is None:
        return state
    u, p, density = state.u, state.p, state.density
    if bcs.u_bc is not None:
        u = _apply_bc(u, bcs.u_bc, bcs.u_bc_inv_mask)
    if bcs.p_bc is not None:
        p = _apply_bc(p, bcs.p_bc, bcs.p_bc_inv_mask)
    if bcs.density_bc is not None and density is not None:
        density = _apply_bc(density, bcs.density_bc,
                            bcs.density_bc_inv_mask)
    return state.replace(u=u, p=p, density=density)


def _get_gravity(mconf: ModelConfig, dtype):
    if mconf.gravity is None:
        return jnp.array([0.0, 1.0, 0.0], dtype)  # simulate.lua:204-213
    return jnp.asarray(mconf.gravity, dtype)


def _scale_gravity(g_vec, scale):
    """g_vec * scale where scale is a scalar or a per-sample (B,) vector
    (batched scene generation); the latter yields a (B, 3) gravity that
    the XLA force ops broadcast per sample."""
    scale = jnp.asarray(scale)
    if scale.ndim == 0:
        return g_vec * scale
    return g_vec[None, :] * scale[:, None]


def simulate(state: FluidState, mconf: ModelConfig,
             model_fn: Optional[Callable] = None,
             params=None,
             bcs: Optional[Boundaries] = None,
             output_div: bool = False,
             dt: Optional[jax.Array] = None,
             gravity: Optional[jax.Array] = None,
             buoyancy_scale: Optional[jax.Array] = None,
             gravity_scale: Optional[jax.Array] = None,
             vorticity_amp: Optional[jax.Array] = None) -> FluidState:
    """One simulation step. `model_fn(params, p, u, flags) -> (p, u)` is the
    learned projection (required when mconf.sim_method == 'convnet').

    `dt` optionally overrides mconf.dt with a traced value (used by the
    training loop's random time-scale perturbation, run_epoch.lua:243-249).
    `gravity`/`buoyancy_scale`/`gravity_scale`/`vorticity_amp` optionally
    override the static mconf values with traced ones — the training loop's
    per-batch force randomization (run_epoch.lua:133-158) then needs no
    recompilation (a zero traced scale is a no-op in the same graph).
    """
    if dt is None:
        dt = mconf.dt
    u, p, flags, density = state.u, state.p, state.flags, state.density
    dx = get_dx(flags)

    # 1.+2. Advection: scalars per channel, then velocity self-advection
    #       (must be last, simulate.lua:183-199).
    def _advect_all(window):
        def fn(operands):
            u_, density_ = operands
            free_space = None
            if window and mconf.advection_method.endswith("Ours"):
                # Free-space field for the 'Ours' trace clamp: flags are
                # constant within a step, computed once per advect block.
                from fluidnet_tpu.ops.advect_fast import chebyshev_free_space
                free_space = chebyshev_free_space(flags, window + 1)
            d_ = density_
            is_3d = flags.shape[2] > 1
            # Fused combined path: density + all three MAC components in
            # one kernel per sweep (positions in-kernel).
            if (window and is_3d and density_ is not None
                    and density_.shape[1] == 1
                    and mconf.advection_method != "maccormack"):
                from fluidnet_tpu.ops.advect_fast import \
                    advect_vel_scalar_fast
                d_, u2 = advect_vel_scalar_fast(
                    dt, density_, u_, flags, mconf.advection_method,
                    False, mconf.maccormack_strength, window,
                    free=free_space)
                return u2, d_
            if density_ is not None:
                chans = [advect_scalar(
                    dt, density_[:, c:c + 1], u_, flags,
                    method=mconf.advection_method,
                    sample_outside_fluid=False,
                    maccormack_strength=mconf.maccormack_strength,
                    window=window, free_space=free_space)
                    for c in range(density_.shape[1])]
                d_ = jnp.concatenate(chans, axis=1)
            u2 = advect_vel(dt, u_, flags, method=mconf.advection_method,
                            maccormack_strength=mconf.maccormack_strength,
                            window=window, free_space=free_space)
            return u2, d_
        return fn

    if (mconf.adaptive_window and mconf.advection_window
            and mconf.advection_window > 1):
        # The window only LIMITS displacements, so whenever the per-step
        # CFL number fits the small window, the W=1 kernel is exact and
        # ~(2W+2)^3/64 x cheaper. Both branches compile; one runs.
        cfl = jnp.max(jnp.abs(u)) * dt
        u, density = jax.lax.cond(
            cfl <= 1.0 - 1e-3,
            _advect_all(1), _advect_all(mconf.advection_window),
            (u, density))
    else:
        u, density = _advect_all(mconf.advection_window)((u, density))

    # Forces configuration (resolved before the BC step so the fused
    # projection prologue can be chosen; simulate.lua:216-239).
    g_vec = gravity if gravity is not None else _get_gravity(mconf, u.dtype)
    b_scale = buoyancy_scale if buoyancy_scale is not None \
        else mconf.buoyancy_scale
    g_scale = gravity_scale if gravity_scale is not None \
        else mconf.gravity_scale
    v_amp = vorticity_amp if vorticity_amp is not None \
        else mconf.vorticity_confinement_amp
    has_buoy = density is not None and (buoyancy_scale is not None or
                                        mconf.buoyancy_scale > 0)
    has_grav = gravity_scale is not None or mconf.gravity_scale > 0
    has_vc = vorticity_amp is not None or \
        mconf.vorticity_confinement_amp > 0
    is_3d = flags.shape[2] > 1
    batched_scales = (jnp.ndim(b_scale) > 1 or jnp.ndim(g_scale) > 1 or
                      jnp.ndim(g_vec) > 1 or jnp.ndim(v_amp) > 0)

    # Fused projection prologue (ops.prologue): for the 3-D convnet
    # path, the u-slab BCs + forces block + setWallBcs + divergence run
    # as ONE Pallas pass; p/density slabs stay in XLA (cheap 4-row
    # updates). Value-exact vs the unfused composition (tested);
    # gradients recompute the unfused chain via custom_vjp.
    from fluidnet_tpu.ops.prologue import (fused_prologue_enabled,
                                           projection_prologue)
    use_pro = (is_3d and not output_div and mconf.sim_method == "convnet"
               and density is not None and not batched_scales
               and fused_prologue_enabled()
               and (bcs is None or bcs.u_bc is None
                    or bcs.u_bc.shape[3] <= 8))

    # 3. External boundary conditions (simulate.lua:201-202).
    bcs_nou = bcs
    if use_pro and bcs is not None:
        bcs_nou = dataclasses.replace(bcs, u_bc=None, u_bc_inv_mask=None)
    state = apply_boundaries(
        state.replace(u=u, p=p, density=density), bcs_nou)
    u, p, density = state.u, state.p, state.density

    # 4.-6. Forces: buoyancy (-(dx/4)*buoyancyScale, first density
    # channel), gravity, vorticity confinement. 3-D runs all three as
    # ONE fused Pallas pass (forces_block); zero scalars are exact
    # no-ops in the same graph.
    div_pre = None
    if use_pro:
        zero3 = jnp.zeros((3,), u.dtype)
        buoy_g = _scale_gravity(g_vec, -(dx / 4.0) * b_scale) \
            if has_buoy else zero3
        grav_g = _scale_gravity(g_vec, -(dx / 4.0) * g_scale) \
            if has_grav else zero3
        amp = dx * jnp.asarray(v_amp) if has_vc else jnp.zeros((), u.dtype)
        u, div_pre = projection_prologue(
            u, flags, density[:, 0:1], buoy_g, grav_g, amp, dt,
            bcs.u_bc if bcs is not None else None,
            bcs.u_bc_inv_mask if bcs is not None else None)
    elif is_3d and density is not None and (has_buoy or has_grav or
                                            has_vc):
        zero3 = jnp.zeros((3,), u.dtype)
        buoy_g = _scale_gravity(g_vec, -(dx / 4.0) * b_scale) \
            if has_buoy else zero3
        grav_g = _scale_gravity(g_vec, -(dx / 4.0) * g_scale) \
            if has_grav else zero3
        amp = dx * jnp.asarray(v_amp) if has_vc else jnp.zeros((), u.dtype)
        u = forces_block(u, flags, density[:, 0:1], buoy_g, grav_g, amp,
                         dt)
    else:
        if has_buoy:
            g = _scale_gravity(g_vec, -(dx / 4.0) * b_scale)
            u = add_buoyancy(u, flags, density[:, 0:1], g, dt)
        if has_grav:
            g = _scale_gravity(g_vec, -(dx / 4.0) * g_scale)
            u = add_gravity(u, flags, g, dt)
        if has_vc:
            u = vorticity_confinement(u, flags, dx * jnp.asarray(v_amp))

    if output_div:
        # Return the divergent state for training (simulate.lua:241-245).
        return state.replace(u=u, p=p, density=density)

    # 7. Projection (simulate.lua:248-304).
    if mconf.sim_method != "convnet":
        u = set_wall_bcs(u, flags)
    # use_pro: the kernel already applied the u slab + setWallBcs; the
    # p/density slabs were applied at step 3 (idempotent masks).
    state = apply_boundaries(state.replace(u=u, p=p, density=density),
                             bcs_nou if use_pro else bcs)
    u, p, density = state.u, state.p, state.density

    if mconf.sim_method == "convnet":
        assert model_fn is not None, "convnet sim method needs a model"
        if div_pre is not None:
            try:
                # u is already wall-bc'ed and div precomputed in-kernel;
                # models supporting the fused prologue skip both.
                p, u = model_fn(params, p, u, flags,
                                precomputed_div=div_pre)
            except TypeError:
                p, u = model_fn(params, p, u, flags)
        else:
            p, u = model_fn(params, p, u, flags)
        if mconf.polish_iters > 0:
            # Hybrid projection: N Jacobi correction sweeps on the
            # ConvNet's residual divergence (see ModelConfig.polish_iters).
            res_div = velocity_divergence(u, flags)
            dp, _ = solve_jacobi(flags, res_div, p_tol=0.0,
                                 max_iter=mconf.polish_iters)
            u = velocity_update(u, flags, dp)
            p = p + dp
    else:
        div = velocity_divergence(u, flags)
        if mconf.sim_method == "pcg":
            p, _ = solve_pcg(flags, div, tol=mconf.pcg_tol,
                             max_iter=mconf.max_iter)
        elif mconf.sim_method == "jacobi":
            p, _ = solve_jacobi(flags, div, p_tol=0.0,
                                max_iter=mconf.max_iter)
        else:
            raise ValueError(f"bad sim_method {mconf.sim_method}")
        u = velocity_update(u, flags, p)

    state = apply_boundaries(state.replace(u=u, p=p, density=density), bcs)
    u = jnp.clip(state.u, -U_CLAMP, U_CLAMP)
    return state.replace(u=u)


def rollout(state: FluidState, mconf: ModelConfig, n_steps: int,
            model_fn: Optional[Callable] = None, params=None,
            bcs: Optional[Boundaries] = None,
            save_every: int = 0, unroll: int = 1):
    """Run `n_steps` simulate() steps as ONE on-device `lax.scan` loop.

    This is the production rollout path (fluid_net_3d_sim.lua:261's frame
    loop, minus the per-frame host round trip): dispatching each step from
    the host costs ~1.3 ms on this backend — a quarter of the whole 128^3
    step — so offline workloads (benchmarks, stats, data generation, vbox
    export) scan on device and only materialize what they need.

    Returns `state` after n_steps. If `save_every > 0`, also returns the
    density field stacked every `save_every` steps, shape
    (n_steps // save_every, b, c, z, y, x) — the .vbox export cadence
    (fluid_net_3d_sim.lua:266-291).
    """
    def body(s, _):
        s = simulate(s, mconf, model_fn, params, bcs)
        if save_every:
            return s, s.density
        return s, None

    if save_every and save_every > 1:
        # Chunk: inner scan of save_every steps, outer scan stacks frames.
        # A non-divisible count would silently drop the remainder steps.
        assert n_steps % save_every == 0, (
            f"n_steps ({n_steps}) must be divisible by save_every "
            f"({save_every})")

        def chunk(s, _):
            s, _ = jax.lax.scan(lambda c, x: (simulate(
                c, mconf, model_fn, params, bcs), None), s, None,
                length=save_every, unroll=unroll)
            return s, s.density
        n_chunks = n_steps // save_every
        state, frames = jax.lax.scan(chunk, state, None, length=n_chunks)
        return state, frames
    state, frames = jax.lax.scan(body, state, None, length=n_steps,
                                 unroll=unroll)
    if save_every:
        return state, frames
    return state


def create_plume_bcs(state: FluidState, density_val, u_scale: float,
                     rad: float) -> Boundaries:
    """Plume inflow at the domain bottom (simulate.lua:47-123).

    U = (0, u_scale, 0) and density = density_val inside a circle of radius
    `rad * xdim` in the bottom 4 rows; velocity frozen to 0 outside the
    circle in those rows. Matches createPlumeBCs exactly (including the
    freeze-outside behavior, simulate.lua:114-119).
    """
    u, density = state.u, state.density
    assert density is not None, "plume BCs require a density field"
    b, cu, Z, Y, X = u.shape
    is_3d = cu == 3
    if not isinstance(density_val, (list, tuple)):
        density_val = [density_val]
    assert len(density_val) == density.shape[1]

    center_x = X // 2
    center_z = max(Z // 2, 1)
    plume_rad = int(X * rad)

    # The plume touches rows y < 4 only (reference loops z=1..zdim,
    # y=1..4, x=1..xdim, 1-based -> rows 0..3), so the bc/mask pair is
    # stored slab-sized; apply_boundaries updates just those rows.
    YB = min(4, Y)
    xi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z, YB, X), 4)
    zi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Z, YB, X), 2)
    dx_ = (center_x - 1) - xi   # match the reference's 1-based centerX - x
    dz_ = (center_z - 1) - zi
    in_circle = (dx_ * dx_ + dz_ * dz_) <= plume_rad * plume_rad

    vec = [0.0, float(u_scale)] + ([0.0] if is_3d else [])
    u_bc = jnp.concatenate(
        [jnp.where(in_circle, v, 0.0).astype(u.dtype) for v in vec],
        axis=1)
    u_bc = jnp.broadcast_to(u_bc, (b, cu, Z, YB, X))
    # Velocity is frozen to the bc value everywhere in the plume rows
    # (freeze-outside behavior, simulate.lua:114-119).
    u_inv = jnp.zeros((b, cu, Z, YB, X), u.dtype)

    d_bc = jnp.concatenate(
        [jnp.where(in_circle, float(v), 0.0).astype(density.dtype)
         for v in density_val], axis=1)
    d_bc = jnp.broadcast_to(d_bc, (b, density.shape[1], Z, YB, X))
    d_inv = jnp.broadcast_to(jnp.where(in_circle, 0.0, 1.0).astype(
        density.dtype), (b, density.shape[1], Z, YB, X))

    return Boundaries(u_bc=u_bc, u_bc_inv_mask=u_inv,
                      density_bc=d_bc, density_bc_inv_mask=d_inv)
