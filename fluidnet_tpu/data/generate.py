"""Self-generation of training data with the built-in PCG solver.

The reference depends on an external mantaflow fork to render training
pairs (README.md:126-179; the manta scene steps a classical solver and
writes the state before and after the pressure projection). This module
replaces that dependency: random scenes (turbulent initial velocity from a
divergence-free spectral noise field, random obstacle boxes/spheres, an
optional plume source, random buoyancy) are stepped with the matrix-free
PCG projection, and each frame writes the manta-compatible pair

  NNNNNN_divergent.bin  — state after advection+forces, before projection
  NNNNNN.bin            — state after the PCG projection (the target)

exactly the layout DataBinary consumes (torch/lib/data_binary.lua:51-52).
"""

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import CellType
from fluidnet_tpu.core.config import ModelConfig
from fluidnet_tpu.core.grids import FluidState, empty_domain
from fluidnet_tpu.data.manta_io import frame_name, save_manta_file
from fluidnet_tpu.ops.boundary import set_wall_bcs
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.ops.velocity_update import velocity_update
from fluidnet_tpu.sim.simulate import (Boundaries, create_plume_bcs,
                                       simulate)
from fluidnet_tpu.solvers.cg import solve_pcg


def divergence_free_noise(rng, shape_zyx, is_3d, n_modes=24, max_freq=6,
                          amplitude=1.0):
    """Band-limited divergence-free velocity: curl of a random stream
    function (2-D) / vector potential (3-D). The spectral analogue of
    manta's wavelet turbulence initialization."""
    Z, Y, X = shape_zyx
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    n_pots = 3 if is_3d else 1
    pots = np.zeros((n_pots, Z, Y, X), np.float32)
    for m in range(n_modes):
        k = rng.integers(1, max_freq + 1, size=3)
        if not is_3d:
            k[0] = 0
        phase = rng.random(3) * 2 * np.pi
        amp = amplitude * rng.standard_normal() / n_modes
        wave = np.cos(2 * np.pi * (k[0] * zz / max(Z, 1) +
                                   k[1] * yy / Y + k[2] * xx / X) +
                      phase[0]).astype(np.float32)
        pots[rng.integers(0, n_pots)] += amp * wave

    def d(a, ax):
        return np.gradient(a, axis=ax)

    if is_3d:
        az, ay, ax_ = pots[0], pots[1], pots[2]
        # u = curl A  (z, y, x axes are 0, 1, 2)
        ux = d(az, 1) - d(ay, 0)
        uy = d(ax_, 0) - d(az, 2)
        uz = d(ay, 2) - d(ax_, 1)
        u = np.stack([ux, uy, uz])
    else:
        psi = pots[0]
        ux = d(psi, 1)
        uy = -d(psi, 2)
        u = np.stack([ux, uy])
    return u[None]  # (1, c, Z, Y, X)


def random_obstacle_flags(rng, shape_zyx, is_3d, max_obstacles=3,
                          voxels=None):
    """Empty domain + random solid boxes/spheres; optionally a voxel model
    occupancy grid blitted in (voxel_utils.lua equivalents live in
    fluidnet_tpu.io.voxel_utils)."""
    Z, Y, X = shape_zyx
    flags = np.asarray(empty_domain((1, 1, Z, Y, X), is_3d)).copy()
    zz, yy, xx = np.meshgrid(np.arange(Z), np.arange(Y), np.arange(X),
                             indexing="ij")
    for _ in range(rng.integers(0, max_obstacles + 1)):
        kind = rng.choice(["box", "sphere"])
        cx = rng.integers(X // 8, X - X // 8)
        cy = rng.integers(Y // 8, Y - Y // 8)
        cz = rng.integers(Z // 8, Z - Z // 8) if is_3d else 0
        r = rng.integers(2, max(3, min(X, Y) // 6))
        if kind == "box":
            m = (np.abs(xx - cx) <= r) & (np.abs(yy - cy) <= r)
            if is_3d:
                m &= np.abs(zz - cz) <= r
        else:
            d2 = (xx - cx) ** 2 + (yy - cy) ** 2
            if is_3d:
                d2 = d2 + (zz - cz) ** 2
            m = d2 <= r * r
        flags[0, 0][m] = int(CellType.TypeObstacle)
    if voxels is not None:
        flags[0, 0][voxels > 0.5] = int(CellType.TypeObstacle)
    return flags


def project_pcg(state: FluidState, max_iter=300, tol=1e-5):
    """The calcPUTargets path (simulate.lua:332-372): wall BCs -> divergence
    -> PCG -> velocity update -> wall BCs."""
    u = set_wall_bcs(state.u, state.flags)
    div = velocity_divergence(u, state.flags)
    p, residual = solve_pcg(state.flags, div, tol=tol, max_iter=max_iter)
    u = velocity_update(u, state.flags, p)
    u = set_wall_bcs(u, state.flags)
    return state.replace(u=u, p=p), residual


# Module-level jitted steps so every run/batch of the same shape reuses ONE
# compilation (a per-call jax.jit(lambda ...) is a fresh cache entry each
# time — each 8-scene batch would retrace and recompile).
@partial(jax.jit, static_argnames=("mconf",))
def _gen_advance(state, bcs, b_scale, v_amp, mconf):
    return simulate(state, mconf, None, None, bcs, output_div=True,
                    buoyancy_scale=b_scale, vorticity_amp=v_amp)


@partial(jax.jit, static_argnames=("max_iter",))
def _gen_project(state, max_iter):
    return project_pcg(state, max_iter=max_iter)


def _identity_boundaries_like(bcs: "Boundaries") -> "Boundaries":
    """A Boundaries pytree that applies no change (inv_mask=1, bc=0), with
    the same field shapes as `bcs` — used to mix plume and plume-free
    scenes inside one generation batch."""
    def z(a):
        return None if a is None else jnp.zeros_like(a)

    def o(a):
        return None if a is None else jnp.ones_like(a)

    return Boundaries(u_bc=z(bcs.u_bc), u_bc_inv_mask=o(bcs.u_bc_inv_mask),
                      p_bc=z(bcs.p_bc), p_bc_inv_mask=o(bcs.p_bc_inv_mask),
                      density_bc=z(bcs.density_bc),
                      density_bc_inv_mask=o(bcs.density_bc_inv_mask))


def generate_run(out_dir, rng, size_xyz=(64, 64, 1), is_3d=False,
                 n_frames=64, dt=0.1, buoyancy_scale=None, plume=None,
                 advection="maccormackOurs", save_every=1, max_iter=300):
    """Generates one run directory of paired frames. Returns max residual."""
    os.makedirs(out_dir, exist_ok=True)
    X, Y, Z = size_xyz
    flags = jnp.asarray(random_obstacle_flags(rng, (Z, Y, X), is_3d))
    u0 = jnp.asarray(divergence_free_noise(
        rng, (Z, Y, X), is_3d, amplitude=float(rng.random() * 4 + 1)),
        jnp.float32)
    rho0 = jnp.asarray(rng.random((1, 1, Z, Y, X)), jnp.float32)
    state = FluidState(u=u0, p=jnp.zeros((1, 1, Z, Y, X), jnp.float32),
                       flags=flags, density=rho0)

    if buoyancy_scale is None:
        buoyancy_scale = float(rng.random() * 2.0) if rng.random() < 0.5 else 0.0
    mconf = ModelConfig(is_3d=is_3d, dt=dt, advection_method=advection,
                        sim_method="pcg", max_iter=max_iter)
    bcs = None
    if plume is not None or rng.random() < 0.5:
        scale = plume if plume is not None else float(rng.random() * 1.0 + 0.2)
        state = state.replace(density=jnp.zeros_like(state.density))
        bcs = create_plume_bcs(state, [1.0], u_scale=scale, rad=0.15)

    bs = jnp.asarray(buoyancy_scale, jnp.float32)
    va = jnp.zeros((), jnp.float32)
    max_res = 0.0
    for f in range(n_frames):
        state = _gen_advance(state, bcs, bs, va, mconf)  # divergent state
        if f % save_every == 0:
            _save(out_dir, f, state)
        projected, res = _gen_project(state, max_iter)
        max_res = max(max_res, float(res))
        if f % save_every == 0:
            _save(out_dir, f, projected, divergent=False)
        state = projected
    return max_res


def _save(out_dir, frame, state: FluidState, divergent=True):
    path = os.path.join(out_dir, frame_name(frame, divergent))
    save_manta_file(path, np.asarray(state.p), np.asarray(state.u),
                    np.asarray(state.flags),
                    np.asarray(state.density[:, :1]))


def generate_run_batch(out_dirs, rng, size_xyz=(64, 64, 1), is_3d=False,
                       n_frames=64, dt=0.1, advection="maccormackOurs",
                       save_every=1, max_iter=300):
    """Batched scene generation: rolls len(out_dirs) scenes as ONE batch
    through the jitted advance/project pipeline (amortizes compile and
    keeps the chip busy — the per-scene loop spends most of its time on
    B=1 kernels). ALL randomization is per scene: obstacles, noise,
    density, buoyancy / vorticity scales (traced (B,) vectors) and the
    plume (per-scene masks; plume-free scenes get identity BCs) — so
    batching costs no force-condition diversity, and one compilation
    serves every batch.

    Returns the max PCG residual across the batch."""
    B = len(out_dirs)
    for d in out_dirs:
        os.makedirs(d, exist_ok=True)
    X, Y, Z = size_xyz
    flags = jnp.concatenate(
        [jnp.asarray(random_obstacle_flags(rng, (Z, Y, X), is_3d))
         for _ in range(B)])
    u0 = jnp.concatenate(
        [jnp.asarray(divergence_free_noise(
            rng, (Z, Y, X), is_3d,
            amplitude=float(rng.random() * 4 + 1)), jnp.float32)
         for _ in range(B)])
    rho0 = jnp.asarray(rng.random((B, 1, Z, Y, X)), jnp.float32)
    state = FluidState(u=u0, p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
                       flags=flags, density=rho0)

    mconf = ModelConfig(is_3d=is_3d, dt=dt, advection_method=advection,
                        sim_method="pcg", max_iter=max_iter)

    # Per-scene force draws (same marginals as the per-scene path).
    buoy = np.where(rng.random(B) < 0.5, rng.random(B) * 2.0, 0.0)
    vort = np.where(rng.random(B) < 0.5, rng.random(B) * 3.0, 0.0)

    # Per-scene plume: scenes draw their own on/off, inflow speed and
    # radius; plume scenes start with zero density (filled by the inflow).
    scene_bcs = []
    has_plume = rng.random(B) < 0.5
    rho_host = np.array(rho0)
    for i in range(B):
        si = FluidState(u=u0[i:i + 1], p=state.p[i:i + 1],
                        flags=flags[i:i + 1], density=rho0[i:i + 1])
        b_i = create_plume_bcs(
            si, [1.0], u_scale=float(rng.random() * 1.0 + 0.2),
            rad=float(rng.random() * 0.1 + 0.1))
        if has_plume[i]:
            rho_host[i] = 0.0
        else:
            b_i = _identity_boundaries_like(b_i)
        scene_bcs.append(b_i)
    bcs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *scene_bcs)
    state = state.replace(density=jnp.asarray(rho_host))

    bs = jnp.asarray(buoy, jnp.float32)
    va = jnp.asarray(vort, jnp.float32)

    def save_all(st, f, divergent):
        arrs = (np.asarray(st.p), np.asarray(st.u), np.asarray(st.flags),
                np.asarray(st.density[:, :1]))
        for i, d in enumerate(out_dirs):
            save_manta_file(
                os.path.join(d, frame_name(f, divergent)),
                *(a[i:i + 1] for a in arrs))

    max_res = 0.0
    for f in range(n_frames):
        state = _gen_advance(state, bcs, bs, va, mconf)  # divergent state
        if f % save_every == 0:
            save_all(state, f, True)
        projected, res = _gen_project(state, max_iter)
        max_res = max(max_res, float(res))
        if f % save_every == 0:
            save_all(projected, f, False)
        state = projected
    return max_res


def generate_dataset(root, n_tr=4, n_te=2, seed=0, scenes_per_batch=1,
                     **kw):
    """Creates <root>/{tr,te}/NNN run directories (data_binary.lua layout).

    scenes_per_batch > 1 groups scene rollouts into batched jitted steps
    (generate_run_batch) — scene content stays per-scene random."""
    import time

    rng = np.random.default_rng(seed)
    for split, n in (("tr", n_tr), ("te", n_te)):
        if scenes_per_batch > 1:
            r = 0
            while r < n:
                g = min(scenes_per_batch, n - r)
                dirs = [os.path.join(root, split, "%03d" % (r + i))
                        for i in range(g)]
                t0 = time.time()
                res = generate_run_batch(dirs, rng, **kw)
                print(f"  [{split} {r + g}/{n}] {g} scenes in "
                      f"{time.time() - t0:.1f}s (max residual {res:.2e})",
                      flush=True)
                r += g
        else:
            for r in range(n):
                generate_run(os.path.join(root, split, "%03d" % r), rng,
                             **kw)
    return root
