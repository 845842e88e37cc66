"""Geometry-aware line trace for the "Ours" semi-Lagrangian backtraces.

Vectorized port of calcLineTrace (torch/tfluids/generic/calc_line_trace.cc):
march along the displacement ray in unit-length steps; when a tentative step
exits the domain, back off to the domain-border intersection (hit_margin
inside); when it enters a blocked (non-fluid) cell, back off to the
ray-box intersection with that cell (box inflated by hit_margin) and stop.
The returned position is never inside geometry or outside the domain.

The reference marches each ray serially with data-dependent iteration
counts and hard asserts; on TPU we run a fixed number of masked steps
(`max_steps`, default 8 — covers CFL numbers the training/demo configs use)
with a bounded back-off spin (4, like the reference's max_count,
calc_line_trace.cc:412). Rays longer than max_steps cells are truncated at
the reached point, which only matters for extreme velocities the simulate
loop clamps anyway (simulate.lua:326).
"""

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.celltype import is_fluid
from fluidnet_tpu.ops.interp import gather3d

HIT_MARGIN = 1e-5   # calc_line_trace.cc:22
EPSILON = 1e-12     # calc_line_trace.cc:23
_ERR_TOL = 1e-6     # HitBoundingBox err_tol (calc_line_trace.cc:158)


def _is_out_of_domain(px, py, pz, Z, Y, X):
    """IsOutOfDomainReal (calc_line_trace.cc:44-52); boundary-inclusive."""
    return ((px <= 0.0) | (px >= X) | (py <= 0.0) | (py >= Y) |
            (pz <= 0.0) | (pz >= Z))


def _blocked_at(blocked, px, py, pz):
    """IsBlockedCellReal: blocked flag at the voxel containing pos
    (GetPixelCenter = truncation, calc_line_trace.cc:30-38). Indices are
    clamped for gather safety; callers ensure in-domain positions."""
    Z, Y, X = blocked.shape[2:]
    xi = jnp.clip(px.astype(jnp.int32), 0, X - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, Y - 1)
    zi = jnp.clip(pz.astype(jnp.int32), 0, Z - 1)
    return gather3d(blocked, xi, yi, zi)[:, 0] > 0.5


def _ray_box_intersection(ox, oy, oz, dx, dy, dz, cx, cy, cz):
    """HitBoundingBox against the unit cube at center c, inflated by
    HIT_MARGIN (calc_line_trace.cc:101-196). Returns (hit, ix, iy, iz)."""
    half = 0.5 + HIT_MARGIN
    hit = None
    coords = []
    # Per-axis candidate planes.
    axes = [(ox, dx, cx), (oy, dy, cy), (oz, dz, cz)]
    minb = [c - half for (_, _, c) in axes]
    maxb = [c + half for (_, _, c) in axes]
    left = [o < mn for (o, _, _), mn in zip(axes, minb)]
    right = [o > mx for (o, _, _), mx in zip(axes, maxb)]
    middle = [~l & ~r for l, r in zip(left, right)]
    inside = middle[0] & middle[1] & middle[2]
    cand = [jnp.where(l, mn, mx) for l, mn, mx in zip(left, minb, maxb)]
    maxT = [
        jnp.where(~m & (jnp.abs(d) > 0.0), (cp - o) / jnp.where(d == 0, 1.0, d),
                  -1.0)
        for (o, d, _), m, cp in zip(axes, middle, cand)
    ]
    t = jnp.stack(maxT)                      # (3, ...)
    which = jnp.argmax(t, axis=0)            # (...)
    tbest = jnp.max(t, axis=0)
    ok = tbest >= 0.0
    for i, ((o, d, _), cp) in enumerate(zip(axes, cand)):
        ci = jnp.where(which == i, cp, o + tbest * d)
        in_rng = (ci >= minb[i] - _ERR_TOL) & (ci <= maxb[i] + _ERR_TOL)
        ok = ok & (in_rng | (which == i))
        coords.append(ci)
    hit = ok & ~inside
    # Origin inside the box -> coord = origin, hit (calc_line_trace.cc:128-133).
    coords = [jnp.where(inside, o, c) for (o, _, _), c in zip(axes, coords)]
    hit = hit | inside
    return hit, coords[0], coords[1], coords[2]


def _border_intersection(ox, oy, oz, nx, ny, nz, Z, Y, X):
    """calcRayBorderIntersection (calc_line_trace.cc:205-286): step back to
    HIT_MARGIN inside the first exceeded face. Returns (hit, ix, iy, iz);
    on no-hit callers clamp instead."""
    big = jnp.full_like(ox, jnp.finfo(ox.dtype).max)
    min_step = big

    def face(min_step, n, o, lo_bound, hi_bound):
        d = n - o
        safe_d = jnp.where(jnp.abs(d) >= EPSILON, d, 1.0)
        # Negative face: n <= HIT_MARGIN.
        step_lo = (HIT_MARGIN - o) / safe_d
        use_lo = (n <= HIT_MARGIN) & (jnp.abs(d) >= EPSILON)
        min_step = jnp.where(use_lo, jnp.minimum(min_step, step_lo), min_step)
        # Positive face: n >= size - HIT_MARGIN.
        step_hi = (hi_bound - HIT_MARGIN - o) / safe_d
        use_hi = (n >= hi_bound - HIT_MARGIN) & (jnp.abs(d) >= EPSILON)
        return jnp.where(use_hi, jnp.minimum(min_step, step_hi), min_step)

    min_step = face(min_step, nx, ox, 0.0, float(X))
    min_step = face(min_step, ny, oy, 0.0, float(Y))
    min_step = face(min_step, nz, oz, 0.0, float(Z))

    hit = (min_step >= 0.0) & (min_step < big)
    ix = min_step * (nx - ox) + ox
    iy = min_step * (ny - oy) + oy
    iz = min_step * (nz - oz) + oz
    return hit, ix, iy, iz


def _clamp_to_domain(px, py, pz, Z, Y, X):
    """ClampToDomainReal (calc_line_trace.cc:72-81)."""
    px = jnp.clip(px, HIT_MARGIN, X - HIT_MARGIN)
    py = jnp.clip(py, HIT_MARGIN, Y - HIT_MARGIN)
    pz = jnp.clip(pz, HIT_MARGIN, Z - HIT_MARGIN)
    return px, py, pz


def line_trace(px, py, pz, dx, dy, dz, flags, max_steps: int = 8):
    """Traces from (px,py,pz) along displacement (dx,dy,dz).

    All position/displacement arrays are (b, z, y, x). Returns
    (hit, nx, ny, nz): the final positions, and whether the ray was stopped
    by geometry or the domain border. Rays starting in non-fluid cells are
    the caller's responsibility (the reference hard-errors; we leave them
    unmoved since advection copies src for non-fluid cells anyway).
    """
    Z, Y, X = flags.shape[2:]
    blocked = (~is_fluid(flags)).astype(jnp.float32)

    length = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    live0 = length > EPSILON
    inv_len = jnp.where(live0, 1.0 / jnp.where(live0, length, 1.0), 0.0)
    ux, uy, uz = dx * inv_len, dy * inv_len, dz * inv_len

    # Rays that start blocked or out-of-domain never move.
    start_bad = _is_out_of_domain(px, py, pz, Z, Y, X)
    start_bad = start_bad | _blocked_at(blocked, px, py, pz)

    def body(_, state):
        cx, cy, cz, cur_len, done, hit = state
        active = ~done & (cur_len < length - HIT_MARGIN)
        step = jnp.minimum(length - cur_len, 1.0)
        nx = cx + ux * step
        ny = cy + uy * step
        nz = cz + uz * step

        # Case 1: tentative step exits the domain (calc_line_trace.cc:368-402).
        oob = _is_out_of_domain(nx, ny, nz, Z, Y, X)
        bhit, bx, by, bz = _border_intersection(cx, cy, cz, nx, ny, nz, Z, Y, X)
        fx, fy, fz = _clamp_to_domain(nx, ny, nz, Z, Y, X)
        ix = jnp.where(bhit, bx, fx)
        iy = jnp.where(bhit, by, fy)
        iz = jnp.where(bhit, bz, fz)
        nx = jnp.where(oob, ix, nx)
        ny = jnp.where(oob, iy, ny)
        nz = jnp.where(oob, iz, nz)

        # Case 2: lands in a blocked cell -> spin back-off along the ray
        # (calc_line_trace.cc:403-478, max_count == 4).
        was_blocked = _blocked_at(blocked, nx, ny, nz)
        is_blk = was_blocked
        box_fail = jnp.zeros_like(is_blk)
        sx, sy, sz = nx, ny, nz
        for _spin in range(4):
            ctr_x = jnp.floor(sx).astype(jnp.int32).astype(sx.dtype) + 0.5
            ctr_y = jnp.floor(sy).astype(jnp.int32).astype(sy.dtype) + 0.5
            ctr_z = jnp.floor(sz).astype(jnp.int32).astype(sz.dtype) + 0.5
            h, rx, ry, rz = _ray_box_intersection(
                cx, cy, cz, ux, uy, uz, ctr_x, ctr_y, ctr_z)
            upd = is_blk & ~box_fail
            box_fail = box_fail | (upd & ~h)
            sx = jnp.where(upd & h, rx, sx)
            sy = jnp.where(upd & h, ry, sy)
            sz = jnp.where(upd & h, rz, sz)
            is_blk = jnp.where(upd & h,
                               _blocked_at(blocked, sx, sy, sz), is_blk)
        # Box-intersection failure -> stay at the current valid point
        # (calc_line_trace.cc:444-453).
        sx = jnp.where(box_fail, cx, sx)
        sy = jnp.where(box_fail, cy, sy)
        sz = jnp.where(box_fail, cz, sz)

        # Termination:
        #  - oob & not blocked at border point -> stop with hit.
        #  - blocked -> stop at backed-off point with hit.
        stop_border = oob & ~was_blocked
        stop_block = was_blocked
        stop = stop_border | stop_block

        out_x = jnp.where(stop_block, sx, nx)
        out_y = jnp.where(stop_block, sy, ny)
        out_z = jnp.where(stop_block, sz, nz)

        new_cx = jnp.where(active, out_x, cx)
        new_cy = jnp.where(active, out_y, cy)
        new_cz = jnp.where(active, out_z, cz)
        new_hit = hit | (active & stop)
        new_done = done | (active & stop)
        new_len = jnp.where(active, cur_len + step, cur_len)
        return new_cx, new_cy, new_cz, new_len, new_done, new_hit

    done0 = start_bad | ~live0
    state = (px, py, pz, jnp.zeros_like(length), done0,
             jnp.zeros_like(done0))
    cx, cy, cz, _, _, hit = jax.lax.fori_loop(0, max_steps, body, state)

    # Straight Euler target for rays the caller disabled tracing on is
    # handled by the caller; zero-length rays return the source (hit=False).
    return hit, cx, cy, cz
