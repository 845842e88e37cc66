"""Slow, loop-based NumPy implementation of the FluidNet physics ops.

This is the trusted "golden" oracle for the vectorized JAX ops: a direct
transcription of the op *semantics* (documented in each fluidnet_tpu op
docstring, derived from torch/tfluids/third_party/tfluids.cc) written in
the most obvious way possible — per-cell Python loops — so that bugs in the
vectorized versions can't hide behind shared code.

Arrays are (b, c, z, y, x), matching the package layout. 2-D uses z == 1.
"""

import numpy as np

FLUID = 1
OBSTACLE = 2
EMPTY = 4
INFLOW = 8
OUTFLOW = 16
STICK = 128


def _bit(f, b):
    return (int(f) & b) > 0


def is_fluid(f):
    return _bit(f, FLUID)


def is_obstacle(f):
    return _bit(f, OBSTACLE)


def get_dx(shape):
    z, y, x = shape[-3:]
    return 1.0 / max(x, y, z)


def set_wall_bcs(u, flags):
    u = u.copy()
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    f = fg[b, k, j, i]
                    cf, co = is_fluid(f), is_obstacle(f)
                    if not cf and not co:
                        continue
                    if i > 0 and is_obstacle(fg[b, k, j, i - 1]):
                        u[b, 0, k, j, i] = 0
                    if i > 0 and co and is_fluid(fg[b, k, j, i - 1]):
                        u[b, 0, k, j, i] = 0
                    if j > 0 and is_obstacle(fg[b, k, j - 1, i]):
                        u[b, 1, k, j, i] = 0
                    if j > 0 and co and is_fluid(fg[b, k, j - 1, i]):
                        u[b, 1, k, j, i] = 0
                    if k > 0 and is_obstacle(fg[b, k - 1, j, i]):
                        u[b, 2, k, j, i] = 0
                    if k > 0 and co and is_fluid(fg[b, k - 1, j, i]):
                        u[b, 2, k, j, i] = 0
                    if cf:
                        if ((i > 0 and _bit(fg[b, k, j, i - 1], STICK)) or
                                (i < X - 1 and _bit(fg[b, k, j, i + 1], STICK))):
                            u[b, 1, k, j, i] = 0
                            if is3d:
                                u[b, 2, k, j, i] = 0
                        if ((j > 0 and _bit(fg[b, k, j - 1, i], STICK)) or
                                (j < Y - 1 and _bit(fg[b, k, j + 1, i], STICK))):
                            u[b, 0, k, j, i] = 0
                            if is3d:
                                u[b, 2, k, j, i] = 0
                        if is3d and ((k > 0 and _bit(fg[b, k - 1, j, i], STICK)) or
                                     (k < Z - 1 and _bit(fg[b, k + 1, j, i], STICK))):
                            u[b, 0, k, j, i] = 0
                            u[b, 1, k, j, i] = 0
    return u


def velocity_divergence(u, flags):
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    out = np.zeros((B, 1, Z, Y, X), u.dtype)
    fg = flags[:, 0]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    if not is_fluid(fg[b, k, j, i]):
                        continue
                    d = (u[b, 0, k, j, i] - u[b, 0, k, j, i + 1] +
                         u[b, 1, k, j, i] - u[b, 1, k, j + 1, i])
                    if is3d:
                        d += u[b, 2, k, j, i] - u[b, 2, k + 1, j, i]
                    out[b, 0, k, j, i] = d
    return out


def velocity_update(u, flags, p):
    u = u.copy()
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    pp = p[:, 0]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    f = fg[b, k, j, i]
                    if is_fluid(f):
                        if is_fluid(fg[b, k, j, i - 1]):
                            u[b, 0, k, j, i] -= pp[b, k, j, i] - pp[b, k, j, i - 1]
                        if is_fluid(fg[b, k, j - 1, i]):
                            u[b, 1, k, j, i] -= pp[b, k, j, i] - pp[b, k, j - 1, i]
                        if is3d and is_fluid(fg[b, k - 1, j, i]):
                            u[b, 2, k, j, i] -= pp[b, k, j, i] - pp[b, k - 1, j, i]
                        if _bit(fg[b, k, j, i - 1], EMPTY):
                            u[b, 0, k, j, i] -= pp[b, k, j, i]
                        if _bit(fg[b, k, j - 1, i], EMPTY):
                            u[b, 1, k, j, i] -= pp[b, k, j, i]
                        if is3d and _bit(fg[b, k - 1, j, i], EMPTY):
                            u[b, 2, k, j, i] -= pp[b, k, j, i]
                    elif _bit(f, EMPTY) and not _bit(f, OUTFLOW):
                        if is_fluid(fg[b, k, j, i - 1]):
                            u[b, 0, k, j, i] += pp[b, k, j, i - 1]
                        else:
                            u[b, 0, k, j, i] = 0
                        if is_fluid(fg[b, k, j - 1, i]):
                            u[b, 1, k, j, i] += pp[b, k, j - 1, i]
                        else:
                            u[b, 1, k, j, i] = 0
                        if is3d:
                            if is_fluid(fg[b, k - 1, j, i]):
                                u[b, 2, k, j, i] += pp[b, k - 1, j, i]
                            else:
                                u[b, 2, k, j, i] = 0
    return u


def add_buoyancy(u, flags, density, gravity, dt):
    u = u.copy()
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    rho = density[:, 0]
    dx = get_dx(u.shape)
    s = [-gravity[0] * dt / dx, -gravity[1] * dt / dx, -gravity[2] * dt / dx]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    if not is_fluid(fg[b, k, j, i]):
                        continue
                    if is_fluid(fg[b, k, j, i - 1]):
                        u[b, 0, k, j, i] += 0.5 * s[0] * (
                            rho[b, k, j, i] + rho[b, k, j, i - 1])
                    if is_fluid(fg[b, k, j - 1, i]):
                        u[b, 1, k, j, i] += 0.5 * s[1] * (
                            rho[b, k, j, i] + rho[b, k, j - 1, i])
                    if is3d and is_fluid(fg[b, k - 1, j, i]):
                        u[b, 2, k, j, i] += 0.5 * s[2] * (
                            rho[b, k, j, i] + rho[b, k - 1, j, i])
    return u


def add_gravity(u, flags, gravity, dt):
    u = u.copy()
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    dx = get_dx(u.shape)
    f = [gravity[0] * dt / dx, gravity[1] * dt / dx, gravity[2] * dt / dx]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    fc = fg[b, k, j, i]
                    cf, ce = is_fluid(fc), _bit(fc, EMPTY)
                    if not cf and not ce:
                        continue
                    if (is_fluid(fg[b, k, j, i - 1]) or
                            (cf and _bit(fg[b, k, j, i - 1], EMPTY))):
                        u[b, 0, k, j, i] += f[0]
                    if (is_fluid(fg[b, k, j - 1, i]) or
                            (cf and _bit(fg[b, k, j - 1, i], EMPTY))):
                        u[b, 1, k, j, i] += f[1]
                    if is3d and (is_fluid(fg[b, k - 1, j, i]) or
                                 (cf and _bit(fg[b, k - 1, j, i], EMPTY))):
                        u[b, 2, k, j, i] += f[2]
    return u


def get_centered(u):
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    out = np.zeros((B, 3, Z, Y, X), u.dtype)
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    out[b, 0, k, j, i] = 0.5 * (u[b, 0, k, j, i] +
                                                u[b, 0, k, j, i + 1])
                    out[b, 1, k, j, i] = 0.5 * (u[b, 1, k, j, i] +
                                                u[b, 1, k, j + 1, i])
                    if is3d:
                        out[b, 2, k, j, i] = 0.5 * (u[b, 2, k, j, i] +
                                                    u[b, 2, k + 1, j, i])
    return out


def vorticity_confinement(u, flags, strength):
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    eps = 1e-6

    cent = get_centered(u)
    curl = np.zeros((B, 3, Z, Y, X), u.dtype)
    curl_norm = np.zeros((B, Z, Y, X), u.dtype)
    force = np.zeros((B, 3, Z, Y, X), u.dtype)

    def interior(i, j, k):
        return not (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                    (is3d and (k < 1 or k > Z - 2)))

    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if not interior(i, j, k):
                        continue
                    cz = 0.5 * ((cent[b, 1, k, j, i + 1] - cent[b, 1, k, j, i - 1]) -
                                (cent[b, 0, k, j + 1, i] - cent[b, 0, k, j - 1, i]))
                    cx = cy = 0.0
                    if is3d:
                        cx = 0.5 * ((cent[b, 2, k, j + 1, i] - cent[b, 2, k, j - 1, i]) -
                                    (cent[b, 1, k + 1, j, i] - cent[b, 1, k - 1, j, i]))
                        cy = 0.5 * ((cent[b, 0, k + 1, j, i] - cent[b, 0, k - 1, j, i]) -
                                    (cent[b, 2, k, j, i + 1] - cent[b, 2, k, j, i - 1]))
                    curl[b, :, k, j, i] = [cx, cy, cz]
                    lsq = cx * cx + cy * cy + cz * cz
                    curl_norm[b, k, j, i] = np.sqrt(lsq) if lsq > eps else 0.0
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if not interior(i, j, k):
                        continue
                    gx = 0.5 * (curl_norm[b, k, j, i + 1] - curl_norm[b, k, j, i - 1])
                    gy = 0.5 * (curl_norm[b, k, j + 1, i] - curl_norm[b, k, j - 1, i])
                    gz = 0.0
                    if is3d:
                        gz = 0.5 * (curl_norm[b, k + 1, j, i] - curl_norm[b, k - 1, j, i])
                    lsq = gx * gx + gy * gy + gz * gz
                    n = np.sqrt(lsq) if lsq > eps else 0.0
                    if n > eps:
                        gx, gy, gz = gx / n, gy / n, gz / n
                    else:
                        gx = gy = gz = 0.0
                    w = curl[b, :, k, j, i]
                    force[b, 0, k, j, i] = (gy * w[2] - gz * w[1]) * strength
                    force[b, 1, k, j, i] = (gz * w[0] - gx * w[2]) * strength
                    force[b, 2, k, j, i] = (gx * w[1] - gy * w[0]) * strength

    out = u.copy()
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if not interior(i, j, k):
                        continue
                    fc = fg[b, k, j, i]
                    cf, ce = is_fluid(fc), _bit(fc, EMPTY)
                    if not cf and not ce:
                        continue
                    if (is_fluid(fg[b, k, j, i - 1]) or
                            (cf and _bit(fg[b, k, j, i - 1], EMPTY))):
                        out[b, 0, k, j, i] += 0.5 * (force[b, 0, k, j, i - 1] +
                                                     force[b, 0, k, j, i])
                    if (is_fluid(fg[b, k, j - 1, i]) or
                            (cf and _bit(fg[b, k, j - 1, i], EMPTY))):
                        out[b, 1, k, j, i] += 0.5 * (force[b, 1, k, j - 1, i] +
                                                     force[b, 1, k, j, i])
                    if is3d and (is_fluid(fg[b, k - 1, j, i]) or
                                 (cf and _bit(fg[b, k - 1, j, i], EMPTY))):
                        out[b, 2, k, j, i] += 0.5 * (force[b, 2, k - 1, j, i] +
                                                     force[b, 2, k, j, i])
    return out


# --- interpolation -----------------------------------------------------------

def build_index(pos, shape):
    """BUILD_INDEX semantics; pos is (x, y, z) floats, shape is (Z, Y, X)."""
    Z, Y, X = shape
    px, py, pz = pos[0] - 0.5, pos[1] - 0.5, pos[2] - 0.5
    xi, yi, zi = int(np.floor(px)), int(np.floor(py)), int(np.floor(pz))
    s1 = px - xi
    t1 = py - yi
    f1 = pz - zi
    s0, t0, f0 = 1 - s1, 1 - t1, 1 - f1
    if px < 0:
        xi, s0, s1 = 0, 1.0, 0.0
    if py < 0:
        yi, t0, t1 = 0, 1.0, 0.0
    if pz < 0:
        zi, f0, f1 = 0, 1.0, 0.0
    if xi >= X - 1:
        xi, s0, s1 = X - 2, 0.0, 1.0
    if yi >= Y - 1:
        yi, t0, t1 = Y - 2, 0.0, 1.0
    if Z > 1 and zi >= Z - 1:
        zi, f0, f1 = Z - 2, 0.0, 1.0
    return xi, yi, zi, s0, s1, t0, t1, f0, f1


def interpol(field, pos, b, c=0):
    """Plain (tri)linear sample of field (b, c, z, y, x) at pos=(x,y,z)."""
    Z, Y, X = field.shape[2:]
    is3d = Z > 1
    xi, yi, zi, s0, s1, t0, t1, f0, f1 = build_index(pos, (Z, Y, X))
    d = field[b, c]
    if is3d:
        return (((d[zi, yi, xi] * t0 + d[zi, yi + 1, xi] * t1) * s0 +
                 (d[zi, yi, xi + 1] * t0 + d[zi, yi + 1, xi + 1] * t1) * s1) * f0 +
                ((d[zi + 1, yi, xi] * t0 + d[zi + 1, yi + 1, xi] * t1) * s0 +
                 (d[zi + 1, yi, xi + 1] * t0 + d[zi + 1, yi + 1, xi + 1] * t1) * s1) * f1)
    return ((d[0, yi, xi] * t0 + d[0, yi + 1, xi] * t1) * s0 +
            (d[0, yi, xi + 1] * t0 + d[0, yi + 1, xi + 1] * t1) * s1)


def _lerp_fluid(va, fa, vb, fb, ta, tb):
    if not fa and not fb:
        return 0.0, False
    if not fa:
        return vb, True
    if not fb:
        return va, True
    return va * ta + vb * tb, True


def interpol_with_fluid(field, flags, pos, b):
    Z, Y, X = field.shape[2:]
    is3d = Z > 1
    xi, yi, zi, s0, s1, t0, t1, f0, f1 = build_index(pos, (Z, Y, X))
    d = field[b, 0]
    fg = flags[b, 0]

    def P(z, y, x):
        return d[z, y, x], is_fluid(fg[z, y, x])

    if is3d:
        vab, fab = _lerp_fluid(*P(zi, yi, xi), *P(zi, yi + 1, xi), t0, t1)
        vcd, fcd = _lerp_fluid(*P(zi, yi, xi + 1), *P(zi, yi + 1, xi + 1), t0, t1)
        vef, fef = _lerp_fluid(*P(zi + 1, yi, xi), *P(zi + 1, yi + 1, xi), t0, t1)
        vgh, fgh = _lerp_fluid(*P(zi + 1, yi, xi + 1), *P(zi + 1, yi + 1, xi + 1),
                               t0, t1)
        vlo, flo = _lerp_fluid(vab, fab, vcd, fcd, s0, s1)
        vhi, fhi = _lerp_fluid(vef, fef, vgh, fgh, s0, s1)
        v, fl = _lerp_fluid(vlo, flo, vhi, fhi, f0, f1)
    else:
        vab, fab = _lerp_fluid(*P(0, yi, xi), *P(0, yi + 1, xi), t0, t1)
        vcd, fcd = _lerp_fluid(*P(0, yi, xi + 1), *P(0, yi + 1, xi + 1), t0, t1)
        v, fl = _lerp_fluid(vab, fab, vcd, fcd, s0, s1)
    if not fl:
        return interpol(field, pos, b)
    return v


def semi_lagrange_euler_scalar(dt, s, u, flags):
    """Manta 'euler' scalar advection (border zeroed)."""
    B, _, Z, Y, X = s.shape
    is3d = u.shape[1] == 3
    cent = get_centered(u)
    out = np.zeros_like(s)
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    pos = (i + 0.5 - cent[b, 0, k, j, i] * dt,
                           j + 0.5 - cent[b, 1, k, j, i] * dt,
                           k + 0.5 - cent[b, 2, k, j, i] * dt)
                    out[b, 0, k, j, i] = interpol(s, pos, b)
    return out


def get_at_mac(u, c, b, k, j, i):
    is3d = u.shape[1] == 3
    if c == 0:
        vx = u[b, 0, k, j, i]
        vy = 0.25 * (u[b, 1, k, j, i] + u[b, 1, k, j, i - 1] +
                     u[b, 1, k, j + 1, i] + u[b, 1, k, j + 1, i - 1])
        vz = 0.25 * (u[b, 2, k, j, i] + u[b, 2, k, j, i - 1] +
                     u[b, 2, k + 1, j, i] + u[b, 2, k + 1, j, i - 1]) if is3d else 0.0
    elif c == 1:
        vx = 0.25 * (u[b, 0, k, j, i] + u[b, 0, k, j - 1, i] +
                     u[b, 0, k, j, i + 1] + u[b, 0, k, j - 1, i + 1])
        vy = u[b, 1, k, j, i]
        vz = 0.25 * (u[b, 2, k, j, i] + u[b, 2, k, j - 1, i] +
                     u[b, 2, k + 1, j, i] + u[b, 2, k + 1, j - 1, i]) if is3d else 0.0
    else:
        vx = 0.25 * (u[b, 0, k, j, i] + u[b, 0, k - 1, j, i] +
                     u[b, 0, k, j, i + 1] + u[b, 0, k - 1, j, i + 1])
        vy = 0.25 * (u[b, 1, k, j, i] + u[b, 1, k - 1, j, i] +
                     u[b, 1, k, j + 1, i] + u[b, 1, k - 1, j + 1, i])
        vz = u[b, 2, k, j, i]
    return np.array([vx, vy, vz])


def semi_lagrange_euler_mac(dt, u, flags):
    """Manta 'euler' MAC self-advection (border zeroed)."""
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    out = np.zeros_like(u)
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    for c in range(C):
                        v = get_at_mac(u, c, b, k, j, i)
                        pos = (i + 0.5 - v[0] * dt, j + 0.5 - v[1] * dt,
                               k + 0.5 - v[2] * dt)
                        out[b, c, k, j, i] = interpol(u, pos, b, c)
    return out


def jacobi_iteration(p_prev, flags, div):
    """One Jacobi sweep (generic/tfluids.cu:1765-1821)."""
    B, _, Z, Y, X = p_prev.shape
    is3d = Z > 1
    out = np.zeros_like(p_prev)
    fg = flags[:, 0]
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    if is_obstacle(fg[b, k, j, i]):
                        continue
                    pc = p_prev[b, 0, k, j, i]

                    def nb(kk, jj, ii):
                        if is_obstacle(fg[b, kk, jj, ii]):
                            return pc
                        return p_prev[b, 0, kk, jj, ii]

                    tot = (nb(k, j, i - 1) + nb(k, j, i + 1) +
                           nb(k, j - 1, i) + nb(k, j + 1, i))
                    if is3d:
                        tot += nb(k - 1, j, i) + nb(k + 1, j, i)
                    denom = 6.0 if is3d else 4.0
                    out[b, 0, k, j, i] = (tot + div[b, 0, k, j, i]) / denom
    return out


def random_flags(rng, shape, p_obstacle=0.2, border=True):
    """Random fluid/obstacle flags with an obstacle border."""
    B, _, Z, Y, X = shape
    is3d = Z > 1
    f = np.where(rng.random((B, 1, Z, Y, X)) < p_obstacle, OBSTACLE, FLUID)
    if border:
        f[..., 0, :] = OBSTACLE
        f[..., -1, :] = OBSTACLE
        f[..., :, 0] = OBSTACLE
        f[..., :, -1] = OBSTACLE
        if is3d:
            f[:, :, 0] = OBSTACLE
            f[:, :, -1] = OBSTACLE
    return f.astype(np.int32)


def _clamp_int(v, lo, hi):
    return max(lo, min(hi, int(v)))


def _do_clamp_component(grid_upper, dst, orig, fwd_val, pos, vel, b, c=0):
    """doClampComponent semantics (corner min/max around pos -/+ vel)."""
    Z, Y, X = orig.shape[2:]
    is3d = Z > 1
    mn, mx = np.inf, -np.inf
    for sign in (-1, 1):
        px = pos[0] + sign * vel[0]
        py = pos[1] + sign * vel[1]
        pz = pos[2] + sign * vel[2]
        i0 = _clamp_int(np.trunc(px), 0, grid_upper[0] - 1)
        j0 = _clamp_int(np.trunc(py), 0, grid_upper[1] - 1)
        if is3d:
            k0 = _clamp_int(np.trunc(pz), 0, grid_upper[2] - 1)
            k1 = k0 + 1
        else:
            k0 = _clamp_int(np.trunc(pz), 0, 1)
            k1 = k0
        for kk in ({k0, k1} if is3d else {k0}):
            for jj in (j0, j0 + 1):
                for ii in (i0, i0 + 1):
                    v = orig[b, c, kk, jj, ii]
                    mn, mx = min(mn, v), max(mx, v)
    return max(mn, min(mx, dst))


def maccormack_scalar_manta(dt, s, u, flags, strength):
    """Manta 'maccormack' scalar advection."""
    B, _, Z, Y, X = s.shape
    is3d = u.shape[1] == 3
    fg = flags[:, 0]
    cent = get_centered(u)
    fwd = semi_lagrange_euler_scalar(dt, s, u, flags)
    bwd = semi_lagrange_euler_scalar(-dt, fwd, u, flags)
    dst = fwd.copy()
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if is_fluid(fg[b, k, j, i]):
                        dst[b, 0, k, j, i] += strength * 0.5 * (
                            s[b, 0, k, j, i] - bwd[b, 0, k, j, i])
    grid_upper = (X - 1, Y - 1, Z - 1)
    out = dst.copy()
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    vel = cent[b, :, k, j, i] * dt
                    val = _do_clamp_component(
                        grid_upper, dst[b, 0, k, j, i], s,
                        fwd[b, 0, k, j, i], (i, j, k), vel, b)
                    # Revert to fwd when lookups leave grid / hit obstacles.
                    bad = False
                    for sign in (-1, 1):
                        px = int(np.trunc(i + 0.5 + sign * vel[0]))
                        py = int(np.trunc(j + 0.5 + sign * vel[1]))
                        pz = int(np.trunc(k + 0.5 + sign * vel[2]))
                        if (px < 0 or py < 0 or pz < 0 or px > X - 1 or
                                py > Y - 1 or (is3d and pz > Z - 1)):
                            bad = True
                        elif is_obstacle(fg[b, min(pz, Z - 1), py, px]):
                            bad = True
                    out[b, 0, k, j, i] = fwd[b, 0, k, j, i] if bad else val
    return out


def maccormack_mac_manta(dt, u, flags, strength):
    """Manta 'maccormack' MAC self-advection."""
    B, C, Z, Y, X = u.shape
    is3d = C == 3
    fg = flags[:, 0]
    fwd = semi_lagrange_euler_mac(dt, u, flags)
    # Backward step advects fwd by the ORIGINAL velocity field.
    bwd = np.zeros_like(u)
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    for c in range(C):
                        v = get_at_mac(u, c, b, k, j, i)
                        pos = (i + 0.5 + v[0] * dt, j + 0.5 + v[1] * dt,
                               k + 0.5 + v[2] * dt)
                        bwd[b, c, k, j, i] = interpol(fwd, pos, b, c)
    dst = np.zeros_like(u)
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    cf = is_fluid(fg[b, k, j, i])
                    for c in range(C):
                        skip = not cf
                        if c == 0 and i > 0 and not is_fluid(fg[b, k, j, i - 1]):
                            skip = True
                        if c == 1 and j > 0 and not is_fluid(fg[b, k, j - 1, i]):
                            skip = True
                        if c == 2 and is3d and k > 0 and \
                                not is_fluid(fg[b, k - 1, j, i]):
                            skip = True
                        if skip:
                            dst[b, c, k, j, i] = fwd[b, c, k, j, i]
                        else:
                            dst[b, c, k, j, i] = fwd[b, c, k, j, i] + \
                                strength * 0.5 * (u[b, c, k, j, i] -
                                                  bwd[b, c, k, j, i])
    grid_upper = (X - 1, Y - 1, Z - 1)
    out = dst.copy()
    for b in range(B):
        for k in range(Z):
            for j in range(Y):
                for i in range(X):
                    if (i < 1 or i > X - 2 or j < 1 or j > Y - 2 or
                            (is3d and (k < 1 or k > Z - 2))):
                        continue
                    for c in range(C):
                        vel = get_at_mac(u, c, b, k, j, i) * dt
                        out[b, c, k, j, i] = _do_clamp_component(
                            grid_upper, dst[b, c, k, j, i], u,
                            fwd[b, c, k, j, i], (i, j, k), vel, b, c)
    return out
