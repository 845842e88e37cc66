"""Regenerates the stored golden fixtures (run from the repo root on CPU).

The reference pins op outputs against binary frames from mantaflow
(test_tfluids.lua loadMantaBatch); our fixtures pin the validated JAX ops
(they match the loop-based NumPy oracle — tests/test_ops_golden.py) so
regressions in vectorization/kernels are caught cheaply.
"""
import os

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from fluidnet_tpu.ops.advect import advect_scalar, advect_vel  # noqa: E402
from fluidnet_tpu.ops.boundary import set_wall_bcs  # noqa: E402
from fluidnet_tpu.ops.divergence import velocity_divergence  # noqa: E402
from fluidnet_tpu.ops.forces import (add_buoyancy, add_gravity,  # noqa: E402
                                     vorticity_confinement)
from fluidnet_tpu.ops.sdf import rectangular_blur, signed_distance_field  # noqa: E402
from fluidnet_tpu.ops.velocity_update import velocity_update  # noqa: E402
from fluidnet_tpu.solvers.cg import solve_pcg  # noqa: E402
from fluidnet_tpu.solvers.jacobi import solve_jacobi  # noqa: E402

from tests import reference_impl as ref  # noqa: E402

HERE = os.path.dirname(__file__)


def main():
    rng = np.random.default_rng(1234)
    out = {}
    for tag, is3d in (("2d", False), ("3d", True)):
        if is3d:
            B, Z, Y, X, C = 2, 6, 8, 10, 3
        else:
            B, Z, Y, X, C = 2, 1, 12, 10, 2
        flags = ref.random_flags(rng, (B, 1, Z, Y, X), 0.2)
        u = rng.standard_normal((B, C, Z, Y, X)).astype(np.float32)
        s = rng.random((B, 1, Z, Y, X)).astype(np.float32)
        g = np.array([0.4, -1.0, 0.3], np.float32)
        fj, uj, sj = jnp.asarray(flags), jnp.asarray(u), jnp.asarray(s)
        out[f"{tag}/flags"] = flags
        out[f"{tag}/u"] = u
        out[f"{tag}/s"] = s
        out[f"{tag}/set_wall_bcs"] = np.asarray(set_wall_bcs(uj, fj))
        out[f"{tag}/divergence"] = np.asarray(velocity_divergence(uj, fj))
        out[f"{tag}/velocity_update"] = np.asarray(
            velocity_update(uj, fj, sj))
        out[f"{tag}/buoyancy"] = np.asarray(add_buoyancy(uj, fj, sj, g, 0.13))
        out[f"{tag}/gravity"] = np.asarray(add_gravity(uj, fj, g, 0.13))
        out[f"{tag}/vort"] = np.asarray(vorticity_confinement(uj, fj, 0.6))
        out[f"{tag}/sdf"] = np.asarray(signed_distance_field(fj, 3))
        out[f"{tag}/blur"] = np.asarray(rectangular_blur(sj, 2, is3d))
        for m in ("euler", "maccormack", "eulerOurs", "maccormackOurs"):
            out[f"{tag}/advect_s_{m}"] = np.asarray(
                advect_scalar(0.3, sj, uj, fj, method=m, window=None))
            out[f"{tag}/advect_u_{m}"] = np.asarray(
                advect_vel(0.25, uj, fj, method=m, window=None))
        div = velocity_divergence(set_wall_bcs(uj, fj), fj)
        out[f"{tag}/jacobi_p"] = np.asarray(
            solve_jacobi(fj, div, p_tol=0.0, max_iter=40)[0])
        out[f"{tag}/pcg_p"] = np.asarray(
            solve_pcg(fj, div, tol=1e-5, max_iter=120)[0])
    path = os.path.join(HERE, "fixtures", "golden_ops.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("wrote", path, os.path.getsize(path), "bytes,", len(out), "arrays")


if __name__ == "__main__":
    main()
