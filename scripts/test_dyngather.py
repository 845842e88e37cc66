"""Probe: does Mosaic lower take_along_axis / dynamic gathers in Pallas
TPU kernels on this chip? Tests lane-dim and sublane-dim gathers."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def k_lane(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=1)


def k_sublane(src_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(src_ref[:], idx_ref[:], axis=0)


def run(kern, name):
    src = jax.random.normal(jax.random.PRNGKey(0), (128, 128), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (128, 128), 0, 128)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)
        ref = np.take_along_axis(np.asarray(src), np.asarray(idx),
                                 axis=1 if kern is k_lane else 0)
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: COMPILES, correct={ok}")
    except Exception as e:
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    run(k_lane, "lane gather (axis=1)")
    run(k_sublane, "sublane gather (axis=0)")
