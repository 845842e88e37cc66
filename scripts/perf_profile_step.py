"""Capture a device trace of the 128^3 headline step for op attribution.

Writes a jax.profiler trace under /tmp/fluidnet_trace; prints the
aggregate per-op device times parsed from the trace's .xplane.pb if
tensorboard tooling is available, else just records the trace for manual
inspection. Run on the real chip.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp


def main():
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state

    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs")
    params = init_train_state(jax.random.PRNGKey(0), mconf).params
    R = 128
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags,
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)
    step = jax.jit(lambda s, prm, b: simulate(s, mconf, model_fn=lambda
                                              pr, p, u, f: apply_model(
                                                  pr, mconf, p, u, f),
                                              params=prm, bcs=b))
    for _ in range(3):
        state = step(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])

    trace_dir = "/tmp/fluidnet_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            state = step(state, params, bcs)
        _ = np.asarray(state.u[0, 0, 0, :4])
    print("trace written to", trace_dir)

    # Best-effort summarize: find the largest .xplane.pb and count op time.
    import glob
    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True),
                 key=os.path.getsize)
    print("xplane files:", [os.path.basename(p) for p in pbs])


if __name__ == "__main__":
    main()
