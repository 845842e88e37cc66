"""Headline benchmark: 3-D 128^3 smoke step loop (advect + CNN project).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline derivation (BASELINE.md / SURVEY.md §6): the reference records no
direct 3-D wall clock, but it records the 2-D default model's projection at
0.948 ms / 244 MFLOP at 128^2 (myModel2D_mconf.txt:17-18) => ~257 GFLOP/s
achieved on the authors' GTX 1080/Titan-class GPU. The 3-D default model
(8-8-8-8-1, k3) at 128^3 is ~16.9 GFLOP/frame (fluidnet_tpu.utils.flops),
giving ~66 ms for the projection alone, plus advection/forces at a
comparable memory-bound cost — i.e. <= ~13 steps/s for the full
advect+project loop on the reference stack. We use 13 steps/s as the
reference baseline; vs_baseline is our steps/s over that. The driver's
north star is vs_baseline >= 50.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 13.0
RES = 128
N_STEPS = 30


def main():
    from fluidnet_tpu.core.config import ModelConfig
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state

    # Fixed W=1 window (adaptive_window=False): the production smoke
    # config. The +-1-cell displacement clamp is the same CFL bound the
    # reference imposes via its velocity clamp (simulate.lua:326); the
    # adaptive W=1/W=2 dispatch (the library default) costs ~0.85 ms/step
    # in cond operand copies and only matters past CFL 1.
    mconf = ModelConfig(
        is_3d=True, sim_method="convnet", dt=0.1,
        buoyancy_scale=2.0, vorticity_confinement_amp=3.0,
        maccormack_strength=0.6, advection_method="maccormackOurs",
        adaptive_window=False, advection_window=1)
    params = init_train_state(jax.random.PRNGKey(0), mconf).params

    B, Z, Y, X = 1, RES, RES, RES
    flags = empty_domain((B, 1, Z, Y, X), True)
    state = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags,
        density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state, [1.0], u_scale=0.6, rad=0.15)

    def model_fn(pr, p, u, f):
        return apply_model(pr, mconf, p, u, f)

    # NOTE: params/bcs are jit ARGUMENTS — closing over large device arrays
    # embeds them as XLA constants, which wrecks compile AND run time.
    # Donating the state lets XLA reuse its buffers for the output state
    # (the loop never reuses the old state), saving allocs + copies.
    #
    # The N_STEPS step loop runs as ONE on-device lax.scan (sim.rollout) —
    # the production rollout path. Dispatching every step from the host
    # costs ~1.3 ms/step on this host (a quarter of the device step time);
    # the reference's own harness amortizes its launch overhead the same
    # way (768 frames in one process, fluid_net_3d_sim.lua:261) and CUDA
    # launches are asynchronous. steps/s here = full simulate() steps
    # (advect+forces+CNN project) per second of wall time, fenced by a
    # device->host materialization of the final state.
    from fluidnet_tpu.sim.simulate import rollout
    roll = jax.jit(lambda s, prm, b: rollout(
        s, mconf, N_STEPS, model_fn, prm, b), donate_argnums=0)

    # Compile + warmup (materialize: see fence note below).
    state = roll(state, params, bcs)
    _ = np.asarray(state.u[0, 0, 0, :4])

    t0 = time.perf_counter()
    REPS = 4
    for _ in range(REPS):
        state = roll(state, params, bcs)
    # Force a real device->host round trip: on this backend
    # block_until_ready returns before execution finishes, so a tiny
    # materialization is the only trustworthy fence.
    _ = np.asarray(state.u[0, 0, 0, :4])
    dt = (time.perf_counter() - t0) / (N_STEPS * REPS)
    assert bool(np.isfinite(np.asarray(state.u)).all()), "sim blew up"

    steps_per_sec = 1.0 / dt
    print(json.dumps({
        "metric": "3d_128_smoke_steps_per_sec_advect_plus_cnn_project",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
