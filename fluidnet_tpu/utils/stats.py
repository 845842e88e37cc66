"""Long-horizon divergence stability statistics.

Port of torch.calcStats (torch/lib/calc_stats.lua:23-124): restart the
simulation from a ground-truth frame, step it n times with a chosen
projection (convnet / jacobi / pcg), and record ||div(U)|| per step — the
paper's stability metric (plotted by PrettyPlotNormDiv.m). Returns the
(n_samples, n_steps) L2-norm array and writes an optional TSV.
"""

import numpy as np

import jax
import jax.numpy as jnp

from fluidnet_tpu.core.grids import FluidState
from fluidnet_tpu.ops.divergence import velocity_divergence
from fluidnet_tpu.sim.simulate import simulate


def calc_stats(batches, mconf, model_fn=None, params=None, n_steps=128,
               out_path=None):
    """batches: iterable of batch dicts (p_target/u_target/flags/density...).
    Each sample restarts from the TARGET (projected) state like the
    reference (calc_stats.lua:99-118)."""
    step = jax.jit(lambda s, prm: simulate(s, mconf, model_fn, prm))
    div_norms = []
    for batch in batches:
        state = FluidState(u=jnp.asarray(batch["u_target"]),
                           p=jnp.asarray(batch["p_target"]),
                           flags=jnp.asarray(batch["flags"]),
                           density=jnp.asarray(batch["density"])
                           if batch.get("density") is not None else None)
        b = state.u.shape[0]
        per_step = []
        for _ in range(n_steps):
            state = step(state, params)
            div = velocity_divergence(state.u, state.flags)
            norms = jnp.sqrt(jnp.sum(div.reshape(b, -1) ** 2, axis=1))
            per_step.append(np.asarray(norms))
        div_norms.append(np.stack(per_step, axis=1))  # (b, n_steps)
    out = np.concatenate(div_norms, axis=0)
    if out_path:
        np.savetxt(out_path, out, delimiter="\t")
    return out
