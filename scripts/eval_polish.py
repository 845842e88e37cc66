"""Quick matched-cost residual experiment: convnet / convnet+polish-N /
jacobi-34 / pcg-34 rollout ||div|| on gen3d_v3 test scenes."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from fluidnet_tpu.data.dataset import FluidDataset
from fluidnet_tpu.models.fluidnet import apply_model
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf
from fluidnet_tpu.utils.stats import calc_stats

MODEL = sys.argv[1] if len(sys.argv) > 1 else "data/models/m3d_v3_bestRollout"
N_STEPS = int(os.environ.get("N_STEPS", "64"))

ds = FluidDataset("data/datasets", "gen3d_v3", "te")
batch = ds.get_batch(list(range(4)))

mconf = load_mconf(MODEL)
tmpl = init_train_state(jax.random.PRNGKey(0), mconf)
tstate, mconf, _ = load_checkpoint(MODEL, tmpl)
params = tstate.params

runs = [("convnet", dict(sim_method="convnet", polish_iters=0)),
        ("convnet+p4", dict(sim_method="convnet", polish_iters=4)),
        ("convnet+p8", dict(sim_method="convnet", polish_iters=8)),
        ("convnet+p16", dict(sim_method="convnet", polish_iters=16)),
        ("convnet+p34", dict(sim_method="convnet", polish_iters=34)),
        ("jacobi34", dict(sim_method="jacobi", max_iter=34)),
        ("pcg34", dict(sim_method="pcg", max_iter=34))]

for name, kw in runs:
    mc = mconf.replace(**kw)
    model_fn = None
    if kw["sim_method"] == "convnet":
        def model_fn(pr, p, u, f, mc=mc, **kw):
            return apply_model(pr, mc, p, u, f, **kw)
    arr = calc_stats([batch], mc, model_fn, params, n_steps=N_STEPS)
    print(f"{name:14s} ||div|| step1 {arr[:, 0].mean():.4e}  "
          f"mid {arr[:, N_STEPS // 2].mean():.4e}  "
          f"final {arr[:, -1].mean():.4e}")
