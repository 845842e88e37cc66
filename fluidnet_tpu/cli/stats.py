"""Long-horizon divergence stability stats CLI.

Equivalent of the calcStats path in fluid_net_train.lua:268-295: restart
rollouts from ground-truth test frames with the chosen projections and
record ||div(U)|| per step; writes TSVs and the comparison figure
(PrettyPlotNormDiv.m's plot).

  python -m fluidnet_tpu.cli.stats --dataset gen2d --model data/models/m2d \\
      --methods convnet jacobi pcg --n_steps 128 --max_iter 34
"""

import argparse
import os

import numpy as np

import jax

from fluidnet_tpu.data.dataset import FluidDataset
from fluidnet_tpu.models.fluidnet import apply_model
from fluidnet_tpu.train.train import init_train_state
from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf
from fluidnet_tpu.utils.plots import plot_norm_div
from fluidnet_tpu.utils.stats import calc_stats


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="data/datasets")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--model", default="", help="checkpoint dir (needed for "
                    "the convnet method)")
    ap.add_argument("--methods", nargs="+",
                    default=["convnet", "jacobi", "pcg"])
    ap.add_argument("--n_steps", type=int, default=128)
    ap.add_argument("--n_samples", type=int, default=8)
    ap.add_argument("--max_iter", type=int, default=34,
                    help="matched-cost solver iterations "
                    "(fluid_net_3d_sim.lua:80)")
    ap.add_argument("--pcg_tol", type=float, default=1e-4,
                    help="pcg residual tolerance (pTol, default_conf.lua)")
    ap.add_argument("--polish_iters", type=int, default=0,
                    help="hybrid Jacobi polish sweeps for the convnet "
                    "method (ModelConfig.polish_iters)")
    ap.add_argument("--out_dir", default="data/output/stats")
    ap.add_argument("--dataset_stats", action="store_true",
                    help="instead of rollouts, dump per-field stats + "
                    "histograms of the dataset (data_binary.lua:265-354,"
                    "467-556)")
    args = ap.parse_args(argv)

    ds = FluidDataset(args.data_dir, args.dataset, "te")

    if args.dataset_stats:
        import json
        from fluidnet_tpu.utils.plots import plot_histogram
        os.makedirs(args.out_dir, exist_ok=True)
        st = ds.field_stats()
        print(json.dumps(st, indent=2))
        with open(os.path.join(args.out_dir, "dataset_stats.json"),
                  "w") as f:
            json.dump(st, f, indent=2)
        for field in ("u_div", "p_div", "density"):
            counts, edges = ds.histogram(field)
            out = os.path.join(args.out_dir, f"hist_{field}.png")
            plot_histogram(counts, edges, out, title=field)
            print("wrote", out)
        return

    batch = ds.get_batch(list(range(min(args.n_samples, len(ds)))))

    params = None
    if args.model:
        mconf = load_mconf(args.model)
        tmpl = init_train_state(jax.random.PRNGKey(0), mconf)
        tstate, mconf, _ = load_checkpoint(args.model, tmpl)
        params = tstate.params
    else:
        from fluidnet_tpu.core.config import ModelConfig
        mconf = ModelConfig(is_3d=ds.is_3d)

    os.makedirs(args.out_dir, exist_ok=True)
    stats = {}
    for method in args.methods:
        mc = mconf.replace(sim_method=method, max_iter=args.max_iter,
                           pcg_tol=args.pcg_tol,
                           polish_iters=(args.polish_iters
                                         if method == "convnet" else 0))
        model_fn = None
        if method == "convnet":
            if params is None:
                print("skipping convnet (no --model)")
                continue
            def model_fn(pr, p, u, f, **kw):
                return apply_model(pr, mc, p, u, f, **kw)
        arr = calc_stats([batch], mc, model_fn, params,
                         n_steps=args.n_steps)
        stats[method] = arr
        np.savetxt(os.path.join(args.out_dir, f"norm_div_{method}.tsv"),
                   arr, delimiter="\t")
        print(f"{method}: ||div|| mean {arr[:, -1].mean():.4e} at step "
              f"{args.n_steps}")
    fig = plot_norm_div(stats, os.path.join(args.out_dir,
                                            "norm_div_compare.png"))
    print("wrote", fig)


if __name__ == "__main__":
    main()
