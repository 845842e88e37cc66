"""Round-3 north-star evidence: matched-cost divergence residual.

Two settings, mirroring the reference's stability protocol
(torch/fluid_net_train.lua:270-277 + fluid_net_3d_sim.lua:80 — Jacobi/PCG
capped at maxIter=34 to match the ConvNet's runtime):

  A. 64^3 gen3d test scenes, 64-step rollouts restarted from PCG-projected
     states (calc_stats.lua:99-118 semantics): ||div||_2 per step for
     convnet / convnet+polish{8,16} / jacobi-34 / pcg-34.
  B. the 128^3 bench plume (the driver's headline scene): same methods,
     128 steps, ||div||_2 at checkpoints + max|U| blow-up check.

Writes TSVs + a comparison figure to docs/figures/ (norm_div_{TAG}_*).

Usage: python scripts/eval_r3_final.py [model_ckpt] [--quick]
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

MODEL = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") \
    else "data/models/m3d_v5_bestRollout"
QUICK = "--quick" in sys.argv
FIGD = "docs/figures"
TAG = os.environ.get("EVAL_TAG", "r4")


def main():
    from fluidnet_tpu.core.grids import FluidState, empty_domain
    from fluidnet_tpu.data.dataset import FluidDataset
    from fluidnet_tpu.models.fluidnet import apply_model
    from fluidnet_tpu.ops.divergence import velocity_divergence
    from fluidnet_tpu.sim.simulate import create_plume_bcs, simulate
    from fluidnet_tpu.train.train import init_train_state
    from fluidnet_tpu.utils.checkpoint import load_checkpoint, load_mconf
    from fluidnet_tpu.utils.stats import calc_stats

    mconf0 = load_mconf(MODEL)
    tmpl = init_train_state(jax.random.PRNGKey(0), mconf0)
    tstate, mconf0, _ = load_checkpoint(MODEL, tmpl)
    params = tstate.params
    print(f"model: {MODEL}")

    methods = [("convnet", dict(sim_method="convnet", polish_iters=0)),
               ("convnet+p8", dict(sim_method="convnet", polish_iters=8)),
               ("convnet+p16", dict(sim_method="convnet", polish_iters=16)),
               ("jacobi34", dict(sim_method="jacobi", max_iter=34)),
               ("pcg34", dict(sim_method="pcg", max_iter=34))]

    # --- A: 64^3 test-scene rollouts -------------------------------------
    ds_name = next((d for d in ("gen3d_v5", "gen3d_v4", "gen3d_v3")
                    if os.path.isdir(os.path.join("data/datasets", d))),
                   "gen3d_v5")
    ds = FluidDataset("data/datasets", ds_name, "te")
    batch = ds.get_batch(list(range(4 if QUICK else 8)))
    n_steps = 32 if QUICK else 64
    curves = {}
    for name, kw in methods:
        mc = mconf0.replace(**kw)
        model_fn = None
        if kw["sim_method"] == "convnet":
            def model_fn(pr, p, u, f, mc=mc, **kw):
                return apply_model(pr, mc, p, u, f, **kw)
        arr = calc_stats([batch], mc, model_fn, params, n_steps=n_steps,
                         out_path=os.path.join(
                             FIGD, f"norm_div_{TAG}_{name}.tsv"))
        curves[name] = arr.mean(axis=0)
        print(f"A {name:12s} ||div|| step1 {arr[:, 0].mean():.4e}  "
              f"mid {arr[:, n_steps // 2].mean():.4e}  "
              f"final {arr[:, -1].mean():.4e}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for name, c in curves.items():
            ax.semilogy(np.arange(1, len(c) + 1), c, label=name)
        ax.set_xlabel("rollout step")
        ax.set_ylabel(r"mean $\|\mathrm{div}(U)\|_2$")
        ax.set_title("Matched-cost rollout stability (64$^3$ test scenes)")
        ax.legend()
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(FIGD, f"norm_div_{TAG}_compare.png"), dpi=120)
        print("figure:", os.path.join(FIGD, f"norm_div_{TAG}_compare.png"))
    except Exception as e:  # matplotlib optional
        print("figure skipped:", e)

    # --- B: the 128^3 bench plume ----------------------------------------
    R = 64 if QUICK else 128
    n128 = 32 if QUICK else 128
    B, Z, Y, X = 1, R, R, R
    flags = empty_domain((B, 1, Z, Y, X), True)
    state0 = FluidState(
        u=jnp.zeros((B, 3, Z, Y, X), jnp.float32),
        p=jnp.zeros((B, 1, Z, Y, X), jnp.float32),
        flags=flags, density=jnp.zeros((B, 1, Z, Y, X), jnp.float32))
    bcs = create_plume_bcs(state0, [1.0], u_scale=0.6, rad=0.15)
    marks = sorted({1, n128 // 4, n128 // 2, n128})
    rows = []
    for name, kw in methods:
        mc = mconf0.replace(sim_method=kw["sim_method"],
                            polish_iters=kw.get("polish_iters", 0),
                            max_iter=kw.get("max_iter", mconf0.max_iter),
                            buoyancy_scale=2.0,
                            vorticity_confinement_amp=3.0, dt=0.1,
                            maccormack_strength=0.6,
                            advection_method="maccormackOurs",
                            adaptive_window=False, advection_window=1)
        model_fn = None
        if kw["sim_method"] == "convnet":
            def model_fn(pr, p, u, f, mc=mc, **kw):
                return apply_model(pr, mc, p, u, f, **kw)
        step = jax.jit(lambda s, mc=mc, mf=model_fn: simulate(
            s, mc, mf, params, bcs))
        s = state0
        vals = {}
        for i in range(1, n128 + 1):
            s = step(s)
            if i in marks:
                div = velocity_divergence(s.u, s.flags)
                vals[i] = float(jnp.sqrt(jnp.sum(div ** 2)))
        umax = float(jnp.abs(s.u).max())
        rows.append((name, vals, umax))
        print(f"B {name:12s} " +
              "  ".join(f"s{i}:{vals[i]:.3e}" for i in marks) +
              f"  max|U| {umax:.3e}")
    with open(os.path.join(FIGD, f"norm_div_{TAG}_plume128.tsv"), "w") as f:
        f.write("method\t" + "\t".join(f"step{i}" for i in marks) +
                "\tmaxU\n")
        for name, vals, umax in rows:
            f.write(name + "\t" +
                    "\t".join(f"{vals[i]:.6e}" for i in marks) +
                    f"\t{umax:.6e}\n")
    print("wrote", os.path.join(FIGD, f"norm_div_{TAG}_plume128.tsv"))


if __name__ == "__main__":
    main()
