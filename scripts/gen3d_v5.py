"""gen3d_v5: the v4 recipe (256 scenes x 64^3, 48-frame rollouts sampled
every 8th) with FULLY per-scene randomization under batching.

v4's batched generation drew buoyancy / vorticity / plume once per
8-scene batch, so 256 scenes carried only 32 independent force/plume
draws — cutting exactly the force-condition diversity the dataset exists
to provide (round-3 advisor finding). generate_run_batch now draws
per-scene (B,) buoyancy/vorticity scales (traced through the force ops)
and per-scene plume masks/speeds/radii, so every scene is an independent
draw while the chip still steps 8 scenes per jitted call.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidnet_tpu.data.generate import generate_dataset

if __name__ == "__main__":
    root = "data/datasets/gen3d_v5"
    generate_dataset(root, n_tr=256, n_te=16, seed=29, scenes_per_batch=8,
                     size_xyz=(64, 64, 64), is_3d=True, n_frames=48,
                     save_every=8, max_iter=300)
    print("done:", root)
