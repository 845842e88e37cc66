"""gen3d_v3: maximum scene diversity at the device-cache byte budget.

Round-2 finding: 128-step rollout stability tracks scene diversity (the
reference's released models train on 320 scenes x 256 frames; 16- and
48-scene sets yield one-step-excellent models whose free-decay rollouts
ignite after ~30 steps). 112 train scenes x every-4th-frame sampling
(~9 GB) is the most geometry diversity that still fits the HBM dataset
cache next to a 'last'-mode training step.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidnet_tpu.data.generate import generate_dataset

if __name__ == "__main__":
    root = "data/datasets/gen3d_v3"
    generate_dataset(root, n_tr=112, n_te=8, seed=17,
                     size_xyz=(64, 64, 64), is_3d=True, n_frames=32,
                     save_every=4, max_iter=300)
    print("done:", root)
