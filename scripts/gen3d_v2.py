"""Generates the widened 3-D training dataset (gen3d_v2).

Round-2 lesson: 16 train scenes destabilize the unrolled long-term loss —
the net fits the narrow scene distribution while its rollouts drift
(te one-step loss rises from epoch ~4 regardless of LR decay). The
reference trains on 320 scenes (output_current_model_sphere); this widens
scene diversity 3x at the same byte budget by saving every 2nd frame
(adjacent frames are nearly duplicates for the one-step task anyway).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidnet_tpu.data.generate import generate_dataset

if __name__ == "__main__":
    root = "data/datasets/gen3d_v2"
    generate_dataset(root, n_tr=48, n_te=8, seed=11,
                     size_xyz=(64, 64, 64), is_3d=True, n_frames=32,
                     save_every=2, max_iter=300)
    print("done:", root)
