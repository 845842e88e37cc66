"""Generates the 3-D training dataset (gen3d) with the built-in PCG solver."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidnet_tpu.data.generate import generate_dataset

if __name__ == "__main__":
    root = "data/datasets/gen3d"
    generate_dataset(root, n_tr=16, n_te=4, seed=7,
                     size_xyz=(64, 64, 64), is_3d=True, n_frames=32,
                     max_iter=300)
    print("done:", root)
