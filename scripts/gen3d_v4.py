"""gen3d_v4: wide scene diversity for rollout-stable 3-D training.

v3 finding: 128-step rollout stability tracks scene diversity; v3 (112
scenes x 8 frames) still destabilized after epoch ~4. v4 doubles scene
count and widens per-scene dynamics:
  - 256 train scenes (reference: 320, README.md:169-179), 8-scene
    batched generation (generate_run_batch) so the chip stays busy;
  - 48-frame rollouts sampled every 8th frame (6 well-decorrelated
    states per scene, incl. late free-decay/plume states);
  - per-batch random vorticity confinement amp (new in v4) + buoyancy +
    plume radius, matching the bench/demo force ranges;
  - targets are not device-cached under div-only losses (cli/train.py),
    so the sample budget doubles at the same HBM cache size:
    1632 samples x 6.3 MB ~= 10.3 GB.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluidnet_tpu.data.generate import generate_dataset

if __name__ == "__main__":
    root = "data/datasets/gen3d_v4"
    generate_dataset(root, n_tr=256, n_te=16, seed=23, scenes_per_batch=8,
                     size_xyz=(64, 64, 64), is_3d=True, n_frames=48,
                     save_every=8, max_iter=300)
    print("done:", root)
