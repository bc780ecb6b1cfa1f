"""Two-stage recipe probe: 2D-heatmap backbone pretrain -> vol fine-tune.

The reference never trains the volumetric model from a random backbone —
it chains from a pretrained 2D pose net (/root/reference/train.py:406-413,
pose_resnet.py:321-377).  This script measures the synthetic-domain
equivalent end to end on the TPU chip:

  stage 1: benchmarks/pretrain_backbone_2d.py (Gaussian 2D supervision)
  stage 2: vol_tiny fine-tune from that backbone checkpoint

    python benchmarks/vol_from_2d.py [pretrain_steps] [vol_epochs]

Prints STAGE1 argmax error and STAGE2 val MPJPE.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    pre_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    vol_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    from benchmarks.pretrain_backbone_2d import main as pretrain

    bb_dir = tempfile.mkdtemp(prefix="vol_from_2d_bb_")
    pretrain(pre_steps, bb_dir)

    from lt_tpu.engine.train import run

    vol_dir = tempfile.mkdtemp(prefix="vol_from_2d_vol_")
    metric = run("experiments/synthetic/vol_tiny.yaml", vol_dir,
                 max_epochs=vol_epochs,
                 overrides={"model.backbone.init_weights": True,
                            "model.backbone.checkpoint": bb_dir})
    print(f"STAGE2 vol MPJPE rel = {metric:.1f} mm "
          f"(voxel pitch {2500.0 / 31:.1f} mm)", flush=True)
    print("BB_DIR", bb_dir, flush=True)
    print("VOL_DIR", vol_dir, flush=True)


if __name__ == "__main__":
    main()
