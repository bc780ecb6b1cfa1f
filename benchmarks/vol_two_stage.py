"""Two-stage synthetic volumetric training — the recipe that converges.

Mirrors the reference's volumetric workflow (train/human36m_vol_softmax.yaml
initializes model.backbone from a PRETRAINED 2D pose net;
/root/reference/train.py:406-413).  From-scratch vol training on the
synthetic set plateaus at the cuboid-centroid floor (~330-380 mm rel MPJPE;
r4 sweep: CE weight 0.01/0.1/1.0, lr 1e-3/3e-3; r5: 12-24-epoch runs) —
the stage-1 backbone plus the dense-CE stage-2 recipe below is what breaks
through it (measured r5 trajectory in ROADMAP.md "Volumetric training
recipe": CE 10.4 -> ~2, val 368 -> 160 mm by epoch 92 at 256 samples,
then further with 1024).

Stage 1: 2D-heatmap-supervised backbone (benchmarks/pretrain_backbone_2d)
         -> compact f16 .npz fixture.
Stage 2: experiments/synthetic/vol_pretrain.yaml from that backbone with
         the synthetic-domain recipe: volumetric CE weight 1.0, fresh-subnet
         LRs 5e-3, GT pelvis — a fresh V2V first learns the pose prior,
         then couples to image evidence around epoch ~25-30 (the phase
         transition is visible as train MAE falling 15 -> <5).

    python benchmarks/vol_two_stage.py [bb_steps] [vol_epochs] [n_samples]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from benchmarks import export_backbone_fixture  # noqa: F401 (CLI twin)
    from benchmarks.pretrain_backbone_2d import main as pretrain_main
    from lt_tpu.engine import checkpoint as ckpt
    from lt_tpu.engine.train import run
    from lt_tpu.utils import fixture

    bb_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    vol_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_samples = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    bb_dir = tempfile.mkdtemp(prefix="two_stage_bb_")
    pretrain_main(n_steps=bb_steps, out_dir=bb_dir)
    raw = ckpt.restore_raw(ckpt.resolve_checkpoint_dir(bb_dir))
    bb_npz = os.path.join(bb_dir, "backbone.npz")
    fixture.save_backbone_npz(bb_npz, raw["params"]["backbone"],
                              raw["batch_stats"]["backbone"])
    print(f"STAGE1 backbone fixture: {bb_npz}", flush=True)

    vol_dir = tempfile.mkdtemp(prefix="two_stage_vol_")
    m_vol = run("experiments/synthetic/vol_pretrain.yaml", vol_dir,
                overrides={
                    "model.backbone.init_weights": True,
                    "model.backbone.checkpoint": bb_npz,
                    "opt.volumetric_ce_loss_weight": 1.0,
                    "opt.volume_net_lr": 5e-3,
                    "opt.process_features_lr": 5e-3,
                    "model.use_gt_pelvis": True,
                    "dataset.train.n_samples": n_samples,
                    "opt.n_epochs": vol_epochs,
                })
    print(f"STAGE2 vol MPJPE rel = {m_vol:.1f} mm "
          f"(voxel pitch {2500.0 / 31:.1f} mm)", flush=True)
    print("VOL_DIR", vol_dir, flush=True)


if __name__ == "__main__":
    main()
