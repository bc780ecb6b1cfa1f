"""Two-stage synthetic training: alg_tiny backbone -> vol_tiny.

Mirrors the reference's volumetric workflow (train/human36m_vol_softmax.yaml
initializes model.backbone from a PRETRAINED algebraic checkpoint;
/root/reference/train.py:406-413): from-scratch vol training on the tiny
synthetic set plateaus around 380 mm MPJPE (measured r4 sweep: CE weight
0.01/0.1/1.0 and lr 1e-3/3e-3 all plateau), while an alg-pretrained
backbone gives the unprojection peaked heatmaps to lift.

    python benchmarks/vol_two_stage.py [alg_epochs] [vol_epochs]
"""

from __future__ import annotations

import os
import sys
import tempfile

import yaml

sys.path.insert(0, ".")


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lt_tpu.engine.train import run

    alg_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    vol_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    with open("experiments/synthetic/alg_pretrain.yaml") as f:
        acfg = yaml.safe_load(f)
    acfg["opt"]["n_epochs"] = max(alg_epochs, acfg["opt"]["n_epochs"])
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        yaml.safe_dump(acfg, f)
        alg_cfg = f.name

    alg_dir = tempfile.mkdtemp(prefix="two_stage_alg_")
    m_alg = run(alg_cfg, alg_dir, max_epochs=alg_epochs)
    print(f"STAGE1 alg MPJPE rel = {m_alg:.1f} mm", flush=True)
    exp = next(os.path.join(alg_dir, d) for d in os.listdir(alg_dir)
               if os.path.isdir(os.path.join(alg_dir, d)))

    with open("experiments/synthetic/vol_tiny.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["opt"]["n_epochs"] = max(vol_epochs, cfg["opt"]["n_epochs"])
    cfg["model"]["backbone"]["init_weights"] = True
    cfg["model"]["backbone"]["checkpoint"] = exp
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        yaml.safe_dump(cfg, f)
        vol_cfg = f.name

    vol_dir = tempfile.mkdtemp(prefix="two_stage_vol_")
    m_vol = run(vol_cfg, vol_dir, max_epochs=vol_epochs)
    print(f"STAGE2 vol MPJPE rel = {m_vol:.1f} mm "
          f"(voxel pitch {2500.0 / 31:.1f} mm)", flush=True)
    print("VOL_DIR", vol_dir, flush=True)


if __name__ == "__main__":
    main()
