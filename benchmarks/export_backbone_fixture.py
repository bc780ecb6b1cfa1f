"""Export a trained backbone as a compact committed .npz fixture.

    python benchmarks/export_backbone_fixture.py <experiment_or_ckpt_dir> \
        <out.npz> [--drop-final-layer]

The source is an Orbax checkpoint (an experiment dir, its checkpoints/
subdir, or an epoch dir — resolve_checkpoint_dir semantics); the output is
the f16 .npz consumed by ``model.backbone.checkpoint: *.npz``
(lt_tpu/utils/fixture.py).  ``--drop-final-layer`` omits the final 1x1
heatmap conv (the volumetric model ignores it and the loader re-inits it,
pose_resnet.py:352-368 semantics) to shave fixture bytes.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out")
    ap.add_argument("--drop-final-layer", action="store_true")
    args = ap.parse_args()

    from lt_tpu.engine import checkpoint as ckpt
    from lt_tpu.utils import fixture

    raw = ckpt.restore_raw(ckpt.resolve_checkpoint_dir(args.src))
    params = dict(raw["params"]["backbone"])
    stats = dict(raw["batch_stats"]["backbone"])
    if args.drop_final_layer:
        params.pop("final_layer", None)
        stats.pop("final_layer", None)

    fixture.save_backbone_npz(args.out, params, stats)
    import os

    print(f"wrote {args.out}: {os.path.getsize(args.out) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
