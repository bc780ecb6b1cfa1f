"""Visually inspect a Human3.6M (or synthetic) dataset sample-by-sample.

Headless equivalent of the reference's GUI stepper ``view-dataset.py``
(/root/reference/mvn/datasets/human36m_preprocessing/view-dataset.py:44-84):
projects GT 3D joints through each camera and writes skeleton-overlay PNGs
instead of opening cv2 windows (no display needed on TPU hosts).

Usage:
    python view_dataset.py --labels <labels.npy> --root <h36m_root> \
        --out /tmp/view --step 1000 [--n 10]
    python view_dataset.py --synthetic --out /tmp/view --n 5
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--labels")
    parser.add_argument("--root")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out", required=True)
    parser.add_argument("--step", type=int, default=1000)
    parser.add_argument("--n", type=int, default=10)
    parser.add_argument("--kind", default="human36m")
    args = parser.parse_args()

    from lt_tpu.utils import vis
    from lt_tpu.utils.img import denormalize_image

    if args.synthetic:
        from lt_tpu.data.synthetic import SyntheticMultiViewDataset

        dataset = SyntheticMultiViewDataset(n_samples=args.n * args.step or 16)
    else:
        from lt_tpu.data.human36m import Human36MMultiViewDataset

        dataset = Human36MMultiViewDataset(
            h36m_root=args.root, labels_path=args.labels, test=True,
            with_damaged_actions=True, kind=args.kind,
            image_shape=(384, 384))

    os.makedirs(args.out, exist_ok=True)
    import cv2

    for i in range(args.n):
        idx = (i * args.step) % len(dataset)
        sample = dataset[idx]
        kp3d = sample["keypoints_3d"][:, :3]
        panels = []
        for vi, image in enumerate(sample["images"]):
            if image is None:
                continue
            display = denormalize_image(image).astype(np.uint8)
            P = sample["proj_matrices"][vi]
            homo = np.hstack([kp3d, np.ones((len(kp3d), 1))])
            uvw = homo @ P.T
            uv = uvw[:, :2] / uvw[:, 2:3]
            panels.append(vis.draw_2d_pose_image(uv, display,
                                                 kind=args.kind))
        grid = np.concatenate(panels, axis=1)
        out_path = os.path.join(args.out, f"sample_{idx:06d}.png")
        cv2.imwrite(out_path, grid)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
