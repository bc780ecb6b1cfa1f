"""Undistort Human3.6M frames offline.

Equivalent of the reference's ``undistort-h36m.py``
(/root/reference/mvn/datasets/human36m_preprocessing/undistort-h36m.py):
for every (subject, camera) build the inverse-distortion sampling grid
(radial k1,k2,k3 + tangential p1,p2 — :61-76) once, then ``cv2.remap`` every
frame into ``imageSequence-undistorted/``, fanned out over processes.

Usage:
    python undistort.py <h36m_root> <labels.npy> [--processes N]
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np


def build_undistort_maps(K: np.ndarray, dist: np.ndarray, h: int, w: int):
    """Forward-distort a pixel grid so remap() samples the right sources."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = dist

    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    x = (xs - cx) / fx
    y = (ys - cy) / fy
    r2 = x * x + y * y
    radial = 1 + k1 * r2 + k2 * r2 ** 2 + k3 * r2 ** 3
    x_d = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    y_d = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    map_x = (x_d * fx + cx).astype(np.float32)
    map_y = (y_d * fy + cy).astype(np.float32)
    return map_x, map_y


def process_camera_dir(task):
    src_dir, dst_dir, K, dist = task
    import cv2

    names = sorted(n for n in os.listdir(src_dir) if n.endswith(".jpg"))
    if not names:
        return src_dir, 0
    first = cv2.imread(os.path.join(src_dir, names[0]))
    h, w = first.shape[:2]
    map_x, map_y = build_undistort_maps(K, dist, h, w)

    os.makedirs(dst_dir, exist_ok=True)
    for name in names:
        img = cv2.imread(os.path.join(src_dir, name))
        out = cv2.remap(img, map_x, map_y, cv2.INTER_LINEAR)
        cv2.imwrite(os.path.join(dst_dir, name), out)
    return src_dir, len(names)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("h36m_root")
    parser.add_argument("labels_path")
    parser.add_argument("--processes", type=int, default=os.cpu_count())
    args = parser.parse_args()

    labels = np.load(args.labels_path, allow_pickle=True).item()
    tasks = []
    processed = os.path.join(args.h36m_root, "processed")
    for si, subject in enumerate(labels["subject_names"]):
        for action in labels["action_names"]:
            for ci, camera in enumerate(labels["camera_names"]):
                src = os.path.join(processed, subject, action,
                                   "imageSequence", camera)
                if not os.path.isdir(src):
                    continue
                dst = os.path.join(processed, subject, action,
                                   "imageSequence-undistorted", camera)
                cam = labels["cameras"][si, ci]
                tasks.append((src, dst, np.array(cam["K"]),
                              np.array(cam["dist"])))

    with Pool(args.processes) as pool:
        for src, n in pool.imap_unordered(process_camera_dir, tasks):
            print(f"{src}: {n} frames")


if __name__ == "__main__":
    main()
