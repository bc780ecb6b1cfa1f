"""Extract per-frame TLBR bounding boxes from Human3.6M segmentation masks.

Offline equivalent of the reference's ``collect-bboxes.py``
(/root/reference/mvn/datasets/human36m_preprocessing/collect-bboxes.py:30-118):
scans each ``MySegmentsMat/ground_truth_bs`` .mat file, finds the tight
nonzero-mask box per frame, and writes one nested dict
``{subject: {action: {camera: (n_frames, 4) int array}}}`` to
``<h36m_root>/extra/bboxes-Human36M-GT.npy``.

Usage:
    python collect_bboxes.py <h36m_root> [--processes N]
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np


def mask_to_bbox(mask: np.ndarray):
    """Tight TLBR box around nonzero mask pixels (zeros if empty)."""
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if len(rows) == 0 or len(cols) == 0:
        return 0, 0, 0, 0
    return int(rows[0]), int(cols[0]), int(rows[-1] + 1), int(cols[-1] + 1)


def process_mat(task):
    subject, action, camera, path = task
    import h5py

    bboxes = []
    with h5py.File(path, "r") as f:
        masks = f["Masks"]
        for i in range(len(masks)):
            mask = np.array(f[masks[i][0]]).T
            bboxes.append(mask_to_bbox(mask))
    return subject, action, camera, np.array(bboxes, np.int32)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("h36m_root")
    parser.add_argument("--processes", type=int, default=os.cpu_count())
    args = parser.parse_args()

    tasks = []
    processed = os.path.join(args.h36m_root, "processed")
    for subject in sorted(os.listdir(processed)):
        seg_dir = os.path.join(processed, subject, "MySegmentsMat",
                               "ground_truth_bs")
        if not os.path.isdir(seg_dir):
            continue
        for name in sorted(os.listdir(seg_dir)):
            if not name.endswith(".mat"):
                continue
            # '<action>.<camera>.mat'
            stem = name[:-4]
            action, _, camera = stem.rpartition(".")
            tasks.append((subject, action, camera,
                          os.path.join(seg_dir, name)))

    result: dict = {}
    with Pool(args.processes) as pool:
        for subject, action, camera, bboxes in pool.imap_unordered(
                process_mat, tasks):
            result.setdefault(subject, {}).setdefault(action, {})[camera] = \
                bboxes
            print(f"{subject}/{action}/{camera}: {len(bboxes)} frames")

    dst = os.path.join(args.h36m_root, "extra", "bboxes-Human36M-GT.npy")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.save(dst, result)
    print("Wrote", dst)


if __name__ == "__main__":
    main()
