"""Extract per-frame TLBR bounding boxes from Human3.6M segmentation masks.

Offline equivalent of the reference's ``collect-bboxes.py``
(/root/reference/mvn/datasets/human36m_preprocessing/collect-bboxes.py:30-118):
reads each ``MySegmentsMat/ground_truth_bb`` .mat file, finds the tight
nonzero-mask box per frame, and writes one nested dict
``{subject: {action: {camera: (n_frames, 4) int array}}}`` to
``<h36m_root>/extra/bboxes-Human36M-GT.npy``.

The output is keyed by canonical H36M action names (``Greeting-1``); the
.mat stems with their swapped S1 trial quirks are resolved through
``action_quirks.action_to_bbox_stem`` (collect-bboxes.py:47 semantics),
so downstream ``generate_labels.py`` lookups can never silently mispair.

Usage:
    python collect_bboxes.py <h36m_root> [--processes N]
"""

from __future__ import annotations

import argparse
import os
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from action_quirks import action_to_bbox_stem  # noqa: E402


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
                               "ground_truth_bb")
        if not os.path.isdir(seg_dir):  # some dumps name it ground_truth_bs
            seg_dir = os.path.join(processed, subject, "MySegmentsMat",
                                   "ground_truth_bs")
        if not os.path.isdir(seg_dir):
            continue
        # Map each '<stem>.<camera>.mat' back to its canonical H36M action
        # name via the quirk table (inverse of collect-bboxes.py:47).
        stem_to_action = {}
        for name in sorted(os.listdir(seg_dir)):
            if not name.endswith(".mat"):
                continue
            stem, _, camera = name[:-4].rpartition(".")
            if stem not in stem_to_action:
                # Find which H36M action resolves to this stem.
                base = stem.split(" ")[0]
                cands = [f"{b}-{t}" for b in
                         {base, {"Photo": "TakingPhoto",
                                 "WalkDog": "WalkingDog",
                                 "WalkTogether": "WalkingTogether"
                                 }.get(base, base)}
                         for t in (1, 2)]
                matches = [a for a in cands
                           if action_to_bbox_stem(subject, a) == stem]
                stem_to_action[stem] = matches[0] if matches else stem
                if not matches:
                    print(f"Warning: no action mapping for {subject}/{stem}; "
                          "keeping the raw stem as key")
            tasks.append((subject, stem_to_action[stem], camera,
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
