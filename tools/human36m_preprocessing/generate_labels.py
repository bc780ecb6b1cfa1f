"""Generate the monolithic multiview labels .npy for Human3.6M.

Offline equivalent of the reference's
``generate-labels-npy-multiview.py`` (schema at
/root/reference/mvn/datasets/human36m_preprocessing/
generate-labels-npy-multiview.py:34-50): one structured table of
(subject_idx, action_idx, frame_idx, 17x3 world-mm keypoints, per-camera
TLBR bboxes) plus per-(subject, camera) R/t/K/dist from the una-dinosauria
``cameras.h5`` release (R transposed, t = -R @ T, K assembled from f/c —
:71-82).

Usage:
    python generate_labels.py <h36m_root> <una_dinosauria_root> <bboxes.npy>
        [--bboxes-source GT] [--action-map action_map.json]

Action-name quirks: trial suffixes differ (and are swapped!) between the
H36M image dumps and the una-dinosauria pose files (e.g. S11
``Greeting-1`` is pose file ``Greeting 2``).  Resolution order per
(subject, action): (1) explicit JSON override (``--action-map``), (2) the
corpus quirk table (``action_quirks.ACTION_TO_POSE_STEM`` — the reference's
action_to_una_dinosauria.py facts), (3) rule-based candidate probing for
corpora with different layouts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from action_quirks import action_to_pose_stem  # noqa: E402

SUBJECTS = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
CAMERAS = ["54138969", "55011271", "58860488", "60457274"]
ACTIONS = [
    "Directions-1", "Directions-2", "Discussion-1", "Discussion-2",
    "Eating-1", "Eating-2", "Greeting-1", "Greeting-2",
    "Phoning-1", "Phoning-2", "Posing-1", "Posing-2",
    "Purchases-1", "Purchases-2", "Sitting-1", "Sitting-2",
    "SittingDown-1", "SittingDown-2", "Smoking-1", "Smoking-2",
    "TakingPhoto-1", "TakingPhoto-2", "Waiting-1", "Waiting-2",
    "Walking-1", "Walking-2", "WalkingDog-1", "WalkingDog-2",
    "WalkingTogether-1", "WalkingTogether-2",
]

# 32 -> 17 joint selection: 16 MPII-order joints + Neck/Nose
# (generate-labels-npy-multiview.py:179).
VALID_JOINTS = (3, 2, 1, 6, 7, 8, 0, 12, 13, 15, 27, 26, 25, 17, 18, 19, 14)

RENAMES = {"TakingPhoto": "Photo", "WalkingDog": "WalkDog",
           "WalkingTogether": "WalkTogether"}


def square_the_bbox(bbox):
    """Stretch the shorter side so the TLBR bbox is square (:87-101)."""
    top, left, bottom, right = bbox
    width, height = right - left, bottom - top
    if height < width:
        center = (top + bottom) * 0.5
        top = int(round(center - width * 0.5))
        bottom = top + width
    else:
        center = (left + right) * 0.5
        left = int(round(center - height * 0.5))
        right = left + height
    return top, left, bottom, right


def candidate_pose_names(action: str):
    """Candidate una-dinosauria file stems for an H36M action name."""
    base, _, trial = action.partition("-")
    base = RENAMES.get(base, base)
    if trial == "1":
        return [f"{base} 1", base, f"{base} 2", f"{base} 3"]
    return [base, f"{base} {trial}", f"{base} 1", f"{base} 3"]


def resolve_pose_file(poses_dir: str, subject: str, action: str, used: set,
                      override: dict) -> str:
    if action in override:
        return os.path.join(poses_dir, override[action] + ".h5")
    # Corpus quirk table first (generate-labels-npy-multiview.py:181
    # semantics): these pairings are facts, not derivable by probing.
    quirk = os.path.join(poses_dir, action_to_pose_stem(subject, action)
                         + ".h5")
    if os.path.isfile(quirk):
        return quirk
    for cand in candidate_pose_names(action):
        path = os.path.join(poses_dir, cand + ".h5")
        if os.path.isfile(path) and path not in used:
            return path
    raise FileNotFoundError(
        f"No pose file for {action} in {poses_dir}; pass --action-map")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("h36m_root")
    parser.add_argument("una_dinosauria_root")
    parser.add_argument("bboxes_npy")
    parser.add_argument("--bboxes-source", default="GT")
    parser.add_argument("--action-map", default=None,
                        help="JSON {subject: {action: pose_file_stem}}")
    args = parser.parse_args()

    import h5py

    override = {}
    if args.action_map:
        override = json.load(open(args.action_map))

    retval = {
        "subject_names": SUBJECTS,
        "camera_names": CAMERAS,
        "action_names": ACTIONS,
    }
    retval["cameras"] = np.empty(
        (len(SUBJECTS), len(CAMERAS)),
        dtype=[("R", np.float32, (3, 3)), ("t", np.float32, (3, 1)),
               ("K", np.float32, (3, 3)), ("dist", np.float32, 5)])

    cameras_params = h5py.File(
        os.path.join(args.una_dinosauria_root, "cameras.h5"), "r")
    for si, subject in enumerate(SUBJECTS):
        grp = cameras_params[subject.replace("S", "subject")]
        for ci in range(len(CAMERAS)):
            p = grp[f"camera{ci + 1}"]
            cam = retval["cameras"][si][ci]
            cam["R"] = np.array(p["R"]).T
            cam["t"] = -cam["R"] @ p["T"]
            K = np.zeros((3, 3), np.float32)
            K[:2, 2] = np.array(p["c"])[:, 0]
            K[0, 0] = np.array(p["f"])[0]
            K[1, 1] = np.array(p["f"])[1]
            K[2, 2] = 1.0
            cam["K"] = K
            dist = np.zeros(5, np.float32)
            k = np.array(p["k"])[:, 0]
            tang = np.array(p["p"])[:, 0]
            dist[:2] = k[:2]
            dist[2:4] = tang
            dist[4] = k[2]
            cam["dist"] = dist

    bboxes = np.load(args.bboxes_npy, allow_pickle=True).item()
    for subject in bboxes:
        for action in bboxes[subject]:
            for camera, arr in bboxes[subject][action].items():
                for bbox in arr:
                    bbox[:] = square_the_bbox(bbox)

    table_dtype = np.dtype([
        ("subject_idx", np.int8), ("action_idx", np.int8),
        ("frame_idx", np.int16), ("keypoints", np.float32, (17, 3)),
        ("bbox_by_camera_tlbr", np.int16, (len(CAMERAS), 4))])

    segments = []
    for si, subject in enumerate(SUBJECTS):
        subject_path = os.path.join(args.h36m_root, "processed", subject)
        poses_dir = os.path.join(args.una_dinosauria_root, subject, "MyPoses",
                                 "3D_positions")
        used = set()
        for ai, action in enumerate(ACTIONS):
            action_path = os.path.join(subject_path, action, "imageSequence")
            if not os.path.isdir(action_path):
                raise FileNotFoundError(action_path)

            frame_idxs = None
            for camera in CAMERAS:
                camera_path = os.path.join(action_path, camera)
                if os.path.isdir(camera_path):
                    frame_idxs = sorted(int(n[4:-4]) - 1
                                        for n in os.listdir(camera_path))
                    assert len(frame_idxs) > 15, f"Too few frames in {camera_path}"
                    break
            if frame_idxs is None:
                raise FileNotFoundError(action_path)

            pose_path = resolve_pose_file(poses_dir, subject, action,
                                          used, override.get(subject, {}))
            used.add(pose_path)
            with h5py.File(pose_path, "r") as f:
                poses_world = np.array(f["3D_positions"]).T.reshape(
                    -1, 32, 3)[frame_idxs][:, VALID_JOINTS]

            seg = np.empty(len(frame_idxs), dtype=table_dtype)
            seg["subject_idx"] = si
            seg["action_idx"] = ai
            seg["frame_idx"] = frame_idxs
            seg["keypoints"] = poses_world
            seg["bbox_by_camera_tlbr"] = 0  # (0,0,0,0) == view missing

            for ci, camera in enumerate(CAMERAS):
                if not os.path.isdir(os.path.join(action_path, camera)):
                    print(f"Warning: camera {camera} missing in "
                          f"{subject}/{action}")
                    continue
                for bbox, fi in zip(seg["bbox_by_camera_tlbr"], frame_idxs):
                    bbox[ci] = bboxes[subject][action][camera][fi]
            segments.append(seg)

    retval["table"] = np.concatenate(segments)
    dst = os.path.join(args.h36m_root, "extra",
                       f"human36m-multiview-labels-"
                       f"{args.bboxes_source}bboxes.npy")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    print("Total frames:", len(retval["table"]))
    np.save(dst, retval)
    print("Wrote", dst)


if __name__ == "__main__":
    sys.exit(main())
