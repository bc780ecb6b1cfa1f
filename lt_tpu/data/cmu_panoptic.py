"""CMU Panoptic Studio multi-view dataset + MPJPE evaluator.

Beyond-reference-parity component: the reference publishes CMU Panoptic
numbers (reference README.md:138-142) and its models support the CMU joint
layout (reference mvn/models/triangulation.py:336-339 axis permutation,
mvn/datasets/human36m.py:244-252 CMU->H36M joint transfer), but it ships no
CMU loader.  This one reads the public Panoptic toolbox layout directly:

    {root}/{sequence}/calibration_{sequence}.json
    {root}/{sequence}/hdPose3d_stage1_coco19/body3DScene_{frame:08d}.json
    {root}/{sequence}/hdImgs/{name}/{name}_{frame:08d}.jpg

and emits the exact sample-dict contract of
:class:`lt_tpu.data.human36m.Human36MMultiViewDataset`, so
:func:`lt_tpu.data.batch.collate`, :class:`~lt_tpu.data.batch.BatchIterator`
and the engine consume it unchanged.

Conventions handled here:

- Panoptic world/translation units are **centimetres**; everything is
  converted to the framework's millimetres on load.
- Poses are COCO19 (``joints19``: 19 x (x, y, z, confidence)); the
  confidence column becomes the per-joint validity column (conf > 0).
- Panoptic ships no person bboxes: per-view bboxes are derived by
  projecting the GT joints through each camera and squaring the hull
  (:func:`lt_tpu.utils.img.get_square_bbox`), scaled by ``scale_bbox`` —
  the usual practice for single-person Panoptic pipelines.
- HD camera distortion coefficients are small and ignored for projection
  (the reference's H36M path makes the same straight-pinhole assumption
  after its offline undistortion pass).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from lt_tpu.utils import img as img_utils

ROOT_JOINT = 2  # COCO19 bodyCenter (mid-hip)


def _load_calibration(path, camera_names=None):
    """hd cameras from a toolbox calibration json -> list of dicts (mm)."""
    with open(path) as f:
        calib = json.load(f)
    cams = []
    for cam in calib["cameras"]:
        if cam.get("type", "hd") != "hd":
            continue
        if camera_names is not None and cam["name"] not in camera_names:
            continue
        cams.append({
            "name": cam["name"],
            "K": np.array(cam["K"], np.float32),
            "R": np.array(cam["R"], np.float32),
            # Panoptic t is in cm -> mm.
            "t": np.array(cam["t"], np.float32).reshape(3, 1) * 10.0,
            "dist": np.array(cam.get("distCoef", [0] * 5), np.float32),
        })
    if camera_names is not None:
        order = {n: i for i, n in enumerate(camera_names)}
        cams.sort(key=lambda c: order[c["name"]])
    return cams


def _load_pose(path):
    """body3DScene json -> (19, 4) mm keypoints of body 0, or None."""
    with open(path) as f:
        scene = json.load(f)
    bodies = scene.get("bodies", [])
    if not bodies:
        return None
    kp = np.array(bodies[0]["joints19"], np.float32).reshape(-1, 4)
    kp[:, :3] *= 10.0                     # cm -> mm
    kp[:, 3] = (kp[:, 3] > 0).astype(np.float32)   # conf -> validity
    return kp


class CMUPanopticMultiViewDataset:
    """Single-person multi-view CMU Panoptic over the toolbox layout.

    Args:
      panoptic_root: directory holding the sequence folders.
      sequences: sequence names to include (e.g. ``["171204_pose1"]``).
      camera_names: HD camera names to use, in view order (e.g.
        ``["00_00", "00_06", ...]``); None uses every HD camera in
        calibration-file order capped at ``n_views``.
      n_views: cap on the view count when ``camera_names`` is None.
      retain_every_n_frames: frame subsampling stride.
      image_shape, scale_bbox, norm_image, crop: as in the H36M loader.
    """

    def __init__(self,
                 panoptic_root: str,
                 sequences: Sequence[str],
                 camera_names: Optional[Sequence[str]] = None,
                 n_views: int = 4,
                 train: bool = False,
                 test: bool = False,
                 retain_every_n_frames: int = 1,
                 image_shape=(256, 256),
                 scale_bbox: float = 1.2,
                 norm_image: bool = True,
                 crop: bool = True):
        assert train or test, "need at least one of train/test"
        self.panoptic_root = panoptic_root
        self.sequence_names = list(sequences)
        self.image_shape = None if image_shape is None else tuple(image_shape)
        self.scale_bbox = scale_bbox
        self.norm_image = norm_image
        self.crop = crop
        # Per-sample loads read + JPEG-decode files: the
        # BatchIterator fallback thread pool pays off here.
        self.io_bound = True
        self.num_keypoints = 19
        self.kind = "cmu"

        self.cameras = []      # per sequence: list of camera dicts
        frames = []            # (seq_idx, frame_str, (19, 4) keypoints)
        for seq_idx, seq in enumerate(self.sequence_names):
            seq_dir = os.path.join(panoptic_root, seq)
            cams = _load_calibration(
                os.path.join(seq_dir, f"calibration_{seq}.json"),
                camera_names)
            if camera_names is None:
                cams = cams[:n_views]
            assert cams, f"no HD cameras found for {seq}"
            self.cameras.append(cams)

            pose_dir = os.path.join(seq_dir, "hdPose3d_stage1_coco19")
            for fname in sorted(os.listdir(pose_dir)):
                if not (fname.startswith("body3DScene_")
                        and fname.endswith(".json")):
                    continue
                frame = fname[len("body3DScene_"):-len(".json")]
                kp = _load_pose(os.path.join(pose_dir, fname))
                if kp is None:
                    continue
                frames.append((seq_idx, frame, kp))

        frames = frames[::retain_every_n_frames]
        self.table = {
            "sequence_idx": np.array([f[0] for f in frames], np.int64),
            "frame": [f[1] for f in frames],
            "keypoints": (np.stack([f[2] for f in frames])
                          if frames else np.zeros((0, 19, 4), np.float32)),
        }
        self.n_views = (len(camera_names) if camera_names is not None
                        else max(len(c) for c in self.cameras))

    def __len__(self):
        return len(self.table["frame"])

    def _image_path(self, seq: str, cam_name: str, frame: str) -> str:
        return os.path.join(self.panoptic_root, seq, "hdImgs", cam_name,
                            f"{cam_name}_{frame}.jpg")

    def _view_bbox(self, kp_mm, cam):
        """Square bbox (l, u, r, d) around the projected GT joints."""
        P = cam["K"] @ np.hstack([cam["R"], cam["t"]])
        pts = P @ np.vstack([kp_mm.T, np.ones((1, len(kp_mm)), np.float32)])
        uv = (pts[:2] / np.maximum(pts[2:], 1e-6)).T
        l, u = uv.min(0)
        r, d = uv.max(0)
        bbox = img_utils.get_square_bbox((l, u, r, d))
        return img_utils.scale_bbox(bbox, self.scale_bbox)

    def __getitem__(self, idx):
        seq_idx = int(self.table["sequence_idx"][idx])
        seq = self.sequence_names[seq_idx]
        frame = self.table["frame"][idx]
        kp = self.table["keypoints"][idx]

        sample = {"images": [], "detections": [], "cameras_R": [],
                  "cameras_t": [], "cameras_K": [], "proj_matrices": [],
                  "view_valid": []}

        for cam in self.cameras[seq_idx]:
            image_path = self._image_path(seq, cam["name"], frame)
            if not os.path.exists(image_path):
                sample["view_valid"].append(False)
                sample["images"].append(None)
                sample["detections"].append(np.zeros(5, np.float32))
                sample["cameras_R"].append(np.eye(3, dtype=np.float32))
                sample["cameras_t"].append(np.zeros((3, 1), np.float32))
                sample["cameras_K"].append(np.eye(3, dtype=np.float32))
                sample["proj_matrices"].append(np.eye(3, 4, dtype=np.float32))
                continue

            bbox = self._view_bbox(kp[:, :3], cam)
            K = cam["K"].copy()

            import cv2

            image = cv2.imread(image_path)  # BGR, matching the H36M loader
            assert image is not None, f"failed to read {image_path}"
            if self.crop:
                image = img_utils.crop_image(image, bbox)
                K[0, 2] -= bbox[0]
                K[1, 2] -= bbox[1]
            h_before, w_before = image.shape[:2]
            if self.image_shape is not None:
                image = img_utils.resize_image(image, self.image_shape)
                K[0] *= self.image_shape[1] / w_before
                K[1] *= self.image_shape[0] / h_before
            if self.norm_image:
                image = img_utils.normalize_image(image)

            sample["images"].append(image)
            sample["detections"].append(
                np.array(list(bbox) + [1.0], np.float32))
            sample["cameras_R"].append(cam["R"])
            sample["cameras_t"].append(cam["t"])
            sample["cameras_K"].append(K)
            sample["proj_matrices"].append(
                (K @ np.hstack([cam["R"], cam["t"]])).astype(np.float32))
            sample["view_valid"].append(True)

        # Pad missing trailing views so every sample has n_views slots.
        while len(sample["view_valid"]) < self.n_views:
            sample["view_valid"].append(False)
            sample["images"].append(None)
            sample["detections"].append(np.zeros(5, np.float32))
            sample["cameras_R"].append(np.eye(3, dtype=np.float32))
            sample["cameras_t"].append(np.zeros((3, 1), np.float32))
            sample["cameras_K"].append(np.eye(3, dtype=np.float32))
            sample["proj_matrices"].append(np.eye(3, 4, dtype=np.float32))

        sample["keypoints_3d"] = kp.astype(np.float32)
        sample["indexes"] = idx
        return sample

    def get_batch(self, idxs):
        return [self[int(i)] for i in idxs]

    # -- evaluation ---------------------------------------------------------

    def keypoints_world(self, idx: int) -> np.ndarray:
        """(J, 3) world-mm GT straight from the table — no image decode
        (used by partial evaluation, engine/train.py)."""
        return self.table["keypoints"][idx][:, :3].astype(np.float32)

    def evaluate_using_per_pose_error(self, per_pose_error):
        """Average + per-sequence MPJPE breakdown (mirrors the H36M
        evaluator's action/subject split at Panoptic's natural granularity)."""
        scores = {"Average": float(per_pose_error.mean())
                  if len(per_pose_error) else float("nan")}
        for seq_idx, name in enumerate(self.sequence_names):
            mask = self.table["sequence_idx"] == seq_idx
            err = per_pose_error[mask]
            scores[name] = float(err.mean()) if len(err) else float("nan")
        return scores

    def evaluate(self, keypoints_3d_predicted):
        """MPJPE in mm, absolute + bodyCenter-relative.

        Returns ``(scalar, full)`` with scalar = relative Average, matching
        the H36M evaluator's return contract (human36m.py:237-273).
        """
        keypoints_gt = self.table["keypoints"][:, :, :3]
        valid = self.table["keypoints"][:, :, 3] > 0
        keypoints_3d_predicted = np.asarray(keypoints_3d_predicted)
        if keypoints_3d_predicted.shape != keypoints_gt.shape:
            raise ValueError(
                f"`keypoints_3d_predicted` shape should be "
                f"{keypoints_gt.shape}, got {keypoints_3d_predicted.shape}")

        def mpjpe(gt, pred):
            err = np.sqrt(((gt - pred) ** 2).sum(2))
            cnt = np.maximum(valid.sum(1), 1)
            return (err * valid).sum(1) / cnt

        per_pose_error = mpjpe(keypoints_gt, keypoints_3d_predicted)

        gt_rel = keypoints_gt - keypoints_gt[:, ROOT_JOINT:ROOT_JOINT + 1]
        pred_rel = (keypoints_3d_predicted
                    - keypoints_3d_predicted[:, ROOT_JOINT:ROOT_JOINT + 1])
        per_pose_error_relative = mpjpe(gt_rel, pred_rel)

        result = {
            "per_pose_error":
                {"Average": self.evaluate_using_per_pose_error(
                    per_pose_error)},
            "per_pose_error_relative":
                {"Average": self.evaluate_using_per_pose_error(
                    per_pose_error_relative)},
        }
        return (result["per_pose_error_relative"]["Average"]["Average"],
                result)
