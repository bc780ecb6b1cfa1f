"""Human3.6M multi-view dataset + MPJPE evaluator.

Functional parity target: /root/reference/mvn/datasets/human36m.py —
``Human36MMultiViewDataset`` (:16-189), evaluator (:191-273).  Consumes the
exact same monolithic labels ``.npy`` produced by the reference's
``generate-labels-npy-multiview.py`` (schema at
human36m_preprocessing/generate-labels-npy-multiview.py:34-50): subject /
action / frame indices, 17x3 world-mm keypoints, per-camera TLBR bboxes,
per-(subject, camera) R/t/K/dist.

Host-side pipeline notes: images are read with cv2 (**BGR** channel order —
human36m.py:143 — kept for checkpoint parity), cropped with zero padding,
resized to ``image_shape``, ImageNet-normalized, emitted channels-last
(H, W, 3).  Samples carry numpy camera parameter arrays, not Camera objects,
so batches convert straight into device arrays.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from lt_tpu.utils import img as img_utils

TRAIN_SUBJECTS = ["S1", "S5", "S6", "S7", "S8"]
TEST_SUBJECTS = ["S9", "S11"]
DAMAGED_ACTIONS = ("Greeting-2", "SittingDown-2", "Waiting-1")


class Human36MMultiViewDataset:
    """Multi-view Human3.6M over the reference's labels .npy."""

    def __init__(self,
                 h36m_root: str,
                 labels_path: str,
                 pred_results_path: Optional[str] = None,
                 image_shape=(256, 256),
                 train: bool = False,
                 test: bool = False,
                 retain_every_n_frames_in_test: int = 1,
                 with_damaged_actions: bool = False,
                 scale_bbox: float = 1.5,
                 norm_image: bool = True,
                 kind: str = "mpii",
                 undistort_images: bool = False,
                 ignore_cameras=(),
                 crop: bool = True,
                 use_native_loader: bool = True):
        assert train or test, "need at least one of train/test"
        assert kind in ("mpii", "human36m")

        # Native C++ fused decode+crop+resize+normalize (lt_tpu/native);
        # falls back to the cv2/numpy path when unavailable.
        self._native = None
        if use_native_loader:
            try:
                from lt_tpu import native

                if native.available():
                    self._native = native
            except Exception:
                self._native = None

        self.h36m_root = h36m_root
        self.image_shape = None if image_shape is None else tuple(image_shape)
        self.scale_bbox = scale_bbox
        self.norm_image = norm_image
        self.kind = kind
        self.undistort_images = undistort_images
        self.ignore_cameras = list(ignore_cameras)
        self.crop = crop
        # Per-sample loads read + JPEG-decode files: the
        # BatchIterator fallback thread pool pays off here.
        self.io_bound = True

        self.labels = np.load(labels_path, allow_pickle=True).item()

        n_cameras = len(self.labels["camera_names"])
        assert all(c in range(n_cameras) for c in self.ignore_cameras)

        train_idx = [self.labels["subject_names"].index(s)
                     for s in TRAIN_SUBJECTS]
        test_idx = [self.labels["subject_names"].index(s)
                    for s in TEST_SUBJECTS]

        indices = []
        table = self.labels["table"]
        if train:
            mask = np.isin(table["subject_idx"], train_idx, assume_unique=True)
            indices.append(np.nonzero(mask)[0])
        if test:
            mask = np.isin(table["subject_idx"], test_idx, assume_unique=True)
            if not with_damaged_actions:
                mask_s9 = (table["subject_idx"]
                           == self.labels["subject_names"].index("S9"))
                damaged = [self.labels["action_names"].index(a)
                           for a in DAMAGED_ACTIONS]
                mask &= ~(mask_s9 & np.isin(table["action_idx"], damaged))
            indices.append(np.nonzero(mask)[0][::retain_every_n_frames_in_test])

        self.labels["table"] = table[np.concatenate(indices)]
        self.num_keypoints = 16 if kind == "mpii" else 17
        assert self.labels["table"]["keypoints"].shape[1] == 17, \
            "Use a newer labels file"

        self.keypoints_3d_pred = None
        if pred_results_path is not None:
            pred = np.load(pred_results_path, allow_pickle=True)
            kp = pred["keypoints_3d"][np.argsort(pred["indexes"])]
            self.keypoints_3d_pred = kp[::retain_every_n_frames_in_test]
            assert len(self.keypoints_3d_pred) == len(self), (
                f"{labels_path} has {len(self)} samples, but "
                f"{pred_results_path} has {len(self.keypoints_3d_pred)}")

        self.n_views = n_cameras - len(self.ignore_cameras)

    def __len__(self):
        return len(self.labels["table"])

    def _sample_meta(self, idx):
        """Everything except pixel loading: geometry, paths, placeholders.

        Returns ``(sample, tasks)`` where ``tasks`` is a list of
        ``(view_slot, image_path, bbox)`` for the views whose image still
        needs loading.  The crop/resize intrinsic updates (human36m.py:
        146-158) depend only on the bbox and the target shape, so K and the
        projection matrices are finalized here.
        """
        shot = self.labels["table"][idx]
        subject = self.labels["subject_names"][shot["subject_idx"]]
        action = self.labels["action_names"][shot["action_idx"]]
        frame_idx = shot["frame_idx"]

        sample = {"images": [], "detections": [], "cameras_R": [],
                  "cameras_t": [], "cameras_K": [], "proj_matrices": [],
                  "view_valid": []}
        tasks = []

        for camera_idx, camera_name in enumerate(self.labels["camera_names"]):
            if camera_idx in self.ignore_cameras:
                continue

            bbox = shot["bbox_by_camera_tlbr"][camera_idx][[1, 0, 3, 2]]
            if bbox[2] - bbox[0] == 0:  # empty bbox => missing view
                sample["view_valid"].append(False)
                sample["images"].append(None)
                sample["detections"].append(np.zeros(5, np.float32))
                sample["cameras_R"].append(np.eye(3, dtype=np.float32))
                sample["cameras_t"].append(np.zeros((3, 1), np.float32))
                sample["cameras_K"].append(np.eye(3, dtype=np.float32))
                sample["proj_matrices"].append(np.eye(3, 4, dtype=np.float32))
                continue

            bbox = img_utils.scale_bbox(bbox, self.scale_bbox)

            image_path = os.path.join(
                self.h36m_root, subject, action,
                "imageSequence" + "-undistorted" * self.undistort_images,
                camera_name, "img_%06d.jpg" % (frame_idx + 1))

            cam = self.labels["cameras"][shot["subject_idx"], camera_idx]
            R = np.array(cam["R"], np.float32)
            t = np.array(cam["t"], np.float32).reshape(3, 1)
            K = np.array(cam["K"], np.float32).copy()
            if self.crop:
                K[0, 2] -= bbox[0]
                K[1, 2] -= bbox[1]
                if self.image_shape is not None:
                    K[0] *= self.image_shape[1] / (bbox[2] - bbox[0])
                    K[1] *= self.image_shape[0] / (bbox[3] - bbox[1])

            tasks.append((len(sample["images"]), image_path, bbox))
            sample["images"].append(None)  # filled by the loading layer
            sample["detections"].append(
                np.array(list(bbox) + [1.0], np.float32))
            sample["cameras_R"].append(R)
            sample["cameras_t"].append(t)
            sample["cameras_K"].append(K)
            sample["proj_matrices"].append(
                (K @ np.hstack([R, t])).astype(np.float32))
            sample["view_valid"].append(True)

        kp = shot["keypoints"][:self.num_keypoints].astype(np.float32)
        sample["keypoints_3d"] = np.concatenate(
            [kp, np.ones((kp.shape[0], 1), np.float32)], axis=1)
        sample["indexes"] = idx

        if self.keypoints_3d_pred is not None:
            sample["pred_keypoints_3d"] = \
                self.keypoints_3d_pred[idx].astype(np.float32)
        return sample, tasks

    @property
    def _fast_path(self) -> bool:
        """The fused native pipeline covers the standard configuration."""
        return (self._native is not None and self.crop
                and self.image_shape is not None and self.norm_image)

    def _load_image(self, image_path, bbox):
        """Single-image load (native if possible, else the cv2 reference
        path — human36m.py:143-163 semantics, BGR order).

        Returns ``(image, (h_before, w_before))`` with the pre-resize dims
        (needed for the K rescale when ``crop=False``).
        """
        if self._fast_path:
            decoded = self._native.decode_jpeg(image_path)
            if decoded is not None:
                image = self._native.process_image(
                    decoded, bbox, self.image_shape, normalize=True)
                return image, (bbox[3] - bbox[1], bbox[2] - bbox[0])

        import cv2

        image = cv2.imread(image_path)  # BGR, like the reference
        assert image is not None, f"{image_path} doesn't exist"
        if self.crop:
            image = img_utils.crop_image(image, bbox)
        h_before, w_before = image.shape[:2]
        if self.image_shape is not None:
            image = img_utils.resize_image(image, self.image_shape)
        if self.norm_image:
            image = img_utils.normalize_image(image)
        return image, (h_before, w_before)

    def _fix_uncropped_intrinsics(self, sample, slot, dims):
        """K rescale for crop=False + resize (update_after_resize parity):
        _sample_meta can't finalize K without the real image dims."""
        if self.crop or self.image_shape is None:
            return
        K = sample["cameras_K"][slot]
        K[0] *= self.image_shape[1] / dims[1]
        K[1] *= self.image_shape[0] / dims[0]
        R, t = sample["cameras_R"][slot], sample["cameras_t"][slot]
        sample["proj_matrices"][slot] = (
            K @ np.hstack([R, t])).astype(np.float32)

    def __getitem__(self, idx):
        """Returns a dict with per-view lists (missing views skipped) —
        mirroring human36m.py:116-189 — plus ``view_valid`` flags used by the
        static-shape collate."""
        sample, tasks = self._sample_meta(idx)
        for slot, image_path, bbox in tasks:
            image, dims = self._load_image(image_path, bbox)
            sample["images"][slot] = image
            self._fix_uncropped_intrinsics(sample, slot, dims)
        return sample

    def get_batch(self, idxs):
        """Load a whole batch of samples, decoding all B*V JPEGs in one
        thread-pooled native call (the reference's num_workers analogue,
        train.py:78,107).  Falls back to the per-sample path when the fused
        pipeline doesn't apply."""
        if not self._fast_path:
            return [self[int(i)] for i in idxs]
        if getattr(self, "_batch_loader", None) is None:
            self._batch_loader = self._native.NativeBatchLoader()

        metas = [self._sample_meta(int(i)) for i in idxs]
        paths, bboxes, slots = [], [], []
        for si, (_, tasks) in enumerate(metas):
            for slot, image_path, bbox in tasks:
                paths.append(image_path)
                bboxes.append(bbox)
                slots.append((si, slot))
        if paths:
            out, ok = self._batch_loader.load(
                paths, np.asarray(bboxes, np.int32), self.image_shape)
            for (si, slot), image, good, path, bbox in zip(
                    slots, out, ok, paths, bboxes):
                if good:
                    metas[si][0]["images"][slot] = image
                else:  # e.g. non-JPEG test fixtures: cv2 fallback
                    metas[si][0]["images"][slot], _ = self._load_image(path,
                                                                       bbox)
        return [sample for sample, _ in metas]

    # -- evaluation ---------------------------------------------------------

    def keypoints_world(self, idx: int) -> np.ndarray:
        """(J, 3) world-mm GT straight from the labels table — no image
        decode (used by partial evaluation, engine/train.py)."""
        return self.labels["table"][idx]["keypoints"][
            :self.num_keypoints, :3].astype(np.float32)

    def evaluate_using_per_pose_error(self, per_pose_error):
        """Per-action / per-subject score breakdown (human36m.py:191-235)."""

        def by_actions(mask=None):
            if mask is None:
                mask = np.ones_like(per_pose_error, dtype=bool)
            table = self.labels["table"]
            scores = {"Average": {
                "total_loss": per_pose_error[mask].sum(),
                "frame_count": int(np.count_nonzero(mask))}}
            for action_idx, name in enumerate(self.labels["action_names"]):
                action_mask = (table["action_idx"] == action_idx) & mask
                err = per_pose_error[action_mask]
                scores[name] = {"total_loss": err.sum(),
                                "frame_count": len(err)}

            base_names = [n[:-2] for n in self.labels["action_names"]
                          if n.endswith("-1")]
            for base in base_names:
                combined = {"total_loss": 0.0, "frame_count": 0}
                for trial in (1, 2):
                    name = f"{base}-{trial}"
                    combined["total_loss"] += scores[name]["total_loss"]
                    combined["frame_count"] += scores[name]["frame_count"]
                    del scores[name]
                scores[base] = combined

            return {k: (float("nan") if v["frame_count"] == 0
                        else float(v["total_loss"] / v["frame_count"]))
                    for k, v in scores.items()}

        subject_scores = {"Average": by_actions()}
        for subject_idx, name in enumerate(self.labels["subject_names"]):
            subject_scores[name] = by_actions(
                self.labels["table"]["subject_idx"] == subject_idx)
        return subject_scores

    def evaluate(self, keypoints_3d_predicted,
                 transfer_cmu_to_human36m: bool = False,
                 transfer_human36m_to_human36m: bool = False):
        """MPJPE in mm, absolute + pelvis-relative (human36m.py:237-273).

        Returns ``(scalar, full)`` where scalar is the relative
        Average/Average.
        """
        keypoints_gt = self.labels["table"]["keypoints"][:, :self.num_keypoints]
        keypoints_3d_predicted = np.asarray(keypoints_3d_predicted)
        if keypoints_3d_predicted.shape != keypoints_gt.shape:
            raise ValueError(
                f"`keypoints_3d_predicted` shape should be "
                f"{keypoints_gt.shape}, got {keypoints_3d_predicted.shape}")

        transfer = transfer_cmu_to_human36m or transfer_human36m_to_human36m
        if transfer:
            human36m_joints = [10, 11, 15, 14, 1, 4]
            cmu_joints = (human36m_joints if transfer_human36m_to_human36m
                          else [10, 8, 9, 7, 14, 13])
            keypoints_gt = keypoints_gt[:, human36m_joints]
            keypoints_3d_predicted = keypoints_3d_predicted[:, cmu_joints]

        per_pose_error = np.sqrt(
            ((keypoints_gt - keypoints_3d_predicted) ** 2).sum(2)).mean(1)

        root_index = 0 if transfer else 6
        gt_rel = keypoints_gt - keypoints_gt[:, root_index:root_index + 1]
        pred_rel = (keypoints_3d_predicted
                    - keypoints_3d_predicted[:, root_index:root_index + 1])
        per_pose_error_relative = np.sqrt(
            ((gt_rel - pred_rel) ** 2).sum(2)).mean(1)

        result = {
            "per_pose_error":
                self.evaluate_using_per_pose_error(per_pose_error),
            "per_pose_error_relative":
                self.evaluate_using_per_pose_error(per_pose_error_relative),
        }
        return (result["per_pose_error_relative"]["Average"]["Average"],
                result)
