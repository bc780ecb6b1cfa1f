"""CMU Panoptic loader tests over a fabricated toolbox-layout mini-dataset.

Beyond-reference-parity component (the reference publishes CMU numbers,
README.md:138-142, but ships no loader); the loader must emit the exact
sample contract of the H36M dataset so collate/engine consume it unchanged.
"""

import json
import os

import numpy as np
import pytest

from lt_tpu.data.batch import collate
from lt_tpu.data.cmu_panoptic import CMUPanopticMultiViewDataset

cv2 = pytest.importorskip("cv2")

SEQ = "171204_pose1"


def _make_panoptic_root(tmp_path, n_frames=3, image_hw=(1080, 1920)):
    root = tmp_path / "panoptic"
    seq_dir = root / SEQ
    (seq_dir / "hdPose3d_stage1_coco19").mkdir(parents=True)

    f = 400.0
    cams = []
    # Two HD cameras on +z / +x axes looking at the origin, plus one VGA
    # camera that must be filtered out.  Panoptic units: cm.
    for name, (rot, pos_cm) in {
            "00_00": (np.eye(3), np.array([0.0, 0.0, 400.0])),
            "00_06": (np.array([[0.0, 0, -1], [0, 1, 0], [1, 0, 0]]),
                      np.array([0.0, 0.0, 400.0])),
    }.items():
        cams.append({
            "name": name, "type": "hd", "panel": 0,
            "node": int(name.split("_")[1]),
            "K": [[f, 0, image_hw[1] / 2], [0, f, image_hw[0] / 2],
                  [0, 0, 1]],
            "R": rot.tolist(),
            "t": pos_cm.reshape(3, 1).tolist(),
            "distCoef": [0, 0, 0, 0, 0],
        })
    cams.append({"name": "01_01", "type": "vga", "panel": 1, "node": 1,
                 "K": np.eye(3).tolist(), "R": np.eye(3).tolist(),
                 "t": [[0], [0], [0]], "distCoef": [0] * 5})
    with open(seq_dir / f"calibration_{SEQ}.json", "w") as fh:
        json.dump({"calibDataSource": "test", "cameras": cams}, fh)

    rng = np.random.RandomState(0)
    poses_mm = []
    for i in range(n_frames):
        frame = f"{i:08d}"
        path = seq_dir / "hdPose3d_stage1_coco19" / f"body3DScene_{frame}.json"
        if i == n_frames - 1:
            bodies = []              # empty frame: must be skipped
            poses_mm.append(None)
        else:
            kp_cm = rng.uniform(-30, 30, size=(19, 3))
            conf = np.ones((19, 1))
            bodies = [{"id": 0,
                       "joints19":
                           np.hstack([kp_cm, conf]).ravel().tolist()}]
            poses_mm.append(kp_cm * 10.0)
        with open(path, "w") as fh:
            json.dump({"frameIdx": i, "bodies": bodies}, fh)

    for cam in ("00_00", "00_06"):
        img_dir = seq_dir / "hdImgs" / cam
        img_dir.mkdir(parents=True)
        for i in range(n_frames - 1):
            img = rng.randint(0, 255, size=(60, 80, 3), dtype=np.uint8)
            cv2.imwrite(str(img_dir / f"{cam}_{i:08d}.jpg"), img)
    return root, poses_mm


def test_sample_contract_and_units(tmp_path):
    root, poses_mm = _make_panoptic_root(tmp_path)
    ds = CMUPanopticMultiViewDataset(
        str(root), [SEQ], camera_names=["00_00", "00_06"],
        test=True, image_shape=(64, 64))

    assert len(ds) == 2          # the empty frame was dropped
    np.testing.assert_allclose(ds.table["keypoints"][0, :, :3], poses_mm[0],
                               atol=1e-4)   # cm -> mm
    assert (ds.table["keypoints"][:, :, 3] == 1).all()

    s = ds[0]
    assert len(s["images"]) == 2 and s["view_valid"] == [True, True]
    assert s["images"][0].shape == (64, 64, 3)
    assert s["keypoints_3d"].shape == (19, 4)

    # The cropped+resized intrinsics must keep projecting GT joints inside
    # the output image.
    P = s["proj_matrices"][0]
    kp_h = np.hstack([s["keypoints_3d"][:, :3],
                      np.ones((19, 1), np.float32)])
    uvw = kp_h @ P.T
    uv = uvw[:, :2] / uvw[:, 2:]
    assert (uv > -1).all() and (uv < 65).all()


def test_missing_view_and_collate(tmp_path):
    root, _ = _make_panoptic_root(tmp_path)
    os.remove(str(root / SEQ / "hdImgs" / "00_06" / "00_06_00000001.jpg"))
    ds = CMUPanopticMultiViewDataset(
        str(root), [SEQ], camera_names=["00_00", "00_06"],
        test=True, image_shape=(64, 64))

    assert ds[1]["view_valid"] == [True, False]
    batch = collate(ds.get_batch([0, 1]))
    assert batch["images"].shape == (2, 2, 64, 64, 3)
    np.testing.assert_array_equal(batch["view_mask"],
                                  [[1.0, 1.0], [1.0, 0.0]])
    assert batch["proj_matrices"].shape == (2, 2, 3, 4)
    assert batch["keypoints_3d"].shape == (2, 19, 4)


def test_evaluator_scalar_and_breakdown(tmp_path):
    root, _ = _make_panoptic_root(tmp_path)
    ds = CMUPanopticMultiViewDataset(
        str(root), [SEQ], camera_names=["00_00", "00_06"],
        test=True, image_shape=(64, 64))

    gt = ds.table["keypoints"][:, :, :3]
    scalar, full = ds.evaluate(gt)
    assert scalar == pytest.approx(0.0, abs=1e-5)

    # A constant world offset is invisible to the root-relative metric but
    # not the absolute one.
    scalar_off, full_off = ds.evaluate(gt + np.array([10.0, 0, 0]))
    assert scalar_off == pytest.approx(0.0, abs=1e-4)
    assert full_off["per_pose_error"]["Average"]["Average"] == \
        pytest.approx(10.0, abs=1e-4)
    assert SEQ in full_off["per_pose_error"]["Average"]

    with pytest.raises(ValueError):
        ds.evaluate(gt[:, :5])


def test_engine_factory_builds_cmu(tmp_path):
    root, _ = _make_panoptic_root(tmp_path)
    from lt_tpu.engine.train import make_datasets
    from lt_tpu.utils.cfg import AttrDict

    split = {"panoptic_root": str(root), "sequences": [SEQ],
             "camera_names": ["00_00", "00_06"]}
    config = AttrDict({
        "image_shape": [64, 64],
        "dataset": {"kind": "cmu_panoptic", "n_views": 2,
                    "train": dict(split), "val": dict(split)},
    })
    train_ds, val_ds = make_datasets(config, is_train=True)
    assert len(train_ds) == 2 and len(val_ds) == 2
    assert val_ds.num_keypoints == 19
