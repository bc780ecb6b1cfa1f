"""Visualization suite smoke tests (image outputs, shapes, dtypes)."""

import numpy as np

from lt_tpu.data.synthetic import SyntheticMultiViewDataset
from lt_tpu.data.batch import collate
from lt_tpu.utils import vis


def _batch():
    ds = SyntheticMultiViewDataset(n_samples=2, n_views=3, num_joints=17,
                                   image_size=64)
    return collate([ds[0], ds[1]]), ds


def test_visualize_batch_and_heatmaps():
    batch, ds = _batch()
    heatmaps = np.random.RandomState(0).rand(2, 3, 17, 16, 16)
    kp2d = np.random.RandomState(1).rand(2, 3, 17, 2) * 64
    kp3d = batch["keypoints_3d"][:, :, :3]

    sides = np.array([500.0, 500.0, 500.0], np.float32)
    img = vis.visualize_batch(batch["images"], heatmaps, kp2d,
                              batch["proj_matrices"], kp3d, kp3d + 20.0,
                              kind="human36m",
                              confidences=np.random.rand(2, 3, 17),
                              cuboids=(kp3d[:, 6] - sides / 2, sides))
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100

    img2 = vis.visualize_heatmaps(batch["images"], heatmaps)
    assert img2.dtype == np.uint8 and img2.ndim == 3

    vols = np.random.RandomState(2).rand(2, 17, 8, 8, 8)
    img3 = vis.visualize_volumes(batch["images"], vols,
                                 batch["proj_matrices"])
    assert img3.dtype == np.uint8 and img3.ndim == 3


def test_draw_2d_pose_image_and_voxels():
    kp = np.random.RandomState(0).rand(17, 2) * 60
    image = np.zeros((64, 64, 3), np.uint8)
    out = vis.draw_2d_pose_image(kp, image, kind="human36m")
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0  # something was drawn

    vox = np.random.RandomState(1).rand(16, 16, 16)
    img = vis.draw_voxels(vox)
    assert img.dtype == np.uint8 and img.ndim == 3
