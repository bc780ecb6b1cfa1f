"""Native C++ image pipeline tests: build, decode parity, pipeline parity."""

import os

import numpy as np
import pytest

from lt_tpu import native
from lt_tpu.utils import img as img_utils

pytestmark = pytest.mark.skipif(not native.available(),
                                reason=f"native lib unavailable: "
                                       f"{native.build_error()}")


@pytest.fixture(scope="module")
def jpeg_file(tmp_path_factory):
    import cv2

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (120, 160, 3)).astype(np.uint8)
    # Smooth it so JPEG loss is small and decoders agree closely.
    img = cv2.GaussianBlur(img, (0, 0), 3)
    path = str(tmp_path_factory.mktemp("imgs") / "test.jpg")
    cv2.imwrite(path, img, [cv2.IMWRITE_JPEG_QUALITY, 98])
    return path


def test_decode_matches_cv2(jpeg_file):
    import cv2

    ref = cv2.imread(jpeg_file)
    got = native.decode_jpeg(jpeg_file)
    assert got is not None
    assert got.shape == ref.shape
    # Different IDCT implementations may differ by a couple of levels.
    assert np.abs(got.astype(int) - ref.astype(int)).mean() < 2.0


def test_process_image_matches_numpy_path(jpeg_file):
    import cv2

    image = cv2.imread(jpeg_file)
    bbox = (-10, 20, 150, 180)  # extends past the source: zero-pad region

    ref = img_utils.crop_image(image, bbox)
    ref = img_utils.resize_image(ref, (64, 64))
    ref = img_utils.normalize_image(ref)

    got = native.process_image(image, bbox, (64, 64), normalize=True)
    assert got is not None
    assert got.shape == ref.shape
    # INTER_AREA implementations: allow small numeric differences.
    assert np.abs(got - ref).mean() < 0.05
    assert np.abs(got - ref).max() < 0.6


def test_batch_loader(jpeg_file):
    loader = native.NativeBatchLoader(n_threads=4)
    paths = [jpeg_file] * 8 + ["/nonexistent.jpg"]
    bboxes = np.tile(np.array([0, 0, 120, 120], np.int32), (9, 1))
    batch, ok = loader.load(paths, bboxes, (96, 96))
    assert batch.shape == (9, 96, 96, 3)
    assert ok[:8].all() and not ok[8]
    # All identical inputs -> identical outputs (thread safety).
    for i in range(1, 8):
        np.testing.assert_array_equal(batch[0], batch[i])
    loader.close()


def _fake_h36m_tree(root, n_frames=3):
    """A tiny on-disk H36M corpus: one subject/action, two cameras."""
    import cv2

    rng = np.random.RandomState(1)
    cameras = ["c0", "c1"]
    for cam in cameras:
        d = os.path.join(root, "S1", "Posing-1", "imageSequence", cam)
        os.makedirs(d)
        for f in range(n_frames):
            img = cv2.GaussianBlur(
                rng.randint(0, 255, (120, 160, 3)).astype(np.uint8),
                (0, 0), 3)
            cv2.imwrite(os.path.join(d, "img_%06d.jpg" % (f + 1)),
                        img, [cv2.IMWRITE_JPEG_QUALITY, 98])

    table = np.zeros(n_frames, dtype=[
        ("subject_idx", int), ("action_idx", int), ("frame_idx", int),
        ("keypoints", np.float32, (17, 3)),
        ("bbox_by_camera_tlbr", int, (2, 4))])
    table["frame_idx"] = np.arange(n_frames)
    table["keypoints"] = rng.uniform(-500, 500, (n_frames, 17, 3))
    table["bbox_by_camera_tlbr"][:] = (10, 20, 110, 120)  # TLBR

    subjects = ["S1", "S5", "S6", "S7", "S8", "S9", "S11"]
    cams = np.zeros((len(subjects), 2),
                    dtype=[("R", np.float32, (3, 3)),
                           ("t", np.float32, (3, 1)),
                           ("K", np.float32, (3, 3)),
                           ("dist", np.float32, 5)])
    cams["R"] = np.eye(3)
    cams["K"] = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    labels = {"table": table, "subject_names": subjects,
              "action_names": ["Posing-1"], "camera_names": ["c0", "c1"],
              "cameras": cams}
    labels_path = os.path.join(root, "labels.npy")
    np.save(labels_path, labels, allow_pickle=True)
    return labels_path


def test_h36m_get_batch_matches_getitem(tmp_path):
    """The one-call thread-pooled batch path == the per-sample path."""
    from lt_tpu.data.human36m import Human36MMultiViewDataset

    labels_path = _fake_h36m_tree(str(tmp_path))
    ds = Human36MMultiViewDataset(
        h36m_root=str(tmp_path), labels_path=labels_path, train=True,
        image_shape=(64, 64), kind="human36m", scale_bbox=1.0)
    assert ds._fast_path

    batch_items = ds.get_batch([0, 1, 2])
    for i, item in enumerate(batch_items):
        ref = ds[i]
        assert item["view_valid"] == ref["view_valid"]
        for v in range(2):
            np.testing.assert_allclose(item["images"][v], ref["images"][v],
                                       atol=1e-5)
            np.testing.assert_allclose(item["cameras_K"][v],
                                       ref["cameras_K"][v])
        np.testing.assert_array_equal(item["keypoints_3d"],
                                      ref["keypoints_3d"])


def test_batch_iterator_prefetch_equivalence(tmp_path):
    """Prefetching must not change batch contents or order."""
    from lt_tpu.data.batch import BatchIterator
    from lt_tpu.data.synthetic import SyntheticMultiViewDataset

    ds = SyntheticMultiViewDataset(n_samples=12, n_views=2, num_joints=3,
                                   image_size=32)
    sync_it = BatchIterator(ds, batch_size=4, shuffle=True, seed=3,
                            prefetch=0)
    pre_it = BatchIterator(ds, batch_size=4, shuffle=True, seed=3,
                           prefetch=2)
    sync_batches = list(sync_it.epoch(1))
    pre_batches = list(pre_it.epoch(1))
    assert len(sync_batches) == len(pre_batches) == 3
    for a, b in zip(sync_batches, pre_batches):
        np.testing.assert_array_equal(a["indexes"], b["indexes"])
        np.testing.assert_array_equal(a["images"], b["images"])
