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
