"""Native C++ preprocessing: parity with the NumPy reference pipeline and
thread-pool batch correctness. Skips when g++/the .so is unavailable."""
import numpy as np
import pytest

from vlp_tpu.data.preprocess_host import preprocess_image
from vlp_tpu.native import (
    get_lib,
    preprocess_batch_native,
    preprocess_image_native,
)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native library unavailable")


class TestNativeParity:
    @pytest.mark.parametrize("h,w,c,crop", [
        (355, 251, 3, True), (188, 345, 1, False), (97, 97, 3, False),
        (120, 64, 1, True),
    ])
    def test_matches_numpy_within_1lsb(self, h, w, c, crop):
        rng = np.random.default_rng(h * w)
        img = rng.integers(0, 255, (h, w, c), dtype=np.uint8)
        py = preprocess_image(img, image_size=96, crop=crop)
        na = preprocess_image_native(img, 96, crop=crop)
        diff = np.abs(py.astype(int) - na.astype(int))
        assert diff.max() <= 1
        assert diff.mean() < 0.01

    def test_no_equalize(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (100, 80, 1), dtype=np.uint8)
        py = preprocess_image(img, image_size=64, equalize=False)
        na = preprocess_image_native(img, 64, equalize=False)
        assert np.abs(py.astype(int) - na.astype(int)).max() <= 1

    def test_batch_matches_single(self):
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (6, 120, 100, 1), dtype=np.uint8)
        batch = preprocess_batch_native(imgs, 64, num_threads=4)
        for i in range(6):
            single = preprocess_image_native(imgs[i], 64)
            np.testing.assert_array_equal(batch[i], single)

    def test_constant_image(self):
        img = np.full((50, 60, 1), 42, np.uint8)
        out = preprocess_image_native(img, 32)
        assert out.shape == (32, 32)
        assert np.all(np.isfinite(out.astype(float)))
