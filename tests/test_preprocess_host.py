"""Goldens for the deterministic host preprocessing against the reference
transform semantics (CropLargerDimension.py, PadToSquaredEdgeAverage.py,
MONAI HistogramNormalized)."""
import numpy as np
import pytest

from vlp_tpu.data.preprocess_host import (
    ImageCache,
    crop_larger_dimension,
    equalize_hist,
    fold_mean_std,
    pad_to_square_edge_average,
    preprocess_image,
    to_grayscale,
)


class TestCropLargerDimension:
    def test_square_untouched(self):
        img = np.ones((100, 100), np.float32)
        assert crop_larger_dimension(img).shape == (100, 100)

    def test_height_larger_crops_5pct(self):
        # h=200,w=100: crop = 10, each side 5 -> 190x100
        img = np.arange(200 * 100, dtype=np.float32).reshape(200, 100)
        out = crop_larger_dimension(img, 0.05)
        assert out.shape == (190, 100)
        # symmetric: first row of output is original row 5
        np.testing.assert_array_equal(out[0], img[5])

    def test_never_past_square(self):
        # h=104,w=100: 5% of 104 = 5, 104-5 < 100 -> crop=4, each=2 -> 100x100
        img = np.zeros((104, 100), np.float32)
        assert crop_larger_dimension(img, 0.05).shape == (100, 100)

    def test_odd_crop_keeps_extra_pixel(self):
        # reference crops crop//2 from EACH side: h=110,w=100 -> crop=5,
        # each=2 -> 106 rows remain (not 105)
        img = np.zeros((110, 100), np.float32)
        assert crop_larger_dimension(img, 0.05).shape == (106, 100)

    def test_width_larger(self):
        img = np.zeros((100, 200), np.float32)
        assert crop_larger_dimension(img, 0.05).shape == (100, 190)


class TestPadToSquare:
    def test_square_untouched(self):
        img = np.ones((64, 64), np.float32)
        assert pad_to_square_edge_average(img).shape == (64, 64)

    def test_pad_width_edge_values(self):
        img = np.zeros((4, 2), np.float32)
        img[:, 0] = 10.0  # left column
        img[:, 1] = 20.0  # right column
        out = pad_to_square_edge_average(img)
        assert out.shape == (4, 4)
        assert np.all(out[:, 0] == 10.0)  # left pad = mean of left column
        assert np.all(out[:, -1] == 20.0)  # right pad = mean of right column

    def test_pad_height_split(self):
        # diff=3: top gets 1 row, bottom gets 2 (diff//2 / diff-diff//2)
        img = np.ones((2, 5), np.float32)
        out = pad_to_square_edge_average(img)
        assert out.shape == (5, 5)


class TestHistEq:
    def test_uniform_maps_to_identityish(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (64, 64)).astype(np.float32)
        out = equalize_hist(img)
        # uniform input: equalization ~ monotone map onto [0,255]
        assert out.min() >= -1e-3 and out.max() <= 255 + 1e-3
        # monotonicity on quantiles
        q_in = np.percentile(img, [10, 50, 90])
        q_out = np.percentile(out, [10, 50, 90])
        assert q_out[0] < q_out[1] < q_out[2]
        assert abs(np.corrcoef(np.sort(img.ravel()), np.sort(out.ravel()))[0, 1]) > 0.99

    def test_constant_image_no_nan(self):
        img = np.full((32, 32), 42.0, np.float32)
        out = equalize_hist(img)
        assert np.all(np.isfinite(out))

    def test_spreads_low_contrast(self):
        rng = np.random.default_rng(1)
        img = rng.normal(100, 2, (64, 64)).astype(np.float32)
        out = equalize_hist(img)
        assert out.std() > img.std() * 5  # contrast stretched


class TestFullPipeline:
    def test_output_contract(self):
        rng = np.random.default_rng(0)
        raw = rng.integers(0, 255, (300, 180, 3), dtype=np.uint8)
        out = preprocess_image(raw, image_size=224, crop=True)
        assert out.shape == (224, 224)
        assert out.dtype == np.uint8

    def test_grayscale_luma(self):
        img = np.zeros((2, 2, 3), np.uint8)
        img[..., 0] = 100  # pure red
        g = to_grayscale(img)
        np.testing.assert_allclose(g, 29.9, atol=0.01)

    def test_deterministic(self):
        rng = np.random.default_rng(3)
        raw = rng.integers(0, 255, (100, 90, 1), dtype=np.uint8)
        a = preprocess_image(raw)
        b = preprocess_image(raw)
        np.testing.assert_array_equal(a, b)


class TestImageCacheAndStats:
    def test_from_arrays_and_gather(self):
        imgs = np.arange(4 * 8 * 8, dtype=np.uint8).reshape(4, 8, 8)
        cache = ImageCache.from_arrays(imgs)
        assert len(cache) == 4
        got = cache.gather([2, 0])
        np.testing.assert_array_equal(got[0], imgs[2])

    def test_fold_mean_std_matches_numpy(self, tmp_path):
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (10, 16, 16), dtype=np.uint8)
        cache = ImageCache.from_arrays(imgs)
        mean, std = fold_mean_std(cache, range(10), cache_dir=str(tmp_path))
        ref = imgs.astype(np.float64)
        assert abs(mean - ref.mean()) < 1e-6
        assert abs(std - ref.std()) < 1e-6
        # cached value identical
        mean2, std2 = fold_mean_std(cache, range(10), cache_dir=str(tmp_path))
        assert (mean2, std2) == (mean, std)

    def test_build_disk_cache(self, tmp_path):
        rng = np.random.default_rng(0)
        import cv2

        paths = []
        for i in range(3):
            p = str(tmp_path / f"im{i}.png")
            cv2.imwrite(p, rng.integers(0, 255, (50, 40), dtype=np.uint8))
            paths.append(p)
        c1 = ImageCache.build(paths, str(tmp_path / "cache"), image_size=64)
        assert c1.data.shape == (3, 64, 64)
        c2 = ImageCache.build(paths, str(tmp_path / "cache"), image_size=64)
        np.testing.assert_array_equal(np.asarray(c1.data), np.asarray(c2.data))


class TestConfig:
    def test_experiment_registry_and_overrides(self):
        from vlp_tpu.config import Config, apply_overrides, get_experiment, list_experiments

        assert "baseline_only_imaging_resnet34" in list_experiments()
        cfg = get_experiment("baseline_only_imaging_resnet34")
        assert cfg.model.coral_lambda == 1000.0
        assert cfg.data.batch_size == 64
        cfg = apply_overrides(Config(), [
            "experiment=pretrain_resnet34_tinybert",
            "optimizer.lr=0.005",
            "data.batch_size=256",
            "trainer.max_epochs=3",
            "model.text_encoder_lr=null",
        ])
        assert cfg.model.text_model == "tinybert"
        assert cfg.optimizer.lr == 0.005
        assert cfg.data.batch_size == 256
        assert cfg.model.text_encoder_lr is None

    def test_bad_override_raises(self):
        from vlp_tpu.config import Config, apply_overrides

        with pytest.raises(AttributeError):
            apply_overrides(Config(), ["optimizer.nonexistent=1"])
