"""Direct tests of the Pallas shear kernel against a NumPy reference
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from vlp_tpu.ops.pallas_shear import shear_axis1_batched


def _numpy_shift(images, shift, max_shift):
    """out[b,y,x] = images[b,y,x+shift] with edge clamp + bilinear."""
    b, h, w = images.shape
    out = np.zeros_like(images)
    for bi in range(b):
        for y in range(h):
            s = np.clip(shift[bi, y], -max_shift, max_shift)
            xs = np.arange(w, dtype=np.float64) + s
            xs = np.clip(xs, 0, w - 1)
            k = np.floor(xs).astype(int)
            f = xs - k
            k1 = np.minimum(k + 1, w - 1)
            row = images[bi, y].astype(np.float64)
            out[bi, y] = row[k] * (1 - f) + row[k1] * f
    return out


class TestPallasShear:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        images = rng.normal(100, 30, (4, 16, 64)).astype(np.float32)
        shift = rng.uniform(-10, 10, (4, 16)).astype(np.float32)
        out = shear_axis1_batched(jnp.asarray(images), jnp.asarray(shift),
                                  max_shift=12, interpret=True)
        ref = _numpy_shift(images, shift, 12)
        # interior only: edge-padding conventions differ at the clamp
        border = 14
        diff = np.abs(np.asarray(out)[:, :, border:-border]
                      - ref[:, :, border:-border])
        assert diff.max() < 1e-3

    def test_zero_shift_identity(self):
        rng = np.random.default_rng(1)
        images = rng.normal(size=(2, 8, 128)).astype(np.float32)
        out = shear_axis1_batched(jnp.asarray(images),
                                  jnp.zeros((2, 8), jnp.float32),
                                  max_shift=5, interpret=True)
        np.testing.assert_allclose(np.asarray(out), images, atol=1e-5)

    def test_integer_shift_exact(self):
        images = np.tile(np.arange(64, dtype=np.float32), (1, 4, 1))
        shift = np.full((1, 4), 3.0, np.float32)
        out = shear_axis1_batched(jnp.asarray(images), jnp.asarray(shift),
                                  max_shift=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out)[0, 0, :50],
                                   images[0, 0, 3:53], atol=1e-5)

    def test_fractional_shift_lerp(self):
        images = np.tile(np.arange(64, dtype=np.float32), (1, 2, 1))
        shift = np.full((1, 2), 2.5, np.float32)
        out = shear_axis1_batched(jnp.asarray(images), jnp.asarray(shift),
                                  max_shift=4, interpret=True)
        # linear ramp: fractional shift is exact
        np.testing.assert_allclose(np.asarray(out)[0, 0, :50],
                                   images[0, 0, :50] + 2.5, atol=1e-4)

    def test_negative_shift(self):
        images = np.tile(np.arange(64, dtype=np.float32), (1, 2, 1))
        shift = np.full((1, 2), -4.0, np.float32)
        out = shear_axis1_batched(jnp.asarray(images), jnp.asarray(shift),
                                  max_shift=6, interpret=True)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 10:60],
                                   images[0, 0, 6:56], atol=1e-5)

    def test_shift_clamped_to_max(self):
        images = np.tile(np.arange(64, dtype=np.float32), (1, 2, 1))
        out_big = shear_axis1_batched(jnp.asarray(images),
                                      jnp.full((1, 2), 100.0),
                                      max_shift=5, interpret=True)
        out_five = shear_axis1_batched(jnp.asarray(images),
                                       jnp.full((1, 2), 5.0),
                                       max_shift=5, interpret=True)
        np.testing.assert_allclose(np.asarray(out_big), np.asarray(out_five),
                                   atol=1e-5)
