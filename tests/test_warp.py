"""Shear/matmul warp vs the gather reference warp: same affine family, close
agreement on smooth images."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.ops.augment import _warp_one
from vlp_tpu.ops.warp import affine_warp_shear


def _smooth_image(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        120 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 7.0)
        + 20 * np.sin((xx + yy) / 11.0)
    )
    return jnp.asarray(img + rng.normal(0, 1, (h, w)).astype(np.float32))


def _compare(theta, zoom, tx, ty, tol_interior):
    img = _smooth_image()
    ref = _warp_one(img, jnp.float32(tx), jnp.float32(ty),
                    jnp.float32(theta), jnp.float32(zoom), jnp.float32(0.0))
    new = affine_warp_shear(img[None], jnp.array([theta], jnp.float32),
                            jnp.array([zoom], jnp.float32),
                            jnp.array([tx], jnp.float32),
                            jnp.array([ty], jnp.float32))[0]
    # compare away from borders (padding conventions differ at the edge)
    m = 10
    diff = np.abs(np.asarray(ref)[m:-m, m:-m] - np.asarray(new)[m:-m, m:-m])
    assert diff.max() < tol_interior, f"max diff {diff.max():.2f}"


class TestShearWarpParity:
    def test_identity(self):
        _compare(0.0, 1.0, 0.0, 0.0, 1e-3)

    def test_translation_only(self):
        _compare(0.0, 1.0, 5.3, -7.8, 0.5)

    def test_rotation_only(self):
        _compare(np.pi / 12, 1.0, 0.0, 0.0, 6.0)  # 15 deg

    def test_zoom_only(self):
        _compare(0.0, 1.25, 0.0, 0.0, 2.0)

    def test_combined(self):
        _compare(-np.pi / 9, 1.15, 8.0, -12.0, 8.0)

    def test_batch_and_per_sample_params(self):
        imgs = jnp.stack([_smooth_image(seed=i) for i in range(3)])
        theta = jnp.array([0.0, 0.3, -0.2])
        zoom = jnp.array([1.0, 1.2, 1.1])
        tx = jnp.array([0.0, 5.0, -5.0])
        ty = jnp.array([0.0, -3.0, 3.0])
        out = affine_warp_shear(imgs, theta, zoom, tx, ty)
        assert out.shape == imgs.shape
        # sample 0 is identity
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(imgs[0]),
                                   atol=1e-2)
        # others differ
        assert float(jnp.abs(out[1] - imgs[1]).max()) > 1.0

    def test_correlation_high(self):
        """Strong structural agreement on a realistic transform."""
        img = _smooth_image()
        theta, zoom, tx, ty = 0.4, 1.2, 10.0, -6.0
        ref = _warp_one(img, jnp.float32(tx), jnp.float32(ty),
                        jnp.float32(theta), jnp.float32(zoom),
                        jnp.float32(0.0))
        new = affine_warp_shear(img[None], jnp.array([theta]),
                                jnp.array([zoom]), jnp.array([tx]),
                                jnp.array([ty]))[0]
        m = 8
        a = np.asarray(ref)[m:-m, m:-m].ravel()
        b = np.asarray(new)[m:-m, m:-m].ravel()
        assert np.corrcoef(a, b)[0, 1] > 0.995
