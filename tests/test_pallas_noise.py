"""Hardware-PRNG Gaussian noise kernel (ops/pallas_noise.py): distribution
checks under the Pallas interpreter."""
import numpy as np
import pytest

import jax.numpy as jnp

from vlp_tpu.ops.pallas_noise import add_gaussian_noise


def _draw(b=4, h=64, w=128, sigma=2.5, seed0=7):
    x = jnp.zeros((b, h, w), jnp.float32)
    seeds = jnp.arange(seed0, seed0 + b, dtype=jnp.int32)
    sig = jnp.full((b,), sigma, jnp.float32)
    try:
        out = add_gaussian_noise(x, seeds, sig, interpret=True)
    except Exception as e:  # pragma: no cover - interpreter support varies
        pytest.skip(f"pallas interpreter lacks TPU PRNG support: {e}")
    return np.asarray(out)


class TestGaussianNoiseKernel:
    def test_moments_and_normality(self):
        n = _draw(sigma=2.5)
        flat = n.reshape(-1)
        assert abs(flat.mean()) < 0.05
        assert abs(flat.std() - 2.5) < 0.05
        # standardized 4th moment (kurtosis) of a Gaussian is 3
        z = flat / flat.std()
        assert abs((z ** 4).mean() - 3.0) < 0.2

    def test_zero_sigma_is_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 64, 128)).astype(np.float32))
        seeds = jnp.arange(2, dtype=jnp.int32)
        try:
            out = add_gaussian_noise(x, seeds, jnp.zeros(2), interpret=True)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"pallas interpreter lacks TPU PRNG support: {e}")
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))

    def test_streams_differ_per_sample_and_seed(self):
        a = _draw(seed0=7)
        b = _draw(seed0=7)
        c = _draw(seed0=99)
        np.testing.assert_array_equal(a, b)  # deterministic
        assert not np.allclose(a[0], a[1])  # per-sample streams differ
        assert not np.allclose(a, c)  # seed changes the stream
