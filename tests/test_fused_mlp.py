"""Fused MLP kernel (ops/fused_mlp.py) vs the unfused XLA reference.

Interpreter mode on CPU; value-level parity for forward and ALL gradient
paths including the grid-accumulated weight/bias grads."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlp_tpu.ops import fused_mlp as FM


def _setup(m=128, d=32, f=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, d)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(d) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _ref(x, w1, b1, w2, b2):
    import flax.linen as nn

    return nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2


class TestFusedMlp:
    def test_forward_matches(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        args = _setup()
        np.testing.assert_allclose(np.asarray(FM.fused_mlp(*args)),
                                   np.asarray(_ref(*args)), atol=2e-5)

    def test_all_gradients_match(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        args = _setup(seed=1)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) * jnp.cos(a[0]))

        g_ref = jax.grad(loss(_ref), tuple(range(5)))(*args)
        g_out = jax.grad(loss(FM.fused_mlp), tuple(range(5)))(*args)
        names = ("dx", "dw1", "db1", "dw2", "db2")
        for a, b, nm in zip(g_ref, g_out, names):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=5e-5, err_msg=nm)

    def test_multi_tile_accumulation(self, monkeypatch):
        """M spanning several grid programs: weight grads must accumulate
        across tiles, not reflect only the last tile."""
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        args = _setup(m=256, seed=2)  # tile 64 -> 4 programs

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) ** 2)

        g_ref = jax.grad(loss(_ref), (1, 3))(*args)
        g_out = jax.grad(loss(FM.fused_mlp), (1, 3))(*args)
        for a, b in zip(g_ref, g_out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=5e-4)

    def test_supports_gates_shapes(self):
        assert FM.supports(25088, 384, 1536)  # nest_small level 2
        assert FM.supports(401408, 96, 384)  # nest_small level 0
        assert not FM.supports(25216, 768, 3072)  # ViT-B: weights >> VMEM
        assert not FM.supports(25089, 384, 1536)  # no dividing tile

    def test_mlp_block_fused_matches_unfused(self, monkeypatch):
        """MlpBlock(fused=True) under interpret == the unfused path with the
        SAME param tree (checkpoint compatibility)."""
        from vlp_tpu.models.vit import MlpBlock

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, 64, 32)), jnp.float32)
        blk_u = MlpBlock(64, dtype=jnp.float32, fused=False)
        blk_f = MlpBlock(64, dtype=jnp.float32, fused=True)
        p = blk_u.init(jax.random.key(0), x)
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        out_f = blk_f.apply(p, x)  # same tree accepted by the fused path
        np.testing.assert_allclose(np.asarray(out_f),
                                   np.asarray(blk_u.apply(p, x)), atol=2e-5)
