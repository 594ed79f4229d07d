"""shard_map-wrapped Pallas kernels on the 8-device CPU mesh.

VERDICT r2 #1: the fused kernels must run multi-device. These tests register
an 8-device kernel mesh and run the kernels under the Pallas interpreter
inside shard_map, asserting value AND gradient parity with (a) the same
kernel without a mesh and (b) the pure-XLA reference math. The fused_mlp
weight gradients specifically exercise shard_map's psum of replicated-input
cotangents.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlp_tpu.ops import block_attention as ba
from vlp_tpu.ops import fused_mlp as FM
from vlp_tpu.ops.kernel_gate import active_kernel_mesh, set_kernel_mesh
from vlp_tpu.parallel.mesh import create_mesh


@pytest.fixture
def mesh8():
    mesh = create_mesh()  # registers itself as the kernel mesh
    assert mesh.size == 8
    yield mesh
    set_kernel_mesh(None)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape),
                       jnp.float32)


class TestShardedAttention:
    def test_forward_and_grad_match_unsharded(self, mesh8, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        qkv = _rand((16, 8, 48), seed=0)  # d=16, 2 heads, 2 rows/shard

        def loss(t):
            return jnp.sum(ba.attend_qkv(t, 2) * jnp.cos(t[..., :16]))

        assert active_kernel_mesh()[0] is not None
        out_m = ba.attend_qkv(qkv, 2)
        g_m = jax.grad(loss)(qkv)
        set_kernel_mesh(None)
        out_1 = ba.attend_qkv(qkv, 2)
        g_1 = jax.grad(loss)(qkv)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_1),
                                   atol=1e-5)

    def test_indivisible_batch_falls_back(self, mesh8, monkeypatch):
        """n not divisible by the mesh: XLA fallback, still correct."""
        import flax.linen as nn

        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        qkv = _rand((6, 8, 48), seed=1)
        out = ba.attend_qkv(qkv, 2)
        q, k, v = (qkv[..., :16], qkv[..., 16:32], qkv[..., 32:])
        split = lambda x: x.reshape(6, 8, 2, 8)
        ref = nn.dot_product_attention(split(q), split(k), split(v))
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.reshape(6, 8, 16)),
                                   atol=1e-5)


class TestShardedFusedMlp:
    def test_forward_and_all_grads_match_reference(self, mesh8, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        m, d, f = 512, 32, 64  # 64 rows/shard -> tile 64
        x = _rand((m, d), seed=2)
        w1, b1 = _rand((d, f), 3), _rand((f,), 4) * 0.1
        w2, b2 = _rand((f, d), 5), _rand((d,), 6) * 0.1
        assert FM.supports(m // 8, d, f, 4)

        def ref(x, w1, b1, w2, b2):
            h = jax.nn.gelu(x @ w1 + b1, approximate=False)
            return h @ w2 + b2

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) * jnp.sin(a[0]))

        out_m = FM.fused_mlp(x, w1, b1, w2, b2)
        g_m = jax.grad(loss(FM.fused_mlp), (0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        g_r = jax.grad(loss(ref), (0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out_m),
                                   np.asarray(ref(x, w1, b1, w2, b2)),
                                   atol=2e-4)
        for a, b in zip(g_m, g_r):
            # weight grads sum over all 512 rows across 8 shards (psum path)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)

    def test_unsharded_equals_sharded(self, mesh8, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        m, d, f = 512, 32, 64
        args = (_rand((m, d), 7), _rand((d, f), 8), _rand((f,), 9) * 0.1,
                _rand((f, d), 10), _rand((d,), 11) * 0.1)
        out_m = FM.fused_mlp(*args)
        set_kernel_mesh(None)
        out_1 = FM.fused_mlp(*args)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_1),
                                   atol=1e-5)


class TestShardedEncoderBlock:
    def test_block_mesh_vs_single_device(self, mesh8, monkeypatch):
        """Full fused EncoderBlock (attention + MLP kernels) under the mesh
        == the same params without a mesh, forward and param grads."""
        from vlp_tpu.models.vit import EncoderBlock

        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        x = _rand((64, 8, 32), seed=12)
        blk = EncoderBlock(num_heads=2, dtype=jnp.float32)
        params = blk.init(jax.random.key(0), x)

        def loss(p, x):
            return jnp.sum(jnp.tanh(blk.apply(p, x)))

        out_m = blk.apply(params, x)
        g_m = jax.grad(loss)(params, x)
        set_kernel_mesh(None)
        out_1 = blk.apply(params, x)
        g_1 = jax.grad(loss)(params, x)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_1),
                                   atol=1e-5)
        flat_m = jax.tree.leaves(g_m)
        flat_1 = jax.tree.leaves(g_1)
        for a, b in zip(flat_m, flat_1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=1e-4)

    def test_block_under_mesh_jit_sharded_inputs(self, mesh8, monkeypatch):
        """The kernels lower inside a mesh-sharded jit (the dryrun/driver
        configuration): batch-sharded input, replicated params."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vlp_tpu.models.vit import EncoderBlock

        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        x = _rand((64, 8, 32), seed=13)
        blk = EncoderBlock(num_heads=2, dtype=jnp.float32)
        params = blk.init(jax.random.key(0), x)
        fn = jax.jit(blk.apply,
                     in_shardings=(NamedSharding(mesh8, P()),
                                   NamedSharding(mesh8, P("data"))))
        out_m = fn(params, jax.device_put(
            x, NamedSharding(mesh8, P("data"))))
        set_kernel_mesh(None)
        ref = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(ref),
                                   atol=1e-5)


class TestShardedAugmentKernels:
    def test_augment_under_mesh_matches_unsharded(self, mesh8, monkeypatch):
        """augment_and_normalize dispatches the Pallas shear warp under a
        multi-device mesh via shard_wrap (regression: a raw pallas_call in
        a mesh-sharded program fails to lower on multi-chip TPU); the
        wrapped path must equal the unwrapped one bit-for-bit."""
        import jax

        from vlp_tpu.ops.augment import AugmentConfig, augment_and_normalize

        x = jnp.asarray(np.random.default_rng(0).integers(
            0, 255, (16, 32, 32), dtype=np.uint8))
        key = jax.random.key(7)
        cfg = AugmentConfig()
        out_m = augment_and_normalize(x, key, jnp.float32(128.0),
                                      jnp.float32(30.0), cfg,
                                      dtype=jnp.float32)
        out_m = np.asarray(out_m).copy()
        set_kernel_mesh(None)
        # NO manual cache clearing: the static dispatch_key
        # (kernel_gate.kernel_dispatch_key) must force the retrace by
        # itself — regression for the stale-dispatch jit-cache hazard
        # (a mesh-wrapped trace reused after the mesh is gone, or a
        # pre-mesh XLA trace reused under a mesh)
        out_1 = augment_and_normalize(x, key, jnp.float32(128.0),
                                      jnp.float32(30.0), cfg,
                                      dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(out_m), np.asarray(out_1))


def test_set_kernel_mesh_quarantines_2d_mesh():
    """A 2-D (data x model) mesh never becomes the kernel mesh: the kernel
    shard_map specs assume every device is a data shard, so registering a
    TP mesh (as the step factories do unconditionally) must leave kernels
    on their XLA fallbacks — regression for step factories undoing
    create_mesh's quarantine."""
    mesh2d = create_mesh(model_parallel=2)
    try:
        assert active_kernel_mesh() == (None, None)  # create_mesh side
        set_kernel_mesh(mesh2d, "data")  # what make_train_step does
        assert active_kernel_mesh() == (None, None)
        set_kernel_mesh(create_mesh())  # 1-D re-registers fine
        assert active_kernel_mesh()[0] is not None
    finally:
        set_kernel_mesh(None)
