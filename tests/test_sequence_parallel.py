"""Sequence parallelism (parallel/sequence.py): token-dim activation
sharding by GSPMD annotation must be a pure re-layout — values AND grads
identical to the sequential block stack, with and without a composed data
axis, with the collectives confined to the attention contractions.
Blocks are REAL ViT EncoderBlocks (XLA paths), not toys.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.models.vit import EncoderBlock
from vlp_tpu.parallel.sequence import (create_seq_mesh, make_seq_parallel_fn,
                                       token_sharding)

DEPTH, HEADS, DIM, TOK = 2, 2, 16, 8


@pytest.fixture(scope="module")
def block_setup():
    block = EncoderBlock(HEADS, 4.0, jnp.float32, fused_attention=False,
                         megakernel=False)
    x1 = jnp.zeros((2, TOK, DIM), jnp.float32)
    keys = jax.random.split(jax.random.key(0), DEPTH)
    params = [block.init(k, x1)["params"] for k in keys]
    apply_fn = lambda p, h: block.apply({"params": p}, h)
    return block, params, apply_fn


def _sequential(apply_fn, params, x):
    h = x
    for p in params:
        h = apply_fn(p, h)
    return h


def test_seq_parallel_matches_sequential(block_setup):
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, TOK, DIM)), jnp.float32)

    mesh = create_seq_mesh(4)
    sp = jax.jit(make_seq_parallel_fn(apply_fn, mesh))
    y = sp(params, jax.device_put(x, token_sharding(mesh)))
    # the activation layout really is token-sharded on the way out (GSPMD
    # normalizes the size-1 'data' axis out of the spec)
    assert y.sharding.spec[1] == "seq", y.sharding
    ref = _sequential(apply_fn, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_seq_parallel_inserts_collectives(block_setup):
    """The compiled partitioned program must communicate (attention
    contracts over the sharded token dim) — proves the constraint is a
    real layout, not a replicated no-op."""
    _, params, apply_fn = block_setup
    mesh = create_seq_mesh(4)
    x = jnp.zeros((2, TOK, DIM), jnp.float32)
    lowered = jax.jit(make_seq_parallel_fn(apply_fn, mesh)).lower(
        params, jax.device_put(x, token_sharding(mesh)))
    txt = lowered.compile().as_text()
    assert any(c in txt for c in
               ("all-gather", "all-to-all", "collective-permute",
                "all-reduce")), "no collectives in the SP program"


def test_seq_parallel_grads_match_sequential(block_setup):
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, TOK, DIM)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, TOK, DIM)), jnp.float32)

    mesh = create_seq_mesh(4)
    sp = make_seq_parallel_fn(apply_fn, mesh)

    def loss_sp(plist, xx):
        return jnp.sum(sp(plist, xx) * w)

    def loss_seq(plist, xx):
        return jnp.sum(_sequential(apply_fn, plist, xx) * w)

    gp, gx = jax.jit(jax.grad(loss_sp, argnums=(0, 1)))(params, x)
    gs, gxs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxs), atol=1e-5)
    # atol floor: the attention key bias grad is mathematically zero
    # (softmax shift invariance) — roundoff noise on both sides
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        diff = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max())
        assert diff <= 1e-5 + 1e-4 * scale, \
            f"sp grad divergence {diff} (leaf scale {scale})"


def test_seq_parallel_composes_with_data_parallel(block_setup):
    """2-D (data=2, seq=4) mesh: batch over 'data' AND tokens over 'seq'
    — values still match sequential."""
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, TOK, DIM)), jnp.float32)

    mesh = create_seq_mesh(4, data_parallel=2)
    assert mesh.devices.shape == (2, 4)
    sp = jax.jit(make_seq_parallel_fn(apply_fn, mesh))
    y = sp(params, jax.device_put(x, token_sharding(mesh)))
    ref = _sequential(apply_fn, params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_seq_parallel_validation_errors():
    with pytest.raises(ValueError, match="devices"):
        create_seq_mesh(4, data_parallel=4)  # 16 > 8
    mesh = create_seq_mesh(4)
    with pytest.raises(ValueError, match="seq"):
        make_seq_parallel_fn(lambda p, h: h,
                             jax.sharding.Mesh(
                                 np.asarray(jax.devices()[:2]), ("data",)))
    fn = make_seq_parallel_fn(lambda p, h: h, mesh)
    with pytest.raises(ValueError, match="divisible"):
        fn([], jnp.zeros((2, 6, 8)))  # T=6 % 4 != 0
    with pytest.raises(ValueError, match="B, T, D"):
        fn([], jnp.zeros((2, 8)))
