"""Pipeline parallelism (parallel/pipeline.py): the GPipe fill-drain
schedule over a 'stage' mesh axis must be a pure re-schedule — values AND
grads identical to running the full block stack sequentially, with and
without a composed data axis. Stages are REAL ViT EncoderBlocks (XLA
paths), not toys.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.models.vit import EncoderBlock
from vlp_tpu.parallel.pipeline import (create_pipeline_mesh,
                                       make_pipeline_fn,
                                       scan_blocks_stage_fn,
                                       stack_stage_params,
                                       stage_params_sharding)

DEPTH, STAGES, HEADS, DIM, TOK = 8, 4, 2, 16, 6


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


def _microbatches(batch, m):
    return batch.reshape((m, batch.shape[0] // m) + batch.shape[1:])


def test_pipeline_matches_sequential(block_setup):
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, TOK, DIM)), jnp.float32)

    mesh = create_pipeline_mesh(STAGES)
    stacked = stack_stage_params(params, STAGES)
    stacked = jax.tree.map(jax.device_put, stacked,
                           stage_params_sharding(stacked, mesh))
    pipe = jax.jit(make_pipeline_fn(scan_blocks_stage_fn(apply_fn), mesh,
                                    STAGES, n_microbatches=4))
    y = pipe(stacked, _microbatches(x, 4))
    ref = _sequential(apply_fn, params, x)
    np.testing.assert_allclose(np.asarray(y).reshape(ref.shape),
                               np.asarray(ref), atol=1e-5)


def test_pipeline_grads_match_sequential(block_setup):
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, TOK, DIM)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, TOK, DIM)), jnp.float32)

    mesh = create_pipeline_mesh(STAGES)
    stacked = stack_stage_params(params, STAGES)
    pipe = make_pipeline_fn(scan_blocks_stage_fn(apply_fn), mesh, STAGES,
                            n_microbatches=2)

    def loss_pipe(sp):
        return jnp.sum(pipe(sp, _microbatches(x, 2)) *
                       _microbatches(w, 2))

    def loss_seq(plist):
        return jnp.sum(_sequential(apply_fn, plist, x) * w)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = stack_stage_params(jax.grad(loss_seq)(params), STAGES)
    flat_p, flat_s = jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)
    # atol floor: the attention key bias grad is mathematically zero
    # (softmax shift invariance), so both sides are ~1e-6 roundoff noise
    # there and a purely relative check would compare noise to noise
    for a, b in zip(flat_p, flat_s):
        diff = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(b).max())
        assert diff <= 1e-5 + 1e-4 * scale, \
            f"pipeline grad divergence {diff} (leaf scale {scale})"


def test_pipeline_composes_with_data_parallel(block_setup):
    """2-D (data=2, stage=4) mesh: batch dim sharded over 'data', the
    schedule runs per data shard — values still match sequential."""
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, TOK, DIM)), jnp.float32)

    mesh = create_pipeline_mesh(STAGES, data_parallel=2)
    assert mesh.devices.shape == (2, STAGES)
    stacked = stack_stage_params(params, STAGES)
    stacked = jax.tree.map(jax.device_put, stacked,
                           stage_params_sharding(stacked, mesh))
    pipe = jax.jit(make_pipeline_fn(scan_blocks_stage_fn(apply_fn), mesh,
                                    STAGES, n_microbatches=2))
    y = pipe(stacked, _microbatches(x, 2))
    ref = _sequential(apply_fn, params, x)
    np.testing.assert_allclose(np.asarray(y).reshape(ref.shape),
                               np.asarray(ref), atol=1e-5)


def test_pipeline_one_sgd_step_matches(block_setup):
    """One SGD step on the pipelined loss == one step on the sequential
    loss — pp is a re-schedule of the same training math."""
    _, params, apply_fn = block_setup
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, TOK, DIM)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((4, TOK, DIM)), jnp.float32)

    mesh = create_pipeline_mesh(STAGES)
    stacked = stack_stage_params(params, STAGES)
    pipe = make_pipeline_fn(scan_blocks_stage_fn(apply_fn), mesh, STAGES,
                            n_microbatches=2)

    def l_pipe(sp):
        d = pipe(sp, _microbatches(x, 2)) - _microbatches(tgt, 2)
        return jnp.mean(d * d)

    def l_seq(plist):
        d = _sequential(apply_fn, plist, x) - tgt
        return jnp.mean(d * d)

    lp, gp = jax.jit(jax.value_and_grad(l_pipe))(stacked)
    ls, gs = jax.value_and_grad(l_seq)(params)
    assert abs(float(lp) - float(ls)) < 1e-6
    new_p = jax.tree.map(lambda p, g: p - 0.1 * g, stacked, gp)
    new_s = stack_stage_params(
        jax.tree.map(lambda p, g: p - 0.1 * g, params, gs), STAGES)
    worst = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(new_p), jax.tree.leaves(new_s)))
    assert worst < 1e-5, f"post-step divergence {worst}"


def test_pipeline_validation_errors():
    with pytest.raises(ValueError, match="devices"):
        create_pipeline_mesh(4, data_parallel=4)  # 16 > 8
    mesh = create_pipeline_mesh(4)
    with pytest.raises(ValueError, match="n_stages"):
        make_pipeline_fn(lambda p, h: h, mesh, 2, 2)
    with pytest.raises(ValueError, match="n_microbatches"):
        make_pipeline_fn(lambda p, h: h, mesh, 4, 0)
    with pytest.raises(ValueError, match="divisible"):
        stack_stage_params([{"w": jnp.zeros(2)}] * 6, 4)
