"""Fused block-attention kernel (ops/block_attention.py) vs flax reference.

Runs the Pallas kernel under the interpreter on CPU (VLP_PALLAS_INTERPRET);
value-level parity for forward AND all three input gradients, plus the
fallback behaviors (mask -> flax path; CPU default -> flax path).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from vlp_tpu.ops import block_attention as ba


def _qkv(n=2, s=20, h=3, dh=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((n, s, h, dh)), jnp.float32)
    return mk(), mk(), mk()


class TestFusedAttentionParity:
    def test_forward_matches_flax(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        q, k, v = _qkv()
        ref = nn.dot_product_attention(q, k, v)
        out = ba.fused_attention_fn(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_gradients_match_flax(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        q, k, v = _qkv(seed=1)

        # cos(q) weighting makes every gradient path nontrivial
        def loss(fn):
            return lambda q, k, v: jnp.sum(fn(q, k, v) * jnp.cos(q))

        g_ref = jax.grad(loss(nn.dot_product_attention), (0, 1, 2))(q, k, v)
        g_out = jax.grad(loss(ba.fused_attention_fn), (0, 1, 2))(q, k, v)
        for a, b in zip(g_ref, g_out):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-5)

    def test_nonuniform_rows_softmax_correct(self, monkeypatch):
        """Rows with very different score magnitudes (max-subtraction path)."""
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        q, k, v = _qkv(seed=2)
        q = q.at[:, 0].mul(50.0)  # large logits in row 0
        ref = nn.dot_product_attention(q, k, v)
        out = ba.fused_attention_fn(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


class TestFallbacks:
    def test_mask_uses_flax_path(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        q, k, v = _qkv(seed=3)
        mask = jnp.ones((q.shape[0], 1, q.shape[1], q.shape[1]), bool)
        mask = mask.at[:, :, :, -5:].set(False)  # pad the last 5 keys
        ref = nn.dot_product_attention(q, k, v, mask=mask)
        out = ba.fused_attention_fn(q, k, v, mask=mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_cpu_defaults_to_flax(self, monkeypatch):
        """Without the interpret opt-in, CPU must not hit the Pallas path."""
        monkeypatch.delenv("VLP_PALLAS_INTERPRET", raising=False)
        q, k, v = _qkv(seed=4)
        ref = nn.dot_product_attention(q, k, v)
        out = ba.fused_attention_fn(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_fused_module_kernel_vs_xla_paths(self, monkeypatch):
        """FusedSelfAttention: the Pallas path (interpret) and the CPU XLA
        path produce identical values for the same params."""
        from vlp_tpu.models.vit import FusedSelfAttention

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 16, 24)), jnp.float32)
        mod = FusedSelfAttention(num_heads=3, dtype=jnp.float32)
        p = mod.init(jax.random.key(0), x)
        monkeypatch.delenv("VLP_PALLAS_INTERPRET", raising=False)
        xla = mod.apply(p, x)
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        pallas = mod.apply(p, x)
        np.testing.assert_allclose(np.asarray(pallas), np.asarray(xla),
                                   atol=1e-5)

    def test_encoder_block_fused_flag_numerics(self, monkeypatch):
        """EncoderBlock(fused_attention=True/False) agree numerically when
        the fused variant's qkv/out params are assembled from the unfused
        flax MHA params (the trees differ by construction)."""
        from vlp_tpu.models.vit import EncoderBlock

        rng = np.random.default_rng(6)
        d, h = 24, 3
        x = jnp.asarray(rng.standard_normal((2, 16, d)), jnp.float32)
        blk_u = EncoderBlock(num_heads=h, dtype=jnp.float32,
                             fused_attention=False)
        blk_f = EncoderBlock(num_heads=h, dtype=jnp.float32,
                             fused_attention=True)
        pu = blk_u.init(jax.random.key(0), x)["params"]
        pf = jax.tree.map(lambda a: a, blk_f.init(jax.random.key(0), x))
        a = pu["attn"]
        qkv_kernel = np.concatenate(
            [np.asarray(a[k]["kernel"]).reshape(d, d)
             for k in ("query", "key", "value")], axis=1)
        qkv_bias = np.concatenate(
            [np.asarray(a[k]["bias"]).reshape(d) for k in
             ("query", "key", "value")])
        pf["params"]["attn"]["qkv"]["kernel"] = jnp.asarray(qkv_kernel)
        pf["params"]["attn"]["qkv"]["bias"] = jnp.asarray(qkv_bias)
        pf["params"]["attn"]["out"]["kernel"] = jnp.asarray(
            np.asarray(a["out"]["kernel"]).reshape(d, d))
        pf["params"]["attn"]["out"]["bias"] = a["out"]["bias"]
        for nm in ("ln1", "ln2", "mlp"):
            pf["params"][nm] = pu[nm]
        np.testing.assert_allclose(
            np.asarray(blk_f.apply(pf, x)),
            np.asarray(blk_u.apply({"params": pu}, x)), atol=1e-5)


class TestGroupedScheduleVariant:
    """VLP_BLOCKATTN_GROUPED=1 opt-in (DESIGN.md §7b round-4 follow-up:
    the megakernels' stage-grouped schedule applied to block_attention —
    measured NEUTRAL at ViT-B and Mosaic-compile-fatal at ViT-L, so the
    SERIAL schedule stays the default; see _grouped_heads). The grouped
    variant must still pass the strongest parity checks, and default vs
    grouped must agree on forward values and all input gradients."""

    def test_grouped_parity_vs_flax(self, monkeypatch):
        monkeypatch.setenv("VLP_BLOCKATTN_GROUPED", "1")
        TestFusedAttentionParity().test_gradients_match_flax(monkeypatch)

    def test_default_equals_grouped_values_and_grads(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        q, k, v = _qkv(n=2, s=16, h=4, dh=8, seed=9)

        def loss(q, k, v):
            return jnp.sum(ba.fused_attention_fn(q, k, v) * jnp.cos(q))

        monkeypatch.setenv("VLP_BLOCKATTN_GROUPED", "1")
        out_s = ba.fused_attention_fn(q, k, v)
        g_s = jax.grad(loss, (0, 1, 2))(q, k, v)
        monkeypatch.delenv("VLP_BLOCKATTN_GROUPED")
        out_d = ba.fused_attention_fn(q, k, v)
        g_d = jax.grad(loss, (0, 1, 2))(q, k, v)
        # fp32-ulp tolerance: op-identical schedules, different XLA:CPU
        # reduction fusions under the interpreter (see test_fused_block)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                                   atol=2e-5)
        for a, b in zip(g_d, g_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)
