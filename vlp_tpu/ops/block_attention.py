"""Pallas TPU kernel: fused multi-head self-attention for short sequences.

Why: NesT/ViT attention runs over short sequences (196/197 tokens) with
small head dims (32/64). The unfused path materializes the [N, H, S, S]
probability tensor in HBM — for nest_small level 0 that is B*16 blocks x 3
heads x 196x196 bf16 = 472 MB per layer per direction, and XLA additionally
SAVES the tensor as a backward residual. This kernel keeps scores/probs
entirely in VMEM: the forward computes softmax(q k^T / sqrt(d)) v per
(sample, head) in one program, and the custom-VJP backward RECOMPUTES the
probabilities on-chip (flash-attention-style), so only q, k, v, o and their
gradients ever touch HBM.

Design notes (TPU):
- q/k/v ride as [N, S, D] with heads packed in the minor dim (D = H*Dh), so
  VMEM tiles stay [*, 128k]-aligned; per-head slices are static lane slices.
- No streaming/tiling over S: S <= ~512 fits whole in VMEM (scores are
  [S, S] fp32 <= 1 MB), which is exactly the NesT block / ViT / BERT-40
  regime. This is deliberately NOT a general flash-attention kernel.
- Softmax in fp32 (max-subtracted); matmuls hit the MXU in bf16 with fp32
  accumulation via preferred_element_type.
- The head loop is a static Python loop -> fully unrolled Mosaic program.

Reference semantics: identical to flax nn.dot_product_attention without
mask/bias/dropout (reference VisionLanguageModule/timm attention is plain
softmax attention; dropout is disabled everywhere in the reference configs).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, head_dim: int,
                scale: float):
    for h in range(num_heads):
        lo = h * head_dim
        q = q_ref[0, :, lo:lo + head_dim]  # [S, Dh] bf16
        k = k_ref[0, :, lo:lo + head_dim]
        v = v_ref[0, :, lo:lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [S, S] f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(q.dtype), v,
                    preferred_element_type=jnp.float32)  # [S, Dh]
        o_ref[0, :, lo:lo + head_dim] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                num_heads: int, head_dim: int, scale: float):
    for h in range(num_heads):
        lo = h * head_dim
        q = q_ref[0, :, lo:lo + head_dim]
        k = k_ref[0, :, lo:lo + head_dim]
        v = v_ref[0, :, lo:lo + head_dim]
        do = do_ref[0, :, lo:lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # [S, S] f32
        pb = p.astype(q.dtype)
        # dV = P^T dO
        dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dP = dO V^T
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dS = P * (dP - rowsum(dP * P))   (softmax backward)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dsb, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, :, lo:lo + head_dim] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, lo:lo + head_dim] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, lo:lo + head_dim] = dv.astype(dv_ref.dtype)


def _row_specs(n: int, s: int, d: int, count: int):
    return [pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for _ in range(count)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attend(q, k, v, num_heads: int, scale: float, interpret: bool):
    return _attend_fwd(q, k, v, num_heads, scale, interpret)[0]


def _attend_fwd(q, k, v, num_heads: int, scale: float, interpret: bool):
    n, s, d = q.shape
    head_dim = d // num_heads
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=scale)
    o = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=_row_specs(n, s, d, 3),
        out_specs=_row_specs(n, s, d, 1)[0],
        out_shape=jax.ShapeDtypeStruct((n, s, d), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * s * s * d,
            bytes_accessed=4 * n * s * d * q.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(q, k, v)
    return o, (q, k, v)


def _attend_bwd(num_heads: int, scale: float, interpret: bool, res, do):
    q, k, v = res
    n, s, d = q.shape
    head_dim = d // num_heads
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=scale)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=_row_specs(n, s, d, 4),
        out_specs=tuple(_row_specs(n, s, d, 3)),
        out_shape=tuple(jax.ShapeDtypeStruct((n, s, d), q.dtype)
                        for _ in range(3)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * n * s * s * d,
            bytes_accessed=7 * n * s * d * q.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(q, k, v, do)
    return dq, dk, dv


_attend.defvjp(_attend_fwd, _attend_bwd)


import os


def _use_interpret() -> bool:
    """On CPU the kernel runs only under the (slow) Pallas interpreter; the
    math is identical to flax's reference attention, so CPU defaults to the
    XLA path and interpret mode is opt-in for kernel tests."""
    return os.environ.get("VLP_PALLAS_INTERPRET", "0") == "1"


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def fused_attention_fn(query: jax.Array, key: jax.Array, value: jax.Array,
                       bias=None, mask=None, **kwargs) -> jax.Array:
    """Drop-in ``attention_fn`` for ``nn.MultiHeadDotProductAttention``.

    query/key/value: [N, S, H, Dh] (flax layout after the QKV DenseGeneral).
    Supports self-attention without bias/mask/dropout (NesT blocks, ViT);
    falls back to flax's reference implementation when a mask/bias is given
    (BERT padding masks) or when running on CPU without interpret support.
    """
    import flax.linen as nn

    dropping_out = kwargs.get("dropout_rate", 0.0) > 0.0 and \
        not kwargs.get("deterministic", True)
    interpret = _use_interpret()
    if bias is not None or mask is not None or dropping_out or \
            query.shape[1] != key.shape[1] or \
            not (_on_tpu() or interpret):
        kwargs.pop("force_fp32_for_softmax", None)
        return nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask, **kwargs)
    n, s, h, dh = query.shape
    scale = dh ** -0.5
    q = query.reshape(n, s, h * dh)
    k = key.reshape(n, s, h * dh)
    v = value.reshape(n, s, h * dh)
    o = _attend(q, k, v, h, scale, interpret)
    return o.reshape(n, s, h, dh)
