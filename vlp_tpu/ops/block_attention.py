"""Pallas TPU kernel: fused multi-head self-attention for short sequences.

Why: NesT/ViT attention runs over short sequences (196/197 tokens) with
small head dims (32/64). The unfused path materializes the [N, H, S, S]
probability tensor in HBM — for nest_small level 0 that is B*16 blocks x 3
heads x 196x196 bf16 = 472 MB per layer per direction, and XLA additionally
SAVES the tensor as a backward residual. This kernel keeps scores/probs
entirely in VMEM: the forward computes softmax(q k^T / sqrt(d)) v per
(sample, head) in one program, and the custom-VJP backward RECOMPUTES the
probabilities on-chip (flash-attention-style), so only qkv, o and their
gradients ever touch HBM.

Design notes (TPU, measured on v5e through several iterations):
- The kernel takes the PACKED [N, S, 3D] projection output directly (D =
  H*Dh, q | k | v concatenated in the minor dim). Splitting into separate
  q/k/v arrays at the XLA level costs lane-relayout copies whenever D is not
  a multiple of 128 (NesT level 0: D=96), and the flax [N, S, H, Dh] head
  layout costs ~0.3 ms per reshape on [2048,196,96]; in-kernel static lane
  slices cost neither. The backward emits dqkv in the same packed form, so
  XLA never concatenates gradient pieces either.
- No streaming/tiling over S: S <= ~512 fits whole in VMEM (scores are
  [S, S] fp32 <= 1 MB), which is exactly the NesT block / ViT / BERT-40
  regime. This is deliberately NOT a general flash-attention kernel.
- Softmax in fp32 (max-subtracted); normalization is deferred out of the
  [S, S] matrix into the small [S, Dh] operands on both passes.
- Several samples per grid program (g in _group_size) amortize program
  overhead; the g/head loops are static Python loops -> fully unrolled
  Mosaic program.

Reference semantics: identical to flax nn.dot_product_attention without
mask/bias/dropout (reference VisionLanguageModule/timm attention is plain
softmax attention; dropout is disabled everywhere in the reference configs).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _grouped_heads() -> bool:
    """Round-4 finding: the stage-grouped schedule that won -17%/-20% in
    the ln_attention megakernel is NOT the right default here. Measured on
    v5e: (a) at this kernel's main shape (ViT-B, S=197, H=12, Dh=64) the
    end-to-end train step is NEUTRAL (1167 vs 1169 img/s, within noise) —
    Dh=64 heads are MXU-dominant enough that Mosaic already overlaps the
    serial stream's independent work; (b) at ViT-L (H=16, D=1024) the
    grouped kernel's simultaneous per-head live set DETERMINISTICALLY
    crashes the Mosaic/AOT compile for sample groups with batch >= 48
    (subprocess abort, reproduced at B=48/64 vs clean at B=32; the serial
    schedule compiles and runs at B=128). Serial stays the default;
    VLP_BLOCKATTN_GROUPED=1 opts in (VLP_MEGA_SERIAL=1 still wins)."""
    from vlp_tpu.ops.fused_block import _serial_heads

    return (os.environ.get("VLP_BLOCKATTN_GROUPED", "0") == "1"
            and not _serial_heads())


def _fwd_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int,
                scale: float):
    from vlp_tpu.ops.fused_block import _heads_o, _softmax_heads

    d = num_heads * head_dim
    if not _grouped_heads():
        for g in range(qkv_ref.shape[0]):
            for h in range(num_heads):
                lo = h * head_dim
                q = qkv_ref[g, :, lo:lo + head_dim]  # [S, Dh] bf16
                k = qkv_ref[g, :, d + lo:d + lo + head_dim]
                v = qkv_ref[g, :, 2 * d + lo:2 * d + lo + head_dim]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale  # [S,S] f32
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)  # unnormalized probs
                l = jnp.sum(p, axis=-1, keepdims=True)  # [S, 1]
                # normalization deferred to the [S, Dh] output: saves a
                # full VPU divide pass over the [S, S] matrix
                o = jnp.dot(p.astype(q.dtype), v,
                            preferred_element_type=jnp.float32) / l
                o_ref[g, :, lo:lo + head_dim] = o.astype(o_ref.dtype)
        return
    # stage-grouped opt-in (the helpers reproduce the serial loop's math
    # op for op; see _grouped_heads for why this is not the default)
    for g in range(qkv_ref.shape[0]):
        qkv = qkv_ref[g]
        pls = _softmax_heads(qkv, num_heads, head_dim, scale)
        o_ref[g] = _heads_o(qkv, pls, num_heads, head_dim, qkv.dtype
                            ).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, *, num_heads: int, head_dim: int,
                scale: float):
    from vlp_tpu.ops.fused_block import _heads_dqkv, _softmax_heads

    d = num_heads * head_dim
    if _grouped_heads():
        for g in range(qkv_ref.shape[0]):
            qkv = qkv_ref[g]
            pls = _softmax_heads(qkv, num_heads, head_dim, scale)
            dqkv_ref[g] = _heads_dqkv(
                qkv, do_ref[g].astype(jnp.float32), pls, num_heads,
                head_dim, scale, qkv.dtype).astype(dqkv_ref.dtype)
        return
    for g in range(qkv_ref.shape[0]):
        for h in range(num_heads):
            lo = h * head_dim
            q = qkv_ref[g, :, lo:lo + head_dim]
            k = qkv_ref[g, :, d + lo:d + lo + head_dim]
            v = qkv_ref[g, :, 2 * d + lo:2 * d + lo + head_dim]
            do = do_ref[g, :, lo:lo + head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)  # unnormalized; P = p / l
            inv_l = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            pb = p.astype(q.dtype)
            # dV = P^T dO = p^T (dO * inv_l): row-scale the SMALL [S, Dh]
            # operand instead of normalizing the [S, S] matrix
            dov = (do.astype(jnp.float32) * inv_l).astype(q.dtype)
            dv = jax.lax.dot_general(pb, dov, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # dP = dO V^T
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            # dS = P*(dP - rowsum(dP*P)) = inv_l*(p*dP - p*rowsum(p*dP)/l)
            t = p * dp
            c = jnp.sum(t, axis=-1, keepdims=True) * inv_l  # rowsum(dP*P)
            ds = (t - p * c) * inv_l
            dsb = ds.astype(q.dtype)
            dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dqkv_ref[g, :, lo:lo + head_dim] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, d + lo:d + lo + head_dim] = \
                dk.astype(dqkv_ref.dtype)
            dqkv_ref[g, :, 2 * d + lo:2 * d + lo + head_dim] = \
                dv.astype(dqkv_ref.dtype)


def _group_size(n: int, s: int, d: int, itemsize: int = 2) -> int:
    """Samples per grid program: amortizes per-program overhead while
    keeping the backward's double-buffered blocks (qkv + dqkv + do = 7*D
    per row at the operand itemsize) inside the ~16 MB VMEM budget."""
    # Larger groups OOM scoped VMEM on the low-D levels: the blocks pad to
    # 128-lane tiles (D=96 -> 3D=288 pads to 384) and the unrolled head
    # loop's scratch stacks on top — g=16 measured 17.1 MB for nest l0
    # backward. (4, 2) is the measured-safe configuration for bf16.
    budget = 6 * 1024 * 1024  # per-buffer-set bytes, x2 for double buffering
    per_sample = 7 * d * s * itemsize
    for g in (4, 2):
        if n % g == 0 and g * per_sample <= budget:
            return g
    return 1


def _spec(g: int, s: int, w: int):
    return pl.BlockSpec((g, s, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attend(qkv, num_heads: int, scale: float, interpret: bool):
    """o = softmax(q k^T * scale) v per packed head over qkv [N, S, 3D];
    custom VJP recomputes probs on-chip and emits packed dqkv."""
    return _attend_fwd(qkv, num_heads, scale, interpret)[0]


def _attend_fwd(qkv, num_heads: int, scale: float, interpret: bool):
    n, s, d3 = qkv.shape
    d = d3 // 3
    head_dim = d // num_heads
    g = _group_size(n, s, d, qkv.dtype.itemsize)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=scale)
    o = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[_spec(g, s, d3)],
        out_specs=_spec(g, s, d),
        out_shape=jax.ShapeDtypeStruct((n, s, d), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * n * s * s * d,
            bytes_accessed=4 * n * s * d * qkv.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(qkv)
    return o, (qkv,)


def _attend_bwd(num_heads: int, scale: float, interpret: bool, res, do):
    (qkv,) = res
    n, s, d3 = qkv.shape
    d = d3 // 3
    head_dim = d // num_heads
    g = _group_size(n, s, d, qkv.dtype.itemsize)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=scale)
    dqkv = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[_spec(g, s, d3), _spec(g, s, d)],
        out_specs=_spec(g, s, d3),
        out_shape=jax.ShapeDtypeStruct((n, s, d3), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=11 * n * s * s * d,
            bytes_accessed=7 * n * s * d * qkv.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(qkv, do)
    return (dqkv,)


_attend.defvjp(_attend_fwd, _attend_bwd)


def _use_interpret() -> bool:
    """On CPU the kernel runs only under the (slow) Pallas interpreter; the
    math is identical to flax's reference attention, so CPU defaults to the
    XLA path and interpret mode is opt-in for kernel tests."""
    from vlp_tpu.ops.kernel_gate import use_interpret

    return use_interpret()


def _on_tpu() -> bool:
    from vlp_tpu.ops.kernel_gate import mosaic_ok

    return mosaic_ok()


def attend_qkv(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Multi-head softmax attention over the PACKED projection output
    qkv [N, S, 3D] (q | k | v, heads packed inside each D block). TPU: the
    Pallas kernel, zero relayout copies; under a multi-device mesh the call
    is shard_map-wrapped over the batch dim (kernel_gate.shard_wrap) so the
    kernel runs per shard. CPU/other: the same math through XLA
    (slicing/reshape is free there)."""
    from vlp_tpu.ops.kernel_gate import shard_wrap

    n, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // num_heads
    interpret = _use_interpret()
    if _on_tpu() or interpret:
        call = shard_wrap(
            lambda t: _attend(t, num_heads, dh ** -0.5, interpret),
            n, in_batched=(True,), out_batched=True)
        if call is not None:
            return call(qkv)
    import flax.linen as nn

    split = lambda x: x.reshape(n, s, num_heads, dh)
    q, k, v = (qkv[..., :d], qkv[..., d:2 * d], qkv[..., 2 * d:])
    o = nn.dot_product_attention(split(q), split(k), split(v))
    return o.reshape(n, s, d)


def attend(q: jax.Array, k: jax.Array, v: jax.Array,
           num_heads: int) -> jax.Array:
    """Convenience wrapper over separate q/k/v [N, S, D] arrays (packs them;
    prefer attend_qkv from a fused projection to avoid the concatenate)."""
    return attend_qkv(jnp.concatenate([q, k, v], axis=-1), num_heads)


def fused_attention_fn(query: jax.Array, key: jax.Array, value: jax.Array,
                       bias=None, mask=None, **kwargs) -> jax.Array:
    """Drop-in ``attention_fn`` for ``nn.MultiHeadDotProductAttention``.

    query/key/value: [N, S, H, Dh] (flax layout after the QKV DenseGeneral).
    Supports self-attention without bias/mask/dropout (NesT blocks, ViT);
    falls back to flax's reference implementation when a mask/bias is given
    (BERT padding masks) or on CPU without the interpret opt-in. NOTE: the
    [N, S, H, Dh] layout costs relayout copies on TPU — FusedSelfAttention
    (models/vit.py) with attend_qkv is the fast path.
    """
    import flax.linen as nn

    dropping_out = kwargs.get("dropout_rate", 0.0) > 0.0 and \
        not kwargs.get("deterministic", True)
    interpret = _use_interpret()
    if bias is not None or mask is not None or dropping_out or \
            query.shape[1] != key.shape[1] or \
            not (_on_tpu() or interpret):
        # this flax version accepts force_fp32_for_softmax — forward ALL
        # kwargs so a module-level fp32-softmax request survives fallback
        return nn.dot_product_attention(query, key, value, bias=bias,
                                        mask=mask, **kwargs)
    n, s, h, dh = query.shape
    o = attend(query.reshape(n, s, h * dh), key.reshape(n, s, h * dh),
               value.reshape(n, s, h * dh), h)
    return o.reshape(n, s, h, dh)
