"""Pallas TPU kernel: fused transformer MLP (fc1 -> exact GELU -> fc2).

Why: the MLP hidden tensor is 4x the activation width; under XLA it round-
trips HBM twice in forward (fc1 write, fc2 read), is SAVED as a backward
residual, and is re-read twice in backward. For nest_small level 0 that is
[B*16*196, 384] bf16 = 308 MB per direction per layer; the trace shows the
fc1 matmuls HBM-bound at ~265 GiB/s. This kernel tiles over rows, keeps the
hidden entirely in VMEM, and the custom-VJP backward recomputes it on-chip —
only x, dout, dx and the (small) weight grads touch HBM.

Weight-gradient accumulation: dW1/dW2/db1/db2 ride as grid-constant output
blocks (index_map -> (0, 0)) accumulated in fp32 across a SEQUENTIAL grid
(dimension_semantics="arbitrary"), zero-initialized at program 0. The final
cast to the param compute dtype happens once — tighter than XLA's per-tile
bf16 rounding.

Constraint: rows M must divide by the chosen tile; callers fall back to the
XLA path otherwise (vit.py MlpBlock handles the dispatch).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf from Mosaic-supported primitives (lax.erf has no Pallas TPU
    lowering): Abramowitz & Stegun 7.1.26 rational approximation,
    |error| <= 1.5e-7 — exact to fp32 working precision here."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(z):
    """Exact-erf GELU, matching nn.gelu(approximate=False) to ~1e-7."""
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _gelu_grad(z):
    """d/dz [z * Phi(z)] = Phi(z) + z * phi(z)."""
    phi = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    return cdf + z * phi


def _gelu_and_grad(z):
    """(gelu(z), gelu'(z)) sharing one erf evaluation. Measured NEUTRAL
    on v5e (Mosaic already CSEs the duplicated _erf(z * c) between _gelu
    and _gelu_grad on the same z); kept because it states the sharing
    explicitly instead of relying on CSE. Same math as _gelu/_gelu_grad
    (association differs by <=1 ulp in fp32)."""
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    phi = jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI
    return z * cdf, cdf + z * phi


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    z = jnp.dot(x_ref[...], w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = _gelu(z).astype(x_ref.dtype)
    o = jnp.dot(h, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, do_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    do = do_ref[...]
    z = jnp.dot(x, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h32, dgelu = _gelu_and_grad(z)
    h = h32.astype(x.dtype)
    # dh = (dO W2^T) * gelu'(z)
    dh32 = jax.lax.dot_general(
        do, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * dgelu
    dh = dh32.astype(x.dtype)
    dx = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh32, axis=0, keepdims=True)
    dw2_ref[...] += jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)


def _tile(m: int, d: int, f: int, itemsize: int = 2) -> int:
    """Largest row tile that divides m such that the backward fits VMEM:
    resident weights (2*d*f*itemsize) + fp32 weight-grad accumulators
    (2*d*f*4) + fp32 z / compute-dtype h tiles (tm*f*(4+itemsize)) +
    double-buffered row tiles (3*tm*d*2*itemsize). Rules out ViT-B's
    768x3072 MLP (weights+grads alone ~28 MB); nest_small's 384x1536 fits
    comfortably in bf16."""
    budget = 13 * 1024 * 1024
    resident = 2 * d * f * itemsize + 2 * d * f * 4
    for tm in (512, 256, 128, 64):
        if m % tm == 0 and resident + tm * f * (4 + itemsize) \
                + 3 * tm * d * 2 * itemsize <= budget:
            return tm
    return 0


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp(x, w1, b1, w2, b2, interpret: bool):
    return _mlp_fwd(x, w1, b1, w2, b2, interpret)[0]


def _mlp_fwd(x, w1, b1, w2, b2, interpret: bool):
    m, d = x.shape
    f = w1.shape[1]
    tm = _tile(m, d, f, x.dtype.itemsize)
    if tm == 0:
        raise ValueError(
            f"fused_mlp unsupported for M={m}, D={d}, F={f} (no dividing "
            "row tile fits the VMEM budget) — guard calls with supports()")
    o = pl.pallas_call(
        _fwd_kernel,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  _const_spec((d, f)), _const_spec((1, f)),
                  _const_spec((f, d)), _const_spec((1, d))],
        out_specs=pl.BlockSpec((tm, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=(2 * m * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=m * f),
    )(x, w1, b1, w2, b2)
    return o, (x, w1, b1, w2, b2)


def _mlp_bwd(interpret: bool, res, do):
    x, w1, b1, w2, b2 = res
    m, d = x.shape
    f = w1.shape[1]
    tm = _tile(m, d, f, x.dtype.itemsize)
    row = pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(m // tm,),
        in_specs=[row, _const_spec((d, f)), _const_spec((1, f)),
                  _const_spec((f, d)), row],
        out_specs=(row, _const_spec((d, f)), _const_spec((1, f)),
                   _const_spec((f, d)), _const_spec((1, d))),
        out_shape=(jax.ShapeDtypeStruct((m, d), x.dtype),
                   jax.ShapeDtypeStruct((d, f), jnp.float32),
                   jax.ShapeDtypeStruct((1, f), jnp.float32),
                   jax.ShapeDtypeStruct((f, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=12 * m * d * f,
            bytes_accessed=(3 * m * d + 2 * d * f) * x.dtype.itemsize,
            transcendentals=m * f),
    )(x, w1, b1, w2, do)
    # cotangent shapes/dtypes match the _mlp primal inputs ([1, F] biases);
    # the caller-side reshape/cast VJPs restore the original param forms
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def _use_interpret() -> bool:
    from vlp_tpu.ops.kernel_gate import use_interpret

    return use_interpret()


def supports(m: int, d: int, f: int, itemsize: int = 2) -> bool:
    """True if the kernel can run this shape (tile divides M, VMEM fits).
    ``m`` must be the PER-SHARD row count under a multi-device mesh (the
    shard_map body sees local shapes)."""
    return _tile(m, d, f, itemsize) > 0


def fused_mlp(x: jax.Array, w1: jax.Array, b1: jax.Array, w2: jax.Array,
              b2: jax.Array) -> jax.Array:
    """out = gelu(x @ w1 + b1) @ w2 + b2 over x [M, D] with the hidden
    [M, F] kept in VMEM; backward recomputes it. Caller must check
    ``supports(M_local, D, F)`` and that the backend is TPU (or interpret).

    Under a multi-device mesh the call is shard_map-wrapped (rows sharded,
    weights replicated — kernel_gate.shard_wrap); shard_map autodiff psums
    the replicated weight cotangents across shards."""
    from vlp_tpu.ops.kernel_gate import shard_wrap

    interpret = _use_interpret()
    call = shard_wrap(
        lambda *a: _mlp(*a, interpret), x.shape[0],
        in_batched=(True, False, False, False, False), out_batched=True)
    if call is None:
        raise ValueError(
            f"fused_mlp: rows M={x.shape[0]} do not divide over the active "
            "kernel mesh — guard calls with supports() on the local shape")
    return call(x, w1.astype(x.dtype), b1.reshape(1, -1).astype(jnp.float32),
                w2.astype(x.dtype), b2.reshape(1, -1).astype(jnp.float32))
