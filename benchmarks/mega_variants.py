#!/usr/bin/env python
"""Kernel-scheduling lab for the half-block megakernels (DESIGN.md §7b
"software-pipelined compute" future work).

Standalone variant kernels of ln_mlp / ln_attention forward+backward are
timed head-to-head at NesT-S level-3 shapes on the real chip:
- ablation bounds (gelu->identity, ln->identity, softmax->scale) attribute
  the VPU-serialized epilogue cost measured in mxu_ceiling.json;
- interleaved variants split the work into independent sub-streams and
  order the instruction stream so VPU phases of one sub-stream can overlap
  MXU phases of the other (Mosaic schedules within a grid step; it
  pipelines DMA, not compute, across steps).

Winners get ported into ops/fused_block.py behind the same math and parity
tests. Times via K-step jitted scan (dispatch overhead ~37ms/scan on the
remote tunnel: at K=100 that is ~0.37ms/step inflation, identical for all
variants).
"""
from __future__ import annotations

import functools
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.ops.fused_mlp import _gelu, _gelu_and_grad, _gelu_grad
from vlp_tpu.ops.fused_block import _ln_fwd, _ln_bwd_dx

# Level-3 shapes (dominant: 20 of 24 blocks)
B = int(os.environ.get("BENCH_BATCH", "128"))
S, D, HEADS = 196, 384, 12
F = 4 * D
DH = D // HEADS
SCALE = DH ** -0.5
M = B * S
TM = 128            # ln_mlp row tile (matches _mlp_tile for L3)
K = int(os.environ.get("BENCH_STEPS", "100"))
REPEATS = 3


def timed(fn, x0) -> float:
    @jax.jit
    def run(x):
        (xK,), _ = jax.lax.scan(lambda c, _: ((fn(c[0]),), None), (x,),
                                None, length=K)
        return jnp.sum(xK.astype(jnp.float32))

    run(x0).block_until_ready()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)
    return best * 1e3


# ---------------------------------------------------------------------------
# ln_mlp forward variants
# ---------------------------------------------------------------------------

def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _row2(tm, d):
    return pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


def mlp_fwd_kernel_v0(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      y_ref, *, gelu, ln):
    x = x_ref[...].astype(jnp.float32)
    if ln:
        xh, _ = _ln_fwd(x)
        lnv = (xh * g_ref[...] + b_ref[...]).astype(x_ref.dtype)
    else:
        lnv = x.astype(x_ref.dtype)
    z = jnp.dot(lnv, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = (gelu(z) if gelu else z).astype(x_ref.dtype)
    y = jnp.dot(h, w2_ref[...],
                preferred_element_type=jnp.float32) + b2_ref[...]
    y_ref[...] = (x + y).astype(y_ref.dtype)


def mlp_fwd_kernel_splitn(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                          b2_ref, y_ref, *, parts):
    """fc1 in N-slices: gelu of slice j overlaps the matmul of slice j+1."""
    x = x_ref[...].astype(jnp.float32)
    xh, _ = _ln_fwd(x)
    lnv = (xh * g_ref[...] + b_ref[...]).astype(x_ref.dtype)
    f = w1_ref.shape[1]
    fp = f // parts
    zs = []
    hs = []
    for j in range(parts):
        zs.append(jnp.dot(lnv, w1_ref[:, j * fp:(j + 1) * fp],
                          preferred_element_type=jnp.float32)
                  + b1_ref[:, j * fp:(j + 1) * fp])
        if j > 0:
            hs.append(_gelu(zs[j - 1]).astype(x_ref.dtype))
    hs.append(_gelu(zs[-1]).astype(x_ref.dtype))
    acc = jnp.dot(hs[0], w2_ref[0 * fp:1 * fp, :],
                  preferred_element_type=jnp.float32)
    for j in range(1, parts):
        acc = acc + jnp.dot(hs[j], w2_ref[j * fp:(j + 1) * fp, :],
                            preferred_element_type=jnp.float32)
    y_ref[...] = (x + acc + b2_ref[...]).astype(y_ref.dtype)


def mlp_fwd_kernel_rowpipe(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                           b2_ref, y_ref, *, parts):
    """Row sub-tiles staged as a software pipeline: sub-tile j's VPU phases
    (LN, GELU, residual) are interleaved with sub-tile j±1's matmuls."""
    tm = x_ref.shape[0]
    sm = tm // parts
    xs, lns, zs, hs, ys = [None] * parts, [None] * parts, [None] * parts, \
        [None] * parts, [None] * parts
    # stage A: LN per sub-tile, then interleave fc1 / gelu / fc2 issue order
    for j in range(parts):
        xs[j] = x_ref[j * sm:(j + 1) * sm, :].astype(jnp.float32)
        xh, _ = _ln_fwd(xs[j])
        lns[j] = (xh * g_ref[...] + b_ref[...]).astype(x_ref.dtype)
    for j in range(parts):
        zs[j] = jnp.dot(lns[j], w1_ref[...],
                        preferred_element_type=jnp.float32) + b1_ref[...]
        if j > 0:
            hs[j - 1] = _gelu(zs[j - 1]).astype(x_ref.dtype)
    hs[parts - 1] = _gelu(zs[parts - 1]).astype(x_ref.dtype)
    for j in range(parts):
        ys[j] = jnp.dot(hs[j], w2_ref[...],
                        preferred_element_type=jnp.float32) + b2_ref[...]
    for j in range(parts):
        y_ref[j * sm:(j + 1) * sm, :] = (xs[j] + ys[j]).astype(y_ref.dtype)


def make_mlp(kernel, tm=TM, **kw):
    k = functools.partial(kernel, **kw)

    def call(x, gamma, beta, w1, b1, w2, b2):
        m, d = x.shape
        f = w1.shape[1]
        return pl.pallas_call(
            k,
            grid=(m // tm,),
            in_specs=[_row2(tm, d), _const((1, d)), _const((1, d)),
                      _const((d, f)), _const((1, f)), _const((f, d)),
                      _const((1, d))],
            out_specs=_row2(tm, d),
            out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        )(x, gamma, beta, w1, b1, w2, b2)

    return call


# ---------------------------------------------------------------------------
# ln_mlp backward variants
# ---------------------------------------------------------------------------

def mlp_bwd_kernel_v0(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dout_ref,
                      dx_ref, dg_ref, db_ref, dw1_ref, db1_ref, dw2_ref,
                      db2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dtype = x_ref.dtype
    x = x_ref[...].astype(jnp.float32)
    xh, inv = _ln_fwd(x)
    ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
    z = jnp.dot(ln, w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[...]
    h = _gelu(z).astype(dtype)
    dy = dout_ref[...].astype(jnp.float32)
    dyb = dy.astype(dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h, dyb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dh32 = jax.lax.dot_general(
        dyb, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * _gelu_grad(z)
    dh = dh32.astype(dtype)
    dw1_ref[...] += jax.lax.dot_general(
        ln, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh32, axis=0, keepdims=True)
    dln = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dg_ref[...] += jnp.sum(dln * xh, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxh = dln * g_ref[...]
    dx_ref[...] = (dy + _ln_bwd_dx(dxh, xh, inv)).astype(dx_ref.dtype)


def mlp_bwd_kernel_rowpipe(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                           dout_ref, dx_ref, dg_ref, db_ref, dw1_ref,
                           db1_ref, dw2_ref, db2_ref, *, parts):
    """Backward with row sub-tiles: each matmul phase is issued for all
    sub-tiles back-to-back so the j-th sub-tile's VPU work (gelu_grad,
    LN stats, reductions) overlaps the (j+1)-th's MXU work."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dtype = x_ref.dtype
    tm = x_ref.shape[0]
    sm = tm // parts
    xs, xhs, invs, lns, zs, hs = ([None] * parts for _ in range(6))
    dys, dybs, dh32s, dhs, dlns = ([None] * parts for _ in range(5))
    for j in range(parts):
        xs[j] = x_ref[j * sm:(j + 1) * sm, :].astype(jnp.float32)
        xhs[j], invs[j] = _ln_fwd(xs[j])
        lns[j] = (xhs[j] * g_ref[...] + b_ref[...]).astype(dtype)
        dys[j] = dout_ref[j * sm:(j + 1) * sm, :].astype(jnp.float32)
        dybs[j] = dys[j].astype(dtype)
    for j in range(parts):
        zs[j] = jnp.dot(lns[j], w1_ref[...],
                        preferred_element_type=jnp.float32) + b1_ref[...]
        if j > 0:
            hs[j - 1] = _gelu(zs[j - 1]).astype(dtype)
    hs[parts - 1] = _gelu(zs[parts - 1]).astype(dtype)
    dw2 = None
    for j in range(parts):
        t = jax.lax.dot_general(hs[j], dybs[j], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dw2 = t if dw2 is None else dw2 + t
    dw2_ref[...] += dw2
    db2_ref[...] += sum(jnp.sum(dy, axis=0, keepdims=True) for dy in dys)
    for j in range(parts):
        dh32s[j] = jax.lax.dot_general(
            dybs[j], w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if j > 0:
            g = dh32s[j - 1] * _gelu_grad(zs[j - 1])
            dh32s[j - 1] = g
            dhs[j - 1] = g.astype(dtype)
    g = dh32s[parts - 1] * _gelu_grad(zs[parts - 1])
    dh32s[parts - 1] = g
    dhs[parts - 1] = g.astype(dtype)
    dw1 = None
    for j in range(parts):
        t = jax.lax.dot_general(lns[j], dhs[j], (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        dw1 = t if dw1 is None else dw1 + t
    dw1_ref[...] += dw1
    db1_ref[...] += sum(jnp.sum(d, axis=0, keepdims=True) for d in dh32s)
    for j in range(parts):
        dlns[j] = jax.lax.dot_general(
            dhs[j], w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if j > 0:
            _mlp_bwd_epilogue(j - 1, sm, dlns, xhs, invs, dys, g_ref,
                              dg_ref, db_ref, dx_ref)
    _mlp_bwd_epilogue(parts - 1, sm, dlns, xhs, invs, dys, g_ref,
                      dg_ref, db_ref, dx_ref)


def _mlp_bwd_epilogue(j, sm, dlns, xhs, invs, dys, g_ref, dg_ref, db_ref,
                      dx_ref):
    dg_ref[...] += jnp.sum(dlns[j] * xhs[j], axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dlns[j], axis=0, keepdims=True)
    dxh = dlns[j] * g_ref[...]
    dx_ref[j * sm:(j + 1) * sm, :] = (
        dys[j] + _ln_bwd_dx(dxh, xhs[j], invs[j])).astype(dx_ref.dtype)


# The F-split backward is the PRODUCTION kernel (vlp_tpu/ops/fused_block.py
# _lnmlp_bwd_kernel_fsplit) — imported, not duplicated, so the benchmarked
# variant can never drift from what ships (round-5 review finding).
from vlp_tpu.ops.fused_block import _lnmlp_bwd_kernel_fsplit \
    as mlp_bwd_kernel_fsplit  # noqa: E402


def make_mlp_bwd(kernel, tm=TM, **kw):
    k = functools.partial(kernel, **kw)
    f32 = jnp.float32

    def call(x, gamma, beta, w1, b1, w2, dout):
        m, d = x.shape
        f = w1.shape[1]
        return pl.pallas_call(
            k,
            grid=(m // tm,),
            in_specs=[_row2(tm, d), _const((1, d)), _const((1, d)),
                      _const((d, f)), _const((1, f)), _const((f, d)),
                      _row2(tm, d)],
            out_specs=(_row2(tm, d), _const((1, d)), _const((1, d)),
                       _const((d, f)), _const((1, f)), _const((f, d)),
                       _const((1, d))),
            out_shape=(jax.ShapeDtypeStruct((m, d), x.dtype),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((d, f), f32),
                       jax.ShapeDtypeStruct((1, f), f32),
                       jax.ShapeDtypeStruct((f, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, gamma, beta, w1, b1, w2, dout)

    return call


# ---------------------------------------------------------------------------
# ln_attention forward variants (per-sample group g=1 at L3)
# ---------------------------------------------------------------------------

def attn_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                    bout_ref, y_ref, *, mode):
    """mode: v0 = current head loop; nosm = softmax->scale bound;
    pipe = 1-deep head software pipeline (QK of h+1 issued before
    softmax of h); batched = all-heads QK/PV via reshaped big matmuls."""
    dtype = x_ref.dtype
    for i in range(x_ref.shape[0]):
        x = x_ref[i].astype(jnp.float32)
        xh, _ = _ln_fwd(x)
        ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
        qkv = (jnp.dot(ln, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...]).astype(dtype)
        d = HEADS * DH

        def qk(h):
            q = qkv[:, h * DH:(h + 1) * DH]
            k = qkv[:, d + h * DH:d + (h + 1) * DH]
            return jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * SCALE

        def softmax(s):
            if mode == "nosm":
                return (s * 0.01).astype(dtype), jnp.ones(
                    (S, 1), jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return p.astype(dtype), jnp.sum(p, axis=-1, keepdims=True)

        def pv(p, l, h):
            v = qkv[:, 2 * d + h * DH:2 * d + (h + 1) * DH]
            o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
            return o.astype(dtype)

        outs = []
        if mode == "pipe":
            s_next = qk(0)
            for h in range(HEADS):
                s_h = s_next
                if h + 1 < HEADS:
                    s_next = qk(h + 1)          # MXU, independent
                p, l = softmax(s_h)             # VPU
                outs.append(pv(p, l, h))        # MXU
        elif mode == "stage":
            ss = [qk(h) for h in range(HEADS)]
            pls = [softmax(s) for s in ss]
            outs = [pv(p, l, h) for h, (p, l) in enumerate(pls)]
        elif mode == "pipe2":
            # 2-deep: softmax of h overlaps qk(h+1) AND pv(h-1)
            s0, s1 = qk(0), qk(1)
            p_prev = softmax(s0)
            sbuf = s1
            for h in range(1, HEADS):
                p_h = softmax(sbuf)
                if h + 1 < HEADS:
                    sbuf = qk(h + 1)
                outs.append(pv(*p_prev, h - 1))
                p_prev = p_h
            outs.append(pv(*p_prev, HEADS - 1))
        else:
            for h in range(HEADS):
                p, l = softmax(qk(h))
                outs.append(pv(p, l, h))
        o = jnp.concatenate(outs, axis=-1)
        y = jnp.dot(o, wout_ref[...],
                    preferred_element_type=jnp.float32) + bout_ref[...]
        y_ref[i] = (x + y).astype(dtype)


def _row3(g, s, w):
    return pl.BlockSpec((g, s, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# ln_attention backward variants (g=1 at L3)
# ---------------------------------------------------------------------------

def attn_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                    dout_ref, dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref,
                    dwout_ref, dbout_ref, *, mode):
    """mode: v0 = current two-pass head loops; stage2 = two-pass, each
    pass stage-grouped across heads; uni = SINGLE softmax recompute,
    stage-grouped (saves 12 QK matmuls + 12 exps per sample)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    dtype = x_ref.dtype
    d = HEADS * DH
    for i in range(x_ref.shape[0]):
        x = x_ref[i].astype(jnp.float32)
        dy = dout_ref[i].astype(jnp.float32)
        xh, inv = _ln_fwd(x)
        ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
        qkv = (jnp.dot(ln, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...]).astype(dtype)
        dyb = dy.astype(dtype)

        def qh(h):
            return qkv[:, h * DH:(h + 1) * DH]

        def kh(h):
            return qkv[:, d + h * DH:d + (h + 1) * DH]

        def vh(h):
            return qkv[:, 2 * d + h * DH:2 * d + (h + 1) * DH]

        def scores(h):
            return jax.lax.dot_general(
                qh(h), kh(h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * SCALE

        def softmax(s):
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            return p, 1.0 / jnp.sum(p, axis=-1, keepdims=True)

        if mode == "uni":
            ss = [scores(h) for h in range(HEADS)]
            pls = [softmax(s) for s in ss]
            os_ = []
            for h, (p, invl) in enumerate(pls):
                o = jnp.dot(p.astype(dtype), vh(h),
                            preferred_element_type=jnp.float32) * invl
                os_.append(o.astype(dtype))
            o = jnp.concatenate(os_, axis=-1)
            dwout_ref[...] += jax.lax.dot_general(
                o, dyb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
            do = jax.lax.dot_general(dyb, wout_ref[...],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dps = []
            for h in range(HEADS):
                doh = do[:, h * DH:(h + 1) * DH].astype(dtype)
                dps.append(jax.lax.dot_general(
                    doh, vh(h), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))
            dqs, dks, dvs = [], [], []
            for h in range(HEADS):
                p, invl = pls[h]
                doh = do[:, h * DH:(h + 1) * DH].astype(dtype)
                dov = (do[:, h * DH:(h + 1) * DH] * invl).astype(dtype)
                pb = p.astype(dtype)
                dvs.append(jax.lax.dot_general(
                    pb, dov, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                t = p * dps[h]
                c = jnp.sum(t, axis=-1, keepdims=True) * invl
                ds = (t - p * c) * invl
                dsb = ds.astype(dtype)
                dqs.append(jnp.dot(dsb, kh(h),
                                   preferred_element_type=jnp.float32)
                           * SCALE)
                dks.append(jax.lax.dot_general(
                    dsb, qh(h), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) * SCALE)
            dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
        else:  # v0 / stage2: two passes, each with its own recompute
            if mode == "stage2":
                ss = [scores(h) for h in range(HEADS)]
                pls = [softmax(s) for s in ss]
                os_ = [(jnp.dot(p.astype(dtype), vh(h),
                                preferred_element_type=jnp.float32)
                        * invl).astype(dtype)
                       for h, (p, invl) in enumerate(pls)]
                o = jnp.concatenate(os_, axis=-1)
            else:
                outs = []
                for h in range(HEADS):
                    p, invl = softmax(scores(h))
                    o_h = jnp.dot(p.astype(dtype), vh(h),
                                  preferred_element_type=jnp.float32) * invl
                    outs.append(o_h.astype(dtype))
                o = jnp.concatenate(outs, axis=-1)
            dwout_ref[...] += jax.lax.dot_general(
                o, dyb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
            do = jax.lax.dot_general(dyb, wout_ref[...],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if mode == "stage2":
                ss = [scores(h) for h in range(HEADS)]
                pls = [softmax(s) for s in ss]
                dps = []
                for h in range(HEADS):
                    doh = do[:, h * DH:(h + 1) * DH].astype(dtype)
                    dps.append(jax.lax.dot_general(
                        doh, vh(h), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                dqs, dks, dvs = [], [], []
                for h in range(HEADS):
                    p, invl = pls[h]
                    dov = (do[:, h * DH:(h + 1) * DH] * invl).astype(dtype)
                    pb = p.astype(dtype)
                    dvs.append(jax.lax.dot_general(
                        pb, dov, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    t = p * dps[h]
                    c = jnp.sum(t, axis=-1, keepdims=True) * invl
                    ds = (t - p * c) * invl
                    dsb = ds.astype(dtype)
                    dqs.append(jnp.dot(dsb, kh(h),
                                       preferred_element_type=jnp.float32)
                               * SCALE)
                    dks.append(jax.lax.dot_general(
                        dsb, qh(h), (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * SCALE)
                dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)
            else:
                dqs, dks, dvs = [], [], []
                for h in range(HEADS):
                    p, invl = softmax(scores(h))
                    doh = do[:, h * DH:(h + 1) * DH].astype(dtype)
                    dov = (do[:, h * DH:(h + 1) * DH] * invl).astype(dtype)
                    pb = p.astype(dtype)
                    dvs.append(jax.lax.dot_general(
                        pb, dov, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                    dp = jax.lax.dot_general(
                        doh, vh(h), (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    t = p * dp
                    c = jnp.sum(t, axis=-1, keepdims=True) * invl
                    ds = (t - p * c) * invl
                    dsb = ds.astype(dtype)
                    dqs.append(jnp.dot(dsb, kh(h),
                                       preferred_element_type=jnp.float32)
                               * SCALE)
                    dks.append(jax.lax.dot_general(
                        dsb, qh(h), (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32) * SCALE)
                dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)

        dqkvb = dqkv.astype(dtype)
        dwqkv_ref[...] += jax.lax.dot_general(
            ln, dqkvb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
        dln = jax.lax.dot_general(dqkvb, wqkv_ref[...],
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dg_ref[...] += jnp.sum(dln * xh, axis=0, keepdims=True)
        db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
        dxh = dln * g_ref[...]
        dx_ref[i] = (dy + _ln_bwd_dx(dxh, xh, inv)).astype(dtype)


def make_attn_bwd(mode):
    k = functools.partial(attn_bwd_kernel, mode=mode)
    f32 = jnp.float32

    def call(x, gamma, beta, wqkv, bqkv, wout, dout):
        n, s, d = x.shape
        return pl.pallas_call(
            k, grid=(n,),
            in_specs=[_row3(1, s, d), _const((1, d)), _const((1, d)),
                      _const((d, 3 * d)), _const((1, 3 * d)),
                      _const((d, d)), _row3(1, s, d)],
            out_specs=(_row3(1, s, d), _const((1, d)), _const((1, d)),
                       _const((d, 3 * d)), _const((1, 3 * d)),
                       _const((d, d)), _const((1, d))),
            out_shape=(jax.ShapeDtypeStruct((n, s, d), x.dtype),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((d, 3 * d), f32),
                       jax.ShapeDtypeStruct((1, 3 * d), f32),
                       jax.ShapeDtypeStruct((d, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(x, gamma, beta, wqkv, bqkv, wout, dout)

    return call


def make_attn(mode):
    k = functools.partial(attn_fwd_kernel, mode=mode)

    def call(x, gamma, beta, wqkv, bqkv, wout, bout):
        n, s, d = x.shape
        return pl.pallas_call(
            k,
            grid=(n,),
            in_specs=[_row3(1, s, d), _const((1, d)), _const((1, d)),
                      _const((d, 3 * d)), _const((1, 3 * d)),
                      _const((d, d)), _const((1, d))],
            out_specs=_row3(1, s, d),
            out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        )(x, gamma, beta, wqkv, bqkv, wout, bout)

    return call


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    dev = jax.devices()[0]
    print(f"device={dev.device_kind} L3 shapes B={B} M={M} D={D} F={F} K={K}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    dt = jnp.bfloat16
    gamma = jnp.ones((1, D), jnp.float32)
    beta = jnp.zeros((1, D), jnp.float32)

    if which in ("mlp", "all"):
        x = jax.random.normal(ks[0], (M, D), dt)
        w1 = jax.random.normal(ks[1], (D, F), dt) * D ** -0.5
        b1 = jnp.zeros((1, F), jnp.float32)
        w2 = jax.random.normal(ks[2], (F, D), dt) * F ** -0.5
        b2 = jnp.zeros((1, D), jnp.float32)

        base = make_mlp(mlp_fwd_kernel_v0, gelu=_gelu, ln=True)
        ref = np.asarray(base(x, gamma, beta, w1, b1, w2, b2),
                         jnp.float32)
        variants = {
            "mlp_fwd v0 (current)": base,
            "mlp_fwd no-gelu BOUND": make_mlp(mlp_fwd_kernel_v0, gelu=None,
                                              ln=True),
            "mlp_fwd no-ln BOUND": make_mlp(mlp_fwd_kernel_v0, gelu=_gelu,
                                            ln=False),
            "mlp_fwd splitN2": make_mlp(mlp_fwd_kernel_splitn, parts=2),
            "mlp_fwd splitN4": make_mlp(mlp_fwd_kernel_splitn, parts=4),
            "mlp_fwd rowpipe2": make_mlp(mlp_fwd_kernel_rowpipe, parts=2),
            "mlp_fwd rowpipe4": make_mlp(mlp_fwd_kernel_rowpipe, parts=4),
            "mlp_fwd rowpipe2 tm256": make_mlp(mlp_fwd_kernel_rowpipe,
                                               tm=256, parts=2),
            "mlp_fwd rowpipe4 tm256": make_mlp(mlp_fwd_kernel_rowpipe,
                                               tm=256, parts=4),
            "mlp_fwd rowpipe8 tm256": make_mlp(mlp_fwd_kernel_rowpipe,
                                               tm=256, parts=8),
            "mlp_fwd rowpipe4 tm512": make_mlp(mlp_fwd_kernel_rowpipe,
                                               tm=512, parts=4),
            "mlp_fwd rowpipe8 tm512": make_mlp(mlp_fwd_kernel_rowpipe,
                                               tm=512, parts=8),
        }
        for name, fn in variants.items():
            t = timed(lambda xx: fn(xx, gamma, beta, w1, b1, w2, b2), x)
            exact = ""
            if "BOUND" not in name:
                out = np.asarray(fn(x, gamma, beta, w1, b1, w2, b2),
                                 jnp.float32)
                err = float(np.max(np.abs(out - ref)))
                exact = f"  max|Δ|={err:.2e}"
            print(f"{name:28s} {t:7.3f} ms{exact}", flush=True)

        dout = jax.random.normal(ks[3], (M, D), dt)
        bwd0 = make_mlp_bwd(mlp_bwd_kernel_v0)
        refb = [np.asarray(a, jnp.float32) for a in
                bwd0(x, gamma, beta, w1, b1, w2, dout)]
        for name, fn in {
            "mlp_bwd v0 (current)": bwd0,
            "mlp_bwd rowpipe2": make_mlp_bwd(mlp_bwd_kernel_rowpipe,
                                             parts=2),
            "mlp_bwd rowpipe4": make_mlp_bwd(mlp_bwd_kernel_rowpipe,
                                             parts=4),
            "mlp_bwd rowpipe2 tm256": make_mlp_bwd(mlp_bwd_kernel_rowpipe,
                                                   tm=256, parts=2),
            "mlp_bwd rowpipe4 tm256": make_mlp_bwd(mlp_bwd_kernel_rowpipe,
                                                   tm=256, parts=4),
            "mlp_bwd v0 tm256": make_mlp_bwd(mlp_bwd_kernel_v0, tm=256),
            "mlp_bwd v0 tm64": make_mlp_bwd(mlp_bwd_kernel_v0, tm=64),
            "mlp_bwd fsplit2": make_mlp_bwd(mlp_bwd_kernel_fsplit, parts=2),
            "mlp_bwd fsplit4": make_mlp_bwd(mlp_bwd_kernel_fsplit, parts=4),
            "mlp_bwd fsplit2 tm256": make_mlp_bwd(mlp_bwd_kernel_fsplit,
                                                  tm=256, parts=2),
            "mlp_bwd fsplit4 tm256": make_mlp_bwd(mlp_bwd_kernel_fsplit,
                                                  tm=256, parts=4),
            "mlp_bwd fsplit4 tm512": make_mlp_bwd(mlp_bwd_kernel_fsplit,
                                                  tm=512, parts=4),
            "mlp_bwd v0 tm512": make_mlp_bwd(mlp_bwd_kernel_v0, tm=512),
            "mlp_bwd fsplit2 tm512": make_mlp_bwd(mlp_bwd_kernel_fsplit,
                                                  tm=512, parts=2),
        }.items():
            t = timed(lambda xx: fn(xx, gamma, beta, w1, b1, w2, dout)[0], x)
            outs = [np.asarray(a, jnp.float32) for a in
                    fn(x, gamma, beta, w1, b1, w2, dout)]
            err = max(float(np.max(np.abs(a - b))) / max(
                1e-9, float(np.max(np.abs(b)))) for a, b in zip(outs, refb))
            print(f"{name:28s} {t:7.3f} ms  max rel Δ={err:.2e}", flush=True)

    if which in ("attn", "all"):
        x = jax.random.normal(ks[4], (B, S, D), dt)
        wqkv = jax.random.normal(ks[5], (D, 3 * D), dt) * D ** -0.5
        bqkv = jnp.zeros((1, 3 * D), jnp.float32)
        wout = jax.random.normal(ks[6], (D, D), dt) * D ** -0.5
        bout = jnp.zeros((1, D), jnp.float32)
        base = make_attn("v0")
        ref = np.asarray(base(x, gamma, beta, wqkv, bqkv, wout, bout),
                         jnp.float32)
        for name, fn in {
            "attn_fwd v0 (current)": base,
            "attn_fwd no-softmax BOUND": make_attn("nosm"),
            "attn_fwd headpipe": make_attn("pipe"),
            "attn_fwd headpipe2": make_attn("pipe2"),
            "attn_fwd stagegroup": make_attn("stage"),
        }.items():
            t = timed(lambda xx: fn(xx, gamma, beta, wqkv, bqkv, wout,
                                    bout), x)
            exact = ""
            if "BOUND" not in name:
                out = np.asarray(fn(x, gamma, beta, wqkv, bqkv, wout, bout),
                                 jnp.float32)
                err = float(np.max(np.abs(out - ref)))
                exact = f"  max|Δ|={err:.2e}"
            print(f"{name:28s} {t:7.3f} ms{exact}", flush=True)

    if which in ("attnbwd", "all"):
        x = jax.random.normal(ks[4], (B, S, D), dt)
        wqkv = jax.random.normal(ks[5], (D, 3 * D), dt) * D ** -0.5
        bqkv = jnp.zeros((1, 3 * D), jnp.float32)
        wout = jax.random.normal(ks[6], (D, D), dt) * D ** -0.5
        dout = jax.random.normal(ks[7], (B, S, D), dt)
        base = make_attn_bwd("v0")
        refb = [np.asarray(a, jnp.float32) for a in
                base(x, gamma, beta, wqkv, bqkv, wout, dout)]
        for name, fn in {
            "attn_bwd v0 (current)": base,
            "attn_bwd stage2": make_attn_bwd("stage2"),
            "attn_bwd uni-stage": make_attn_bwd("uni"),
        }.items():
            t = timed(lambda xx: fn(xx, gamma, beta, wqkv, bqkv, wout,
                                    dout)[0], x)
            outs = [np.asarray(a, jnp.float32) for a in
                    fn(x, gamma, beta, wqkv, bqkv, wout, dout)]
            err = max(float(np.max(np.abs(a - b))) / max(
                1e-9, float(np.max(np.abs(b)))) for a, b in zip(outs, refb))
            print(f"{name:28s} {t:7.3f} ms  max rel Δ={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
