"""Pallas TPU megakernels: whole encoder half-blocks in single programs.

VERDICT r2 #4 / DESIGN.md §4b: after the fused attention + MLP kernels the
NesT step remains HBM-bound on the glue between them — fp32 LayerNorm round
trips, projection reads/writes, residual adds. These two kernels fuse each
half of the (pre-LN) transformer block so the activation touches HBM once
per half-block in each direction:

  ln_attention: y = x + OutProj(MHSA(LN1(x)))     [N, S, D]
  ln_mlp:       y = x + fc2(gelu(fc1(LN2(x))))    [M, D] rows

Both carry custom VJPs that RECOMPUTE everything on-chip (flash-style): the
only HBM tensors are x, y and their gradients, plus the (small) weight-grad
accumulators riding grid-constant output blocks accumulated in fp32 across a
sequential grid.

Attention math matches ops/block_attention.py (same packed-qkv layout, same
deferred normalization); MLP math matches ops/fused_mlp.py (exact-erf GELU);
LN matches nn.LayerNorm(use_fast_variance) semantics in fp32. Reference
semantics: timm NesT/ViT pre-LN blocks (reference OnlyImagingModule.py:25-32
model list).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vlp_tpu.ops.fused_mlp import _gelu, _gelu_and_grad, _gelu_grad

_EPS = 1e-6


# -- shared LN helpers (fp32, rowwise over the minor dim) -------------------

def _ln_fwd(x32):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _EPS)
    return xc * inv, inv  # x_hat, inv_sigma


def _ln_bwd_dx(dxh, xh, inv):
    # dx = inv * (dxh - mean(dxh) - xh * mean(dxh * xh))
    m1 = jnp.mean(dxh, axis=-1, keepdims=True)
    m2 = jnp.mean(dxh * xh, axis=-1, keepdims=True)
    return inv * (dxh - m1 - xh * m2)


# ==========================================================================
# ln_attention: y = x + OutProj(MHSA(LN(x)))
# ==========================================================================

def _transposed_mm() -> bool:
    """Opt-in (VLP_MEGA_TRANSPOSED=1): orient the small-width attention
    matmuls (PV, dV, dQ, dK) with the Dh=32 head dim on the M
    (streaming/sublane) axis instead of the 128-padded N/K lane axis:
    O^T = V^T P^T etc. On paper this cuts those matmuls' MXU padding from
    4x (Dh=32 -> 128 lanes) to the S->next-128 pad (196 -> 256 = 1.31x).

    MEASURED SLOWER on v5e and left OFF by default: nest_small train 752
    vs 878 img/s (-14%), vit_base 1035 vs 1050. The reoriented contraction
    lands on dim 1 of the stationary [S, S] probability operand, so Mosaic
    relayouts/transposes P per head in VMEM — costing more than the lane
    padding it saves (DESIGN.md §7b negative results)."""
    import os

    return os.environ.get("VLP_MEGA_TRANSPOSED", "0") == "1"


def _serial_heads() -> bool:
    """Opt-out (VLP_MEGA_SERIAL=1): restore the r3 head-serial schedules.
    The default STAGE-GROUPS the per-head phases (all QK^T matmuls, then
    all softmaxes, then all PV matmuls) so Mosaic can overlap one head's
    VPU softmax with another head's MXU matmul — measured on v5e at L3
    shapes (mega_variants.py, dispatch-corrected): fwd 0.64 -> 0.53 ms,
    bwd 1.80 -> 1.45 ms per block, outputs bitwise identical."""
    import os

    return os.environ.get("VLP_MEGA_SERIAL", "0") == "1"


def _attn_heads_fwd(qkv, num_heads, head_dim, scale, dtype):
    """Per-head softmax attention on packed [S, 3D] bf16; returns [S, D].
    Stage-grouped across heads by default (see _serial_heads)."""
    d = num_heads * head_dim

    def qk(h):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    def softmax(s):
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        return p, jnp.sum(p, axis=-1, keepdims=True)

    def pv(p, l, h):
        lo = h * head_dim
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        o = jnp.dot(p.astype(dtype), v,
                    preferred_element_type=jnp.float32) / l
        return o.astype(dtype)

    if _serial_heads():
        outs = [pv(*softmax(qk(h)), h) for h in range(num_heads)]
    else:
        ss = [qk(h) for h in range(num_heads)]
        pls = [softmax(s) for s in ss]
        outs = [pv(p, l, h) for h, (p, l) in enumerate(pls)]
    return jnp.concatenate(outs, axis=-1)  # [S, D]


def _attn_heads_fwd_t(qkv, num_heads, head_dim, scale, dtype):
    """Transposed-output attention on packed [S, 3D]: returns o^T [D, S].
    The PV matmul runs as o_h^T = V_h^T P_h^T (M=Dh streams on sublanes,
    lanes carry S) — see _transposed_mm. Normalization folds into P before
    the matmul (P * 1/l), same math as the deferred division."""
    d = num_heads * head_dim
    outs = []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        inv_l = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        pn = (p * inv_l).astype(dtype)
        # o_h^T[a, j] = sum_i v[i, a] * pn[j, i]
        ot = jax.lax.dot_general(v, pn, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        outs.append(ot.astype(dtype))
    return jnp.concatenate(outs, axis=0)  # [D, S]


def _attn_heads_bwd_t(qkv, do, num_heads, head_dim, scale, dtype):
    """Gradient wrt packed qkv given do [S, D] f32, TRANSPOSED layout:
    returns dqkv^T [3D, S] f32. dV/dQ/dK run with Dh on the M axis
    (contraction over S instead of a 32->128-padded N); the dP matmul
    keeps the irreducible Dh-wide contraction like _attn_heads_bwd."""
    d = num_heads * head_dim
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        doh = do[:, lo:lo + head_dim].astype(dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        inv_l = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(dtype)
        dov = (doh.astype(jnp.float32) * inv_l).astype(dtype)
        # dv^T[a, j] = sum_i dov[i, a] * pb[i, j]
        dv_t = jax.lax.dot_general(dov, pb, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        t = p * dp
        c = jnp.sum(t, axis=-1, keepdims=True) * inv_l
        ds = (t - p * c) * inv_l
        dsb = ds.astype(dtype)
        # dq^T[a, i] = scale * sum_j k[j, a] * ds[i, j]
        dqs.append(jax.lax.dot_general(
            k, dsb, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        # dk^T[a, j] = scale * sum_i q[i, a] * ds[i, j]
        dks.append(jax.lax.dot_general(
            q, dsb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dvs.append(dv_t)
    return jnp.concatenate(dqs + dks + dvs, axis=0)  # [3D, S] f32


def _attn_heads_bwd(qkv, do, num_heads, head_dim, scale, dtype):
    """Gradient wrt packed qkv given do [S, D] f32; returns [S, 3D] f32."""
    d = num_heads * head_dim
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        v = qkv[:, 2 * d + lo:2 * d + lo + head_dim]
        doh = do[:, lo:lo + head_dim].astype(dtype)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        inv_l = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(dtype)
        dov = (doh.astype(jnp.float32) * inv_l).astype(dtype)
        dv = jax.lax.dot_general(pb, dov, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(doh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        t = p * dp
        c = jnp.sum(t, axis=-1, keepdims=True) * inv_l
        ds = (t - p * c) * inv_l
        dsb = ds.astype(dtype)
        dqs.append(jnp.dot(dsb, k, preferred_element_type=jnp.float32)
                   * scale)
        dks.append(jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dvs.append(dv)
    return jnp.concatenate(dqs + dks + dvs, axis=-1)  # [S, 3D] f32


def _softmax_heads(qkv, num_heads, head_dim, scale):
    """Stage-grouped per-head scores + softmax on packed [S, 3D]:
    all QK^T matmuls, then all softmaxes; returns [(p_f32, l_f32)]."""
    d = num_heads * head_dim
    ss = []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        ss.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
    pls = []
    for s in ss:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        pls.append((p, jnp.sum(p, axis=-1, keepdims=True)))
    return pls


def _heads_o(qkv, pls, num_heads, head_dim, dtype):
    """PV per head from precomputed softmaxes -> [S, D] bf16."""
    d = num_heads * head_dim
    outs = []
    for h, (p, l) in enumerate(pls):
        v = qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim]
        o = jnp.dot(p.astype(dtype), v,
                    preferred_element_type=jnp.float32) / l
        outs.append(o.astype(dtype))
    return jnp.concatenate(outs, axis=-1)


def _heads_dqkv(qkv, do, pls, num_heads, head_dim, scale, dtype):
    """Per-head dq/dk/dv from precomputed softmaxes, stage-grouped;
    do f32 [S, D] -> dqkv [S, 3D] f32. Matches _attn_heads_bwd's math
    (bf16-rounded doh, inv_l folding) with the softmax reused."""
    d = num_heads * head_dim
    dohs = [do[:, h * head_dim:(h + 1) * head_dim].astype(dtype)
            for h in range(num_heads)]
    dps = [jax.lax.dot_general(
        dohs[h], qkv[:, 2 * d + h * head_dim:2 * d + (h + 1) * head_dim],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        for h in range(num_heads)]
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        lo = h * head_dim
        q = qkv[:, lo:lo + head_dim]
        k = qkv[:, d + lo:d + lo + head_dim]
        p, l = pls[h]
        invl = 1.0 / l
        dov = (dohs[h].astype(jnp.float32) * invl).astype(dtype)
        pb = p.astype(dtype)
        dvs.append(jax.lax.dot_general(
            pb, dov, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        t = p * dps[h]
        c = jnp.sum(t, axis=-1, keepdims=True) * invl
        ds = (t - p * c) * invl
        dsb = ds.astype(dtype)
        dqs.append(jnp.dot(dsb, k, preferred_element_type=jnp.float32)
                   * scale)
        dks.append(jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
    return jnp.concatenate(dqs + dks + dvs, axis=-1)


def _attn_out(qkv, wout, bout, num_heads, head_dim, scale, dtype,
              transposed):
    """MHSA + out-projection on packed qkv [S, 3D] -> [S, D] (pre-bias
    residual add left to the caller). The transposed orientation computes
    o^T [D, S] and contracts it against wout over dim 0 — mathematically
    the same y, no in-kernel transposes (see _transposed_mm)."""
    if transposed:
        ot = _attn_heads_fwd_t(qkv, num_heads, head_dim, scale, dtype)
        return jax.lax.dot_general(
            ot, wout, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bout
    o = _attn_heads_fwd(qkv, num_heads, head_dim, scale, dtype)
    return jnp.dot(o, wout, preferred_element_type=jnp.float32) + bout


def _lnattn_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                       bout_ref, y_ref, *, num_heads, head_dim, scale,
                       transposed):
    # NOTE (round-4 negative result): a group-batched variant running
    # LN/QKV/out-proj ONCE over the whole [g*S, D] sample group (only the
    # head cores per sample) measured NEUTRAL-to-SLOWER (L1 fwd 2.92 ->
    # 3.24 ms, L2 bwd 3.14 -> 3.75 ms; L3 has g=1) — the small-d levels
    # are VPU-bound on softmax work, not projection-instruction-bound, so
    # batching the matmuls bought nothing and the bigger live set hurt.
    # The per-sample loop stays.
    dtype = x_ref.dtype
    for i in range(x_ref.shape[0]):
        x = x_ref[i].astype(jnp.float32)            # [S, D]
        xh, _ = _ln_fwd(x)
        ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
        qkv = (jnp.dot(ln, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...]).astype(dtype)       # [S, 3D]
        y = _attn_out(qkv, wout_ref[...], bout_ref[...], num_heads,
                      head_dim, scale, dtype, transposed)
        y_ref[i] = (x + y).astype(dtype)


def _attn_block_bwd_rows(x, dy, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                         dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref,
                         dbout_ref, num_heads, head_dim, scale, dtype,
                         transposed):
    """Shared per-sample backward body (row and NHWC kernels): given x/dy
    f32 [S, D], accumulate every weight grad and return dx [S, D] f32.
    In transposed mode dwqkv/dbqkv accumulate as [3D, D]/[3D, 1] (the
    natural layout of dqkv^T) — _lnattn_bwd transposes them back."""
    xh, inv = _ln_fwd(x)
    ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
    qkv = (jnp.dot(ln, wqkv_ref[...],
                   preferred_element_type=jnp.float32)
           + bqkv_ref[...]).astype(dtype)
    dyb = dy.astype(dtype)
    # Round-4 schedule (default): ONE softmax recompute shared by the
    # o(dWout) and dqkv derivations, with every per-head phase
    # stage-grouped across heads so one head's VPU softmax/ds work can
    # overlap another's MXU matmuls. Measured on v5e at L3 shapes
    # (benchmarks/mega_variants.py): 1.80 -> 1.45 ms/block vs the r3
    # head-serial TWO-pass variant, outputs bitwise identical. (The r3
    # note — a head-serial unified loop measured 1.7% slower — still
    # holds for the SERIAL schedule; stage-grouping is what flips the
    # verdict. VLP_MEGA_SERIAL=1 restores the r3 two-pass schedule.)
    if transposed:
        ot = _attn_heads_fwd_t(qkv, num_heads, head_dim, scale, dtype)
        dwout_ref[...] += jax.lax.dot_general(
            ot, dyb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    elif not _serial_heads():
        return _attn_block_bwd_rows_unified(
            x, dy, dyb, xh, inv, ln, qkv, g_ref, wqkv_ref, wout_ref,
            dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
            num_heads, head_dim, scale, dtype)
    else:
        o = _attn_heads_fwd(qkv, num_heads, head_dim, scale, dtype)
        dwout_ref[...] += jax.lax.dot_general(
            o, dyb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    do = jax.lax.dot_general(dyb, wout_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if transposed:
        dqkv_t = _attn_heads_bwd_t(qkv, do, num_heads, head_dim, scale,
                                   dtype)
        dqkvb = dqkv_t.astype(dtype)
        dwqkv_ref[...] += jax.lax.dot_general(
            dqkvb, ln, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [3D, D]
        dbqkv_ref[...] += jnp.sum(dqkv_t, axis=1, keepdims=True)
        dln = jax.lax.dot_general(
            dqkvb, wqkv_ref[...], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        dqkv = _attn_heads_bwd(qkv, do, num_heads, head_dim, scale, dtype)
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
    return dy + _ln_bwd_dx(dxh, xh, inv)


def _attn_block_bwd_rows_unified(x, dy, dyb, xh, inv, ln, qkv, g_ref,
                                 wqkv_ref, wout_ref, dg_ref, db_ref,
                                 dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
                                 num_heads, head_dim, scale, dtype):
    """Default non-transposed backward body: single softmax recompute,
    all per-head phases stage-grouped across heads (see the schedule
    note in _attn_block_bwd_rows). Same math, bitwise-equal outputs."""
    pls = _softmax_heads(qkv, num_heads, head_dim, scale)
    # o via /l and dov via the bf16-rounded doh exactly as the serial
    # _attn_heads_fwd/_attn_heads_bwd pair computes them
    o = _heads_o(qkv, pls, num_heads, head_dim, dtype)
    dwout_ref[...] += jax.lax.dot_general(
        o, dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    do = jax.lax.dot_general(dyb, wout_ref[...], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dqkv = _heads_dqkv(qkv, do, pls, num_heads, head_dim, scale, dtype)
    dqkvb = dqkv.astype(dtype)
    dwqkv_ref[...] += jax.lax.dot_general(
        ln, dqkvb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dln = jax.lax.dot_general(dqkvb, wqkv_ref[...], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dg_ref[...] += jnp.sum(dln * xh, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxh = dln * g_ref[...]
    return dy + _ln_bwd_dx(dxh, xh, inv)


def _lnattn_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
                       dout_ref,
                       dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref,
                       dwout_ref, dbout_ref, *, num_heads, head_dim, scale,
                       transposed):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    # (Same round-4 negative result as the forward: the group-batched
    # body measured neutral-to-slower; per-sample loop stays.)
    dtype = x_ref.dtype
    for i in range(x_ref.shape[0]):
        x = x_ref[i].astype(jnp.float32)
        dy = dout_ref[i].astype(jnp.float32)        # residual pass-through
        dx_ref[i] = _attn_block_bwd_rows(
            x, dy, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
            dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
            num_heads, head_dim, scale, dtype, transposed).astype(dtype)


def _attn_group(n: int, s: int, d: int, heads: int, itemsize: int) -> int:
    """Samples per grid program for the attention half-block backward.

    Only the x/dout/dx row blocks are double-buffered by the pipeline; the
    per-sample scratch (LN fp32 copies, qkv, dqkv f32, and — under the
    round-4 group-batched schedule — the per-head softmaxes held between
    the o and dqkv phases) scales with g. Larger groups COMPILE fine up
    to ~13 MB but measured no faster both before stage-grouping (v5e
    sweep: g=8/4/2 at 857 img/s vs g=4/2/1 at 878 on nest_small) and
    after (VLP_MEGA_ATTN_MB=13 re-measured L1 bwd 8.18 vs 7.70 ms); the
    budget keeps the measured-best grouping (L1/L2/L3 -> 4/2/1)."""
    import os

    budget = int(float(os.environ.get("VLP_MEGA_ATTN_MB", "11")) * 2 ** 20)
    weights = 4 * d * d * itemsize + 4 * d * d * 4  # wqkv+wout (+f32 accum)
    blocks = 2 * 3 * s * d * itemsize               # x/dout/dx, dbl-buffered
    scratch = (s * d * (2 * 4 + 5 * itemsize + 3 * 4 + 3 * 4)
               + (heads + 2) * s * s * 4)
    for g in (16, 8, 4, 2, 1):
        if n % g == 0 and weights + g * (blocks + scratch) <= budget:
            return g
    return 0


def _const(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _row3(g, s, w):
    return pl.BlockSpec((g, s, w), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _lnattn(x, gamma, beta, wqkv, bqkv, wout, bout, num_heads: int,
            interpret: bool):
    return _lnattn_fwd(x, gamma, beta, wqkv, bqkv, wout, bout, num_heads,
                       interpret)[0]


def _lnattn_fwd(x, gamma, beta, wqkv, bqkv, wout, bout, num_heads,
                interpret):
    n, s, d = x.shape
    head_dim = d // num_heads
    g = _attn_group(n, s, d, num_heads, x.dtype.itemsize)
    if g == 0:
        raise ValueError(
            f"ln_attention unsupported for N={n}, S={s}, D={d} — guard "
            "calls with supports_attn()")
    kernel = functools.partial(_lnattn_fwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=head_dim ** -0.5,
                               transposed=_transposed_mm())
    y = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[_row3(g, s, d), _const((1, d)), _const((1, d)),
                  _const((d, 3 * d)), _const((1, 3 * d)),
                  _const((d, d)), _const((1, d))],
        out_specs=_row3(g, s, d),
        out_shape=jax.ShapeDtypeStruct((n, s, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * s * (4 * d * d + 2 * s * d),
            bytes_accessed=2 * n * s * d * x.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(x, gamma, beta, wqkv, bqkv, wout, bout)
    return y, (x, gamma, beta, wqkv, bqkv, wout)


def _lnattn_bwd(num_heads, interpret, res, dout):
    x, gamma, beta, wqkv, bqkv, wout = res
    n, s, d = x.shape
    head_dim = d // num_heads
    g = _attn_group(n, s, d, num_heads, x.dtype.itemsize)
    transposed = _transposed_mm()
    kernel = functools.partial(_lnattn_bwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=head_dim ** -0.5,
                               transposed=transposed)
    f32 = jnp.float32
    # transposed mode accumulates dwqkv/dbqkv in dqkv^T's natural layout
    dwqkv_shape = (3 * d, d) if transposed else (d, 3 * d)
    dbqkv_shape = (3 * d, 1) if transposed else (1, 3 * d)
    dx, dg, db, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[_row3(g, s, d), _const((1, d)), _const((1, d)),
                  _const((d, 3 * d)), _const((1, 3 * d)), _const((d, d)),
                  _row3(g, s, d)],
        out_specs=(_row3(g, s, d), _const((1, d)), _const((1, d)),
                   _const(dwqkv_shape), _const(dbqkv_shape),
                   _const((d, d)), _const((1, d))),
        out_shape=(jax.ShapeDtypeStruct((n, s, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct(dwqkv_shape, f32),
                   jax.ShapeDtypeStruct(dbqkv_shape, f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * s * (4 * d * d + 2 * s * d),
            bytes_accessed=3 * n * s * d * x.dtype.itemsize,
            transcendentals=n * num_heads * s * s),
    )(x, gamma, beta, wqkv, bqkv, wout, dout)
    if transposed:  # tiny one-off XLA transpose/reshape outside the kernel
        dwqkv = dwqkv.T
        dbqkv = dbqkv.reshape(1, 3 * d)
    # cotangent dtypes match the _lnattn primal inputs (weights in the
    # compute dtype, gamma/beta/biases f32 [1, .]); caller-side cast VJPs
    # restore the original param forms
    return (dx, dg, db, dwqkv.astype(wqkv.dtype), dbqkv,
            dwout.astype(wout.dtype), dbout)


_lnattn.defvjp(_lnattn_fwd, _lnattn_bwd)


# ==========================================================================
# ln_mlp: y = x + fc2(gelu(fc1(LN(x)))) over [M, D] rows
# ==========================================================================

def _lnmlp_fwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      y_ref, *, parts):
    """parts > 1 (default 4): the row tile is processed as ``parts``
    independent sub-tiles with each phase issued for all sub-tiles
    back-to-back, so sub-tile j's VPU work (LN/GELU/residual) can overlap
    sub-tile j+1's MXU matmuls. Measured on v5e at L3 shapes
    (benchmarks/mega_variants.py, dispatch-corrected): 0.55 -> 0.44 ms
    per block at tm=512/parts=4, output bitwise identical; the same
    restructuring applied to the BACKWARD measured SLOWER (1.27 -> 1.63
    ms, weight-grad accumulators inflate the live set), so only the
    forward pipelines. VLP_MEGA_SERIAL=1 restores parts=1."""
    tm = x_ref.shape[0]
    sm = tm // parts
    xs, lns, zs, hs, ys = ([None] * parts for _ in range(5))
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


def _lnmlp_bwd_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, dout_ref,
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
    h32, dgelu = _gelu_and_grad(z)
    h = h32.astype(dtype)
    dy = dout_ref[...].astype(jnp.float32)
    dyb = dy.astype(dtype)
    dw2_ref[...] += jax.lax.dot_general(
        h, dyb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dh32 = jax.lax.dot_general(
        dyb, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * dgelu
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


def _lnmlp_bwd_kernel_fsplit(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref,
                             dout_ref, dx_ref, dg_ref, db_ref, dw1_ref,
                             db1_ref, dw2_ref, db2_ref, *, parts):
    """Backward pipelined over F column-slices (VERDICT r4 #5): slice p's
    VPU work (gelu_and_grad, the dgelu multiply) overlaps slice p+1's MXU
    matmuls (z, dh_raw), with only ~2 f-wide slices live at once — the
    row-sub-tile restructuring measured SLOWER (1.27 -> 1.63 ms, every
    sub-tile's z/h/dh alive together); slicing the HIDDEN dim instead
    keeps the live set flat. Measured v5e L3 (benchmarks/mega_variants.py
    'mlp_bwd fsplit'): see DESIGN.md §7b. Outputs match the serial kernel
    to one bf16 ulp on dx (dln summation order), weight grads bitwise."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    dtype = x_ref.dtype
    f = w1_ref.shape[1]
    fp = f // parts
    x = x_ref[...].astype(jnp.float32)
    xh, inv = _ln_fwd(x)
    ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
    dy = dout_ref[...].astype(jnp.float32)
    dyb = dy.astype(dtype)
    db2_ref[...] += jnp.sum(dy, axis=0, keepdims=True)

    def zslice(p):
        return jnp.dot(ln, w1_ref[:, p * fp:(p + 1) * fp],
                       preferred_element_type=jnp.float32) \
            + b1_ref[:, p * fp:(p + 1) * fp]

    def dhraw(p):
        return jax.lax.dot_general(
            dyb, w2_ref[p * fp:(p + 1) * fp, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def sink(p, z_p, draw_p, dln):
        h32, dgelu = _gelu_and_grad(z_p)
        h = h32.astype(dtype)
        dh32 = draw_p * dgelu
        dh = dh32.astype(dtype)
        dw2_ref[p * fp:(p + 1) * fp, :] += jax.lax.dot_general(
            h, dyb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dw1_ref[:, p * fp:(p + 1) * fp] += jax.lax.dot_general(
            ln, dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[:, p * fp:(p + 1) * fp] += jnp.sum(dh32, axis=0,
                                                   keepdims=True)
        t = jax.lax.dot_general(dh, w1_ref[:, p * fp:(p + 1) * fp],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return t if dln is None else dln + t

    dln = None
    z_p, draw_p = zslice(0), dhraw(0)
    for p in range(parts):
        if p + 1 < parts:  # issue slice p+1's MXU before slice p's VPU
            z_n, draw_n = zslice(p + 1), dhraw(p + 1)
        dln = sink(p, z_p, draw_p, dln)
        if p + 1 < parts:
            z_p, draw_p = z_n, draw_n
    dg_ref[...] += jnp.sum(dln * xh, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dln, axis=0, keepdims=True)
    dxh = dln * g_ref[...]
    dx_ref[...] = (dy + _ln_bwd_dx(dxh, xh, inv)).astype(dx_ref.dtype)


def _mlp_bwd_fsplit_parts(f: int) -> int:
    """F column-slices for the pipelined MLP backward; 1 = serial kernel.
    MEASURED NEUTRAL on v5e at L3 shapes (mega_variants.py: fsplit2 1.244
    vs serial 1.247 ms, fsplit2@tm256 1.210 vs serial@tm256 1.197) — the
    serial kernel's VPU work already overlaps its matmuls as scheduled by
    Mosaic, so explicit F-slice pipelining buys nothing; default stays
    serial and VLP_MEGA_BWD_SPLIT=2/4 keeps the variant testable
    (DESIGN.md §7b). Slices must be lane-aligned (128)."""
    import os

    p = max(1, int(os.environ.get("VLP_MEGA_BWD_SPLIT", "1")))
    while p > 1 and (f % p or (f // p) % 128):
        p //= 2
    return max(p, 1)


def _mlp_tile(m: int, d: int, f: int, itemsize: int) -> int:
    """Row tile for the MLP half-block backward under the VMEM budget.

    Accounting (retuned round 5 against on-chip measurement,
    benchmarks/mega_variants.py): only the x/dout/dx IO blocks are
    double-buffered by the pipeline; the per-row scratch (x/xh/dy f32,
    ln/dx bf16, z/dh32 f32 + h/dh bf16 over f cols) is single-buffered.
    The previous model double-counted scratch and capped L3 (d=384,
    f=1536) at tm=128 — tm=256 compiles fine and measures 4% faster
    (1.197 vs 1.247 ms/block v5e)."""
    budget = 15 * 1024 * 1024
    resident = 2 * d * f * itemsize + 2 * d * f * 4
    io_row = 2 * 3 * d * itemsize                      # dbl-buffered x/dy/dx
    scratch_row = d * (3 * 4 + 2 * itemsize) + f * (2 * 4 + itemsize)
    for tm in (512, 256, 128, 64):
        if m % tm == 0 and resident + tm * (io_row + scratch_row) <= budget:
            return tm
    return 0


def _mlp_tile_fwd(m: int, d: int, f: int, itemsize: int) -> tuple[int, int]:
    """(tile, parts) for the PIPELINED MLP forward. The forward holds no
    weight-grad accumulators and fewer f-wide live columns per row, so it
    affords a larger tile; parts=4 sub-tiles give the scheduler
    independent VPU/MXU streams (see _lnmlp_fwd_kernel). Falls back to
    the backward's tile serially when pipelining is off or nothing
    divides."""
    if _serial_heads():
        return _mlp_tile(m, d, f, itemsize), 1
    budget = 12 * 1024 * 1024
    resident = 2 * d * f * itemsize
    # per row: x f32 + ln bf16 + y f32 (d cols); z f32 + h bf16 (f cols);
    # double-buffered x/y io blocks (2 * 2 * itemsize * d)
    per_row = d * (8 + 2 * itemsize + 4 * itemsize) + f * (4 + itemsize)
    for tm in (512, 256, 128, 64):
        if m % tm == 0 and resident + tm * per_row <= budget:
            parts = 4 if tm % 4 == 0 and tm // 4 >= 16 else 1
            return tm, parts
    return 0, 1


def _row2(tm, d):
    return pl.BlockSpec((tm, d), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _lnmlp(x, gamma, beta, w1, b1, w2, b2, interpret: bool):
    return _lnmlp_fwd(x, gamma, beta, w1, b1, w2, b2, interpret)[0]


def _lnmlp_fwd(x, gamma, beta, w1, b1, w2, b2, interpret):
    m, d = x.shape
    f = w1.shape[1]
    tm, parts = _mlp_tile_fwd(m, d, f, x.dtype.itemsize)
    if tm == 0:
        tm, parts = _mlp_tile(m, d, f, x.dtype.itemsize), 1
    if tm == 0:
        raise ValueError(
            f"ln_mlp unsupported for M={m}, D={d}, F={f} — guard calls "
            "with supports_mlp()")
    y = pl.pallas_call(
        functools.partial(_lnmlp_fwd_kernel, parts=parts),
        grid=(m // tm,),
        in_specs=[_row2(tm, d), _const((1, d)), _const((1, d)),
                  _const((d, f)), _const((1, f)), _const((f, d)),
                  _const((1, d))],
        out_specs=_row2(tm, d),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=2 * m * d * x.dtype.itemsize,
            transcendentals=m * f),
    )(x, gamma, beta, w1, b1, w2, b2)
    return y, (x, gamma, beta, w1, b1, w2)


def _lnmlp_bwd(interpret, res, dout):
    x, gamma, beta, w1, b1, w2 = res
    m, d = x.shape
    f = w1.shape[1]
    tm = _mlp_tile(m, d, f, x.dtype.itemsize)
    f32 = jnp.float32
    parts = _mlp_bwd_fsplit_parts(f)
    kernel = (functools.partial(_lnmlp_bwd_kernel_fsplit, parts=parts)
              if parts > 1 else _lnmlp_bwd_kernel)
    dx, dg, db, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
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
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=12 * m * d * f,
            bytes_accessed=3 * m * d * x.dtype.itemsize,
            transcendentals=m * f),
    )(x, gamma, beta, w1, b1, w2, dout)
    return (dx, dg, db, dw1.astype(w1.dtype), db1,
            dw2.astype(w2.dtype), db2)


_lnmlp.defvjp(_lnmlp_fwd, _lnmlp_bwd)


# -- public API -------------------------------------------------------------

def _use_interpret() -> bool:
    from vlp_tpu.ops.kernel_gate import use_interpret

    return use_interpret()


def supports_attn(n: int, s: int, d: int, num_heads: int,
                  itemsize: int = 2) -> bool:
    """``n`` must be the per-shard batch under a multi-device mesh."""
    return d % num_heads == 0 and \
        _attn_group(n, s, d, num_heads, itemsize) > 0


def supports_mlp(m: int, d: int, f: int, itemsize: int = 2) -> bool:
    return _mlp_tile(m, d, f, itemsize) > 0


def ln_attention(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                 wqkv: jax.Array, bqkv: jax.Array, wout: jax.Array,
                 bout: jax.Array, num_heads: int) -> jax.Array:
    """y = x + OutProj(MHSA(LN(x))) over x [N, S, D]; single fused program
    per sample group, shard_map-wrapped under a multi-device mesh."""
    from vlp_tpu.ops.kernel_gate import shard_wrap

    interpret = _use_interpret()
    dt = x.dtype
    f32 = jnp.float32
    call = shard_wrap(
        lambda *a: _lnattn(*a, num_heads, interpret), x.shape[0],
        in_batched=(True,) + (False,) * 6, out_batched=True)
    if call is None:
        raise ValueError("ln_attention: batch does not divide the mesh — "
                         "guard with supports_attn() on the local shape")
    return call(x, gamma.reshape(1, -1).astype(f32),
                beta.reshape(1, -1).astype(f32), wqkv.astype(dt),
                bqkv.reshape(1, -1).astype(f32), wout.astype(dt),
                bout.reshape(1, -1).astype(f32))


def ln_mlp(x: jax.Array, gamma: jax.Array, beta: jax.Array, w1: jax.Array,
           b1: jax.Array, w2: jax.Array, b2: jax.Array) -> jax.Array:
    """y = x + fc2(gelu(fc1(LN(x)))) over x [M, D] rows (LN is rowwise, so
    [N, S, D] callers flatten); shard_map-wrapped under a mesh."""
    from vlp_tpu.ops.kernel_gate import shard_wrap

    interpret = _use_interpret()
    dt = x.dtype
    f32 = jnp.float32
    call = shard_wrap(
        lambda *a: _lnmlp(*a, interpret), x.shape[0],
        in_batched=(True,) + (False,) * 6, out_batched=True)
    if call is None:
        raise ValueError("ln_mlp: rows do not divide the mesh — guard with "
                         "supports_mlp() on the local shape")
    return call(x, gamma.reshape(1, -1).astype(f32),
                beta.reshape(1, -1).astype(f32), w1.astype(dt),
                b1.reshape(1, -1).astype(f32), w2.astype(dt),
                b2.reshape(1, -1).astype(f32))


# ==========================================================================
# Windowed NHWC variant: NesT local attention WITHOUT blockify/unblockify
# ==========================================================================
#
# NesT partitions the [B, H, W, D] token map into block x block windows and
# attends within each. The straightforward layout ([B*nb, S, D] with
# blockify/unblockify transposes around every level) pays "data formatting"
# HBM passes that the megakernel makes relatively expensive (~4% of the
# nest_small step after fusion). Here the BlockSpec index map feeds each
# program ONE ROW-STRIP (1, block, W, D) straight from the NHWC array —
# the gw windows inside a strip play the role of the sample group g, and
# the transposes disappear entirely in both directions.

def _lnattn_nhwc_fwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                            wout_ref, bout_ref, y_ref, *, num_heads,
                            head_dim, scale, block, transposed):
    dtype = x_ref.dtype
    w = x_ref.shape[2]
    s = block * block
    for wj in range(w // block):
        lo = wj * block
        x = x_ref[0, :, lo:lo + block, :].reshape(
            s, x_ref.shape[3]).astype(jnp.float32)
        xh, _ = _ln_fwd(x)
        ln = (xh * g_ref[...] + b_ref[...]).astype(dtype)
        qkv = (jnp.dot(ln, wqkv_ref[...],
                       preferred_element_type=jnp.float32)
               + bqkv_ref[...]).astype(dtype)
        y = _attn_out(qkv, wout_ref[...], bout_ref[...], num_heads,
                      head_dim, scale, dtype, transposed)
        y_ref[0, :, lo:lo + block, :] = (x + y).astype(dtype).reshape(
            block, block, x_ref.shape[3])


def _lnattn_nhwc_bwd_kernel(x_ref, g_ref, b_ref, wqkv_ref, bqkv_ref,
                            wout_ref, dout_ref,
                            dx_ref, dg_ref, db_ref, dwqkv_ref, dbqkv_ref,
                            dwout_ref, dbout_ref, *, num_heads, head_dim,
                            scale, block, transposed):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    dtype = x_ref.dtype
    w = x_ref.shape[2]
    d = num_heads * head_dim
    s = block * block
    for wj in range(w // block):
        lo = wj * block
        x = x_ref[0, :, lo:lo + block, :].reshape(s, d).astype(jnp.float32)
        dy = dout_ref[0, :, lo:lo + block, :].reshape(
            s, d).astype(jnp.float32)
        dx_ref[0, :, lo:lo + block, :] = _attn_block_bwd_rows(
            x, dy, g_ref, b_ref, wqkv_ref, bqkv_ref, wout_ref,
            dg_ref, db_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
            num_heads, head_dim, scale, dtype, transposed).astype(
            dtype).reshape(block, block, d)


def supports_window(b: int, h: int, w: int, d: int, num_heads: int,
                    block: int, itemsize: int = 2) -> bool:
    """``b`` must be the PER-SHARD batch under a multi-device mesh."""
    if d % num_heads or h % block or w % block:
        return False
    gw = w // block
    g = _attn_group(gw, block * block, d, num_heads, itemsize)
    return g == gw  # the whole row-strip must fit one program


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _lnattn_nhwc(x, gamma, beta, wqkv, bqkv, wout, bout, num_heads: int,
                 block: int, interpret: bool):
    return _lnattn_nhwc_fwd(x, gamma, beta, wqkv, bqkv, wout, bout,
                            num_heads, block, interpret)[0]


def _nhwc_specs(b, h, w, d, block):
    gh = h // block
    strip = pl.BlockSpec((1, block, w, d),
                         lambda i: (i // gh, i % gh, 0, 0),
                         memory_space=pltpu.VMEM)
    return (b * gh,), strip


def _lnattn_nhwc_fwd(x, gamma, beta, wqkv, bqkv, wout, bout, num_heads,
                     block, interpret):
    b, h, w, d = x.shape
    head_dim = d // num_heads
    if not supports_window(b, h, w, d, num_heads, block, x.dtype.itemsize):
        raise ValueError(
            f"ln_attention_windows unsupported for {x.shape} block={block} "
            "— guard with supports_window()")
    grid, strip = _nhwc_specs(b, h, w, d, block)
    kernel = functools.partial(_lnattn_nhwc_fwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=head_dim ** -0.5,
                               block=block, transposed=_transposed_mm())
    s = block * block
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[strip, _const((1, d)), _const((1, d)),
                  _const((d, 3 * d)), _const((1, 3 * d)),
                  _const((d, d)), _const((1, d))],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((b, h, w, d), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * (4 * d * d + 2 * s * d),
            bytes_accessed=2 * b * h * w * d * x.dtype.itemsize,
            transcendentals=b * h * w * s * num_heads // s),
    )(x, gamma, beta, wqkv, bqkv, wout, bout)
    return y, (x, gamma, beta, wqkv, bqkv, wout)


def _lnattn_nhwc_bwd(num_heads, block, interpret, res, dout):
    x, gamma, beta, wqkv, bqkv, wout = res
    b, h, w, d = x.shape
    head_dim = d // num_heads
    grid, strip = _nhwc_specs(b, h, w, d, block)
    transposed = _transposed_mm()
    kernel = functools.partial(_lnattn_nhwc_bwd_kernel, num_heads=num_heads,
                               head_dim=head_dim, scale=head_dim ** -0.5,
                               block=block, transposed=transposed)
    f32 = jnp.float32
    dwqkv_shape = (3 * d, d) if transposed else (d, 3 * d)
    dbqkv_shape = (3 * d, 1) if transposed else (1, 3 * d)
    dx, dg, db, dwqkv, dbqkv, dwout, dbout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[strip, _const((1, d)), _const((1, d)),
                  _const((d, 3 * d)), _const((1, 3 * d)), _const((d, d)),
                  strip],
        out_specs=(strip, _const((1, d)), _const((1, d)),
                   _const(dwqkv_shape), _const(dbqkv_shape),
                   _const((d, d)), _const((1, d))),
        out_shape=(jax.ShapeDtypeStruct((b, h, w, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct(dwqkv_shape, f32),
                   jax.ShapeDtypeStruct(dbqkv_shape, f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * w * (4 * d * d + 2 * block * block * d),
            bytes_accessed=3 * b * h * w * d * x.dtype.itemsize,
            transcendentals=b * h * w * num_heads),
    )(x, gamma, beta, wqkv, bqkv, wout, dout)
    if transposed:
        dwqkv = dwqkv.T
        dbqkv = dbqkv.reshape(1, 3 * d)
    return (dx, dg, db, dwqkv.astype(wqkv.dtype), dbqkv,
            dwout.astype(wout.dtype), dbout)


_lnattn_nhwc.defvjp(_lnattn_nhwc_fwd, _lnattn_nhwc_bwd)


def ln_attention_windows(x: jax.Array, block: int, gamma: jax.Array,
                         beta: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                         wout: jax.Array, bout: jax.Array,
                         num_heads: int) -> jax.Array:
    """NesT windowed y = x + OutProj(MHSA(LN(x))) directly on the NHWC
    token map [B, H, W, D] — no blockify/unblockify transposes; each Pallas
    program consumes one (block x W) row-strip via its index map.
    shard_map-wrapped over the batch dim under a multi-device mesh."""
    from vlp_tpu.ops.kernel_gate import shard_wrap

    interpret = _use_interpret()
    dt = x.dtype
    f32 = jnp.float32
    call = shard_wrap(
        lambda *a: _lnattn_nhwc(*a, num_heads, block, interpret),
        x.shape[0], in_batched=(True,) + (False,) * 6, out_batched=True)
    if call is None:
        raise ValueError("ln_attention_windows: batch does not divide the "
                         "mesh — guard with supports_window()")
    return call(x, gamma.reshape(1, -1).astype(f32),
                beta.reshape(1, -1).astype(f32), wqkv.astype(dt),
                bqkv.reshape(1, -1).astype(f32), wout.astype(dt),
                bout.reshape(1, -1).astype(f32))
