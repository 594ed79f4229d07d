#!/usr/bin/env python
"""VERDICT r4 #6: one conv-level attempt on the VLP flagship, measured.

The VLP step is at the XLA conv ceiling (47.9% analytic MFU, DESIGN.md
§4c trace: 71% conv fusions, 55.6% compute-bound). This probe answers, with
numbers on the real chip, whether a Pallas conv path could beat XLA where
it matters:

1. ``implicit-GEMM 3x3``: a Pallas forward conv at the flagship's dominant
   stage-2/3 ResNet34 shapes (28x28x128, 14x14x256 — where the trace says
   the FLOPs are), formulated as 9 shifted [M, C] @ [C, K] matmuls per
   sample group with the padded map held in VMEM (no im2col
   materialization), against ``jax.lax.conv_general_dilated`` bf16.

2. ``maxpool backward``: the stem maxpool's backward lowers to
   select-and-scatter (~0.9 ms/step, ~3% of the step, §4c). Candidate: an
   equality-split backward (gradient distributed over window-max ties via
   4 shifted-window passes, pure XLA). NOTE: ties get SPLIT gradients
   instead of first-element gradients, a subgradient-choice deviation from
   torch — shippable only as an opt-in knob; this probe records whether
   the win would even justify one.

Writes benchmarks/conv_probe.json. Run ON THE TPU (one process only).
"""
from __future__ import annotations

import functools
import json
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

K_STEPS = 20
REPEATS = 3
B = 128


def timed(fn, x0) -> float:
    @jax.jit
    def run(x):
        (xK,), _ = jax.lax.scan(lambda c, _: ((fn(c[0]),), None), (x,),
                                None, length=K_STEPS)
        return jnp.sum(xK.astype(jnp.float32))

    run(x0).block_until_ready()
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run(x0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K_STEPS)
    return best * 1e3


# ---------------------------------------------------------------------------
# 1) implicit-GEMM 3x3 conv forward (stride 1, SAME) vs XLA
# ---------------------------------------------------------------------------

def _conv_kernel(x_ref, w_ref, y_ref, *, hw, cin, cout):
    """x_ref [g, hw+2, hw+2, cin] (pre-padded halo), w_ref [9, cin, cout].
    y[g*hw*hw, cout] = sum over the 9 taps of shifted-x @ w[tap]."""
    g = x_ref.shape[0]
    m = g * hw * hw
    acc = None
    for dy in range(3):
        for dx in range(3):
            # [g, hw, hw, cin] shifted window, flattened to GEMM M rows
            xs = x_ref[:, dy:dy + hw, dx:dx + hw, :].reshape(m, cin)
            t = jnp.dot(xs, w_ref[dy * 3 + dx],
                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    y_ref[...] = acc.astype(y_ref.dtype)


def pallas_conv3x3(x, w, g):
    """x [B, H, W, C] bf16, w [3, 3, C, K] bf16 -> [B*H*W, K]."""
    b, h, _, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, cin, cout)
    return pl.pallas_call(
        functools.partial(_conv_kernel, hw=h, cin=cin, cout=cout),
        grid=(b // g,),
        in_specs=[pl.BlockSpec((g, h + 2, h + 2, cin),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g * h * h, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * h, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * h * 9 * cin * cout,
            bytes_accessed=2 * b * h * h * cin,
            transcendentals=0),
    )(xp, wf)


def xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# 2) stem maxpool backward: select-and-scatter vs equality-split
# ---------------------------------------------------------------------------

def maxpool_xla(x):
    """flax nn.max_pool semantics: 3x3 stride 2, pad 1 — backward lowers
    to select-and-scatter."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


@jax.custom_vjp
def maxpool_eqsplit(x):
    return maxpool_xla(x)


def _mp_fwd(x):
    y = maxpool_xla(x)
    return y, (x, y)


def _mp_bwd(res, dy):
    """Equality-split: for each of the 9 window taps, gather the input
    values under the (stride-2) window grid, compare to the window max,
    and scatter dy/ties back — 9 gathers + 9 scatters on regular strided
    index grids instead of XLA's select-and-scatter. Gradient for a tied
    window max is SPLIT across ties (sums to dy exactly) rather than
    given to the first element."""
    x, y = res
    b, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    x32 = x.astype(jnp.float32)
    y32 = y.astype(jnp.float32)

    def tap(oy, ox):
        """(row idx [oh,1], col idx [1,ow], in-bounds mask [1,oh,ow,1])."""
        rows = jnp.arange(oh) * 2 + oy - 1  # window o covers 2o-1..2o+1
        cols = jnp.arange(ow) * 2 + ox - 1
        mask = ((rows >= 0) & (rows < h))[:, None] \
            & ((cols >= 0) & (cols < w))[None, :]
        rs = jnp.clip(rows, 0, h - 1)[:, None]
        cs = jnp.clip(cols, 0, w - 1)[None, :]
        return rs, cs, mask[None, :, :, None]

    def eq_at(oy, ox):
        rs, cs, mask = tap(oy, ox)
        xg = x32[:, rs, cs, :]  # [b, oh, ow, c]
        return (xg == y32) & mask

    tie = sum(eq_at(oy, ox).astype(jnp.float32)
              for oy in range(3) for ox in range(3))
    share = dy.astype(jnp.float32) / jnp.maximum(tie, 1.0)
    dx = jnp.zeros((b, h, w, c), jnp.float32)
    for oy in range(3):
        for ox in range(3):
            rs, cs, _ = tap(oy, ox)
            contrib = jnp.where(eq_at(oy, ox), share, 0.0)
            dx = dx.at[:, rs, cs, :].add(contrib)
    return (dx.astype(x.dtype),)


maxpool_eqsplit.defvjp(_mp_fwd, _mp_bwd)


def main() -> None:
    dev = jax.devices()[0]
    out = {"device": str(dev), "batch": B}
    rng = np.random.default_rng(0)

    # --- conv shapes: resnet34 stage2/stage3 at 224px ---------------------
    for name, (hw, c) in {"stage2_28x128": (28, 128),
                          "stage3_14x256": (14, 256)}.items():
        x = jnp.asarray(rng.standard_normal((B, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, c, c)) * (9 * c) ** -0.5,
                        jnp.bfloat16)
        flops = 2 * B * hw * hw * 9 * c * c

        t_xla = timed(lambda xx: xla_conv3x3(xx, w).reshape(xx.shape), x)
        rec = {"xla_fwd_ms": round(t_xla, 3),
               "xla_fwd_tflops": round(flops / t_xla / 1e9, 1)}
        # pick the largest sample group whose halo'd map + GEMM fits VMEM
        # (g=16 at stage3 crashed the Mosaic compile helper; cap at 8)
        g = max(gg for gg in (8, 4, 2, 1) if B % gg == 0 and
                gg * (hw + 2) ** 2 * c * 2 + gg * hw * hw * c * 6 <
                10 * 2 ** 20)
        try:
            ref = np.asarray(
                xla_conv3x3(x, w).reshape(-1, c), np.float32)
            got = np.asarray(pallas_conv3x3(x, w, g), np.float32)
            err = float(np.max(np.abs(ref - got)))
            t_pl = timed(
                lambda xx: pallas_conv3x3(xx, w, g).reshape(xx.shape), x)
            rec.update({"pallas_fwd_ms": round(t_pl, 3),
                        "pallas_fwd_tflops": round(flops / t_pl / 1e9, 1),
                        "pallas_group": g, "max_abs_err": err,
                        "pallas_vs_xla": round(t_xla / t_pl, 3)})
        except Exception as e:  # noqa: BLE001 — record the failure verbatim
            rec["pallas_error"] = str(e)[:300]
        out[f"conv3x3_{name}"] = rec
        print(f"conv3x3 {name}: {json.dumps(rec)}", flush=True)

    # --- stem maxpool fwd+bwd ---------------------------------------------
    xs = jnp.asarray(rng.standard_normal((B, 112, 112, 64)), jnp.bfloat16)
    # ReLU'd input: realistic tie density (zeros everywhere)
    xs = jnp.maximum(xs, 0)

    def loss_sas(x):
        return jnp.sum(maxpool_xla(x).astype(jnp.float32) ** 2)

    def loss_eq(x):
        return jnp.sum(maxpool_eqsplit(x).astype(jnp.float32) ** 2)

    g_sas = timed(lambda xx: jax.grad(loss_sas)(xx), xs)
    g_eq = timed(lambda xx: jax.grad(loss_eq)(xx), xs)
    # gradient totals must agree (split vs first-element: same sum)
    tot_sas = float(jnp.sum(jax.grad(loss_sas)(xs).astype(jnp.float32)))
    tot_eq = float(jnp.sum(jax.grad(loss_eq)(xs).astype(jnp.float32)))
    out["stem_maxpool"] = {
        "select_and_scatter_grad_ms": round(g_sas, 3),
        "eqsplit_grad_ms": round(g_eq, 3),
        "speedup": round(g_sas / g_eq, 3),
        "grad_sum_sas": round(tot_sas, 2), "grad_sum_eq": round(tot_eq, 2),
    }
    print(f"stem_maxpool: {json.dumps(out['stem_maxpool'])}", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "conv_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
