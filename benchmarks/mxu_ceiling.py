#!/usr/bin/env python
"""Close the NesT 'architectural limit' claim with a MEASUREMENT.

DESIGN.md §7b argues the megakernel step's gap to roofline is the Dh=32
MXU lane padding (irreducible on a dense MXU after three measured negative
variants). VERDICT r3 #5: prove it with numbers — capture an xprof trace of
the nest_small megakernel train step, take each kernel's measured self-time
from hlo_stats, and compare its USEFUL-MAC throughput against the
PADDING-IMPLIED ceiling computed from the kernels' exact matmul inventory
(every dot in ops/fused_block.py, fwd + recompute-backward, padded to the
MXU tile grid: M->16 sublanes bf16, K/N->128 lanes).

  mxu_busy_pct    = useful_MACs / (self_time * peak_MACs_per_s)
  padding_ceiling = useful_MACs / padded_MACs
  ratio ~ 1.0     => the kernel runs at its padding-implied MXU bound and
                     the remaining gap is architectural, as claimed.

Writes benchmarks/mxu_ceiling.json. Run ON THE TPU (one process only).
"""
from __future__ import annotations

import glob
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _pad(v: int, to: int) -> int:
    return math.ceil(v / to) * to


def _macs(mms, padded: bool):
    """Sum MACs over an (M, K, N, count) inventory; padded applies the MXU
    tile model (bf16 operands: M->16 sublanes, K/N->128 lanes)."""
    total = 0
    for m, k, n, c in mms:
        if padded:
            m, k, n = _pad(m, 16), _pad(k, 128), _pad(n, 128)
        total += m * k * n * c
    return total


def attn_inventory(s: int, d: int, h: int, fwd: bool):
    """Matmul inventory of _lnattn_{fwd,bwd}_kernel per SAMPLE (one [S, D]
    row block), default non-transposed path (ops/fused_block.py:75-307)."""
    dh = d // h
    if fwd:
        return [
            (s, d, 3 * d, 1),   # qkv projection
            (s, dh, s, h),      # QK^T per head
            (s, s, dh, h),      # PV per head
            (s, d, d, 1),       # out projection
        ]
    return [
        (s, d, 3 * d, 1),       # qkv recompute
        (s, dh, s, h),          # QK^T recompute (o pass)
        (s, s, dh, h),          # PV recompute (o pass)
        (d, s, d, 1),           # dWout = o^T dy
        (s, d, d, 1),           # do = dy Wout^T
        (s, dh, s, h),          # QK^T recompute (dqkv pass)
        (s, s, dh, h),          # dV = P^T dOv
        (s, dh, s, h),          # dP = dOh V^T
        (s, s, dh, h),          # dQ = dS K
        (s, s, dh, h),          # dK = dS^T Q
        (d, s, 3 * d, 1),       # dWqkv = ln^T dqkv
        (s, 3 * d, d, 1),       # dln = dqkv Wqkv^T
    ]


def mlp_inventory(rows: int, d: int, f: int, fwd: bool):
    """Matmul inventory of _lnmlp_{fwd,bwd}_kernel over ``rows`` flattened
    [*, D] rows (ops/fused_block.py:432-482)."""
    if fwd:
        return [(rows, d, f, 1), (rows, f, d, 1)]
    return [
        (rows, d, f, 1),        # fc1 recompute
        (f, rows, d, 1),        # dW2 = h^T dy
        (rows, d, f, 1),        # dh = dy W2^T
        (d, rows, f, 1),        # dW1 = ln^T dh
        (rows, f, d, 1),        # dln = dh W1^T
    ]


def analytic(batch: int, img: int = 224, patch: int = 4, block: int = 14,
             dims=(96, 192, 384), heads=(3, 6, 12), depths=(2, 2, 20),
             mlp_ratio: int = 4):
    """Per-train-step useful/padded MAC totals for the 4 kernel families."""
    s = block * block
    out = {k: {"useful": 0, "padded": 0} for k in
           ("lnattn_fwd", "lnattn_bwd", "lnmlp_fwd", "lnmlp_bwd")}
    grid = img // patch
    for li, (d, h, depth) in enumerate(zip(dims, heads, depths)):
        size = grid // (2 ** li)
        nb = (size // block) ** 2
        n = batch * nb          # sample rows per kernel call
        rows = n * s            # flattened MLP rows
        for fwd, key in ((True, "lnattn_fwd"), (False, "lnattn_bwd")):
            inv = attn_inventory(s, d, h, fwd)
            out[key]["useful"] += depth * n * _macs(inv, False)
            out[key]["padded"] += depth * n * _macs(inv, True)
        for fwd, key in ((True, "lnmlp_fwd"), (False, "lnmlp_bwd")):
            inv = mlp_inventory(rows, d, mlp_ratio * d, fwd)
            out[key]["useful"] += depth * _macs(inv, False)
            out[key]["padded"] += depth * _macs(inv, True)
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    B = int(os.environ.get("BENCH_BATCH", "128"))
    K = int(os.environ.get("BENCH_STEPS", "5"))
    peak_tflops = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
    peak_macs = peak_tflops * 1e12 / 2.0

    from vlp_tpu.models.nest import NesT

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.standard_normal((K, B, 224, 224, 3)), jnp.bfloat16)
    model = NesT()  # megakernel default path
    params = model.init(jax.random.key(0), xs[0, :2])

    def loss_fn(p, x):
        return jnp.mean(model.apply(p, x).astype(jnp.float32))

    @jax.jit
    def steps(p, xs):
        def body(p, x):
            l, g = jax.value_and_grad(loss_fn)(p, x)
            p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
            return p, l
        return jax.lax.scan(body, p, xs)

    p2, ls = steps(params, xs)
    float(jax.device_get(ls[-1]))  # compile + warm
    t0 = time.perf_counter()
    p2, ls = steps(params, xs)
    float(jax.device_get(ls[-1]))
    step_s = (time.perf_counter() - t0) / K
    print(f"nest_small megakernel step: {step_s*1e3:.2f} ms "
          f"({B/step_s:.0f} img/s)", flush=True)

    trace_dir = os.environ.get("PROF_TRACE_DIR", "/tmp/mxu_trace")
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        p2, ls = steps(params, xs)
        float(jax.device_get(ls[-1]))
    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert xplanes, "no xplane captured"
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(xplanes, "hlo_stats", {})
    tbl = json.loads(data if isinstance(data, str) else data.decode())

    # hlo_stats is a Google DataTable ({cols: [...], rows: [{c: [{v}]}]});
    # our megakernels appear as tpu_custom_call ops named by the enclosing
    # Flax scope (l<level>_block<i>.<n>). Classify each call by its HLO
    # type signature instead of the name:
    #   fwd  = single (non-tuple) result; bwd = tuple (weight grads)
    #   attn = leading result is the rank-3 [N, S, D] sample-block tensor
    #   mlp  = leading result is the rank-2 [rows, D] flattened tensor
    cols = [c["id"] for c in tbl["cols"]]
    kernel_us = {"lnattn_fwd": 0.0, "lnattn_bwd": 0.0,
                 "lnmlp_fwd": 0.0, "lnmlp_bwd": 0.0}
    other_us = 0.0
    import re

    def classify(rec) -> str | None:
        if rec.get("category") != "custom-call":
            return None
        expr = str(rec.get("hlo_op_expression", ""))
        if 'custom_call_target="tpu_custom_call"' not in expr:
            return None
        if not re.match(r"l\d+_block\d+", str(rec.get("hlo_op_name", ""))):
            return None
        rhs = expr.split("=", 1)[1].lstrip()
        bwd = rhs.startswith("(")
        m = re.search(r"bf16\[([0-9,]+)\]", rhs)
        if not m:
            return None
        rank = m.group(1).count(",") + 1
        kind = "lnattn" if rank == 3 else "lnmlp"
        return f"{kind}_{'bwd' if bwd else 'fwd'}"

    for row in tbl["rows"]:
        rec = dict(zip(cols, [c.get("v") if isinstance(c, dict) else c
                              for c in row["c"]]))
        try:
            t = float(rec.get("total_self_time", 0))  # us
        except (TypeError, ValueError):
            continue
        key = classify(rec)
        if key:
            kernel_us[key] += t
        else:
            other_us += t

    n_steps_traced = K  # the traced scan runs K steps
    result = {"batch": B, "steps_traced": n_steps_traced,
              "step_ms": round(step_s * 1e3, 2),
              "peak_tflops_bf16": peak_tflops, "kernels": {}}
    inv = analytic(B)
    total_us = sum(kernel_us.values()) + other_us
    for key, us in kernel_us.items():
        per_step_s = us / 1e6 / n_steps_traced
        useful, padded = inv[key]["useful"], inv[key]["padded"]
        busy = useful / (per_step_s * peak_macs) if per_step_s else 0.0
        ceiling = useful / padded
        result["kernels"][key] = {
            "self_time_ms_per_step": round(per_step_s * 1e3, 3),
            "useful_tmacs_per_step": round(useful / 1e12, 4),
            "padded_tmacs_per_step": round(padded / 1e12, 4),
            "mxu_busy_pct": round(100 * busy, 1),
            "padding_ceiling_pct": round(100 * ceiling, 1),
            "pct_of_ceiling": round(100 * busy / ceiling, 1)
            if ceiling else 0.0,
        }
        print(f"{key}: {per_step_s*1e3:.2f} ms/step, useful "
              f"{useful/1e12:.3f} TMAC -> MXU-busy {100*busy:.1f}% vs "
              f"padding ceiling {100*ceiling:.1f}% "
              f"({100*busy/ceiling if ceiling else 0:.0f}% of ceiling)",
              flush=True)
    result["kernel_time_share_pct"] = round(
        100 * sum(kernel_us.values()) / total_us, 1) if total_us else None
    print(f"kernel share of device time: "
          f"{result['kernel_time_share_pct']}%", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mxu_ceiling.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
