"""Analytic 2*MAC FLOP counting from traced jaxprs.

XLA's cost analysis moved twice under us (jax<0.9: unoptimized-HLO counts
with generous conv-backward accounting, ~2x the textbook convention;
jax>=0.9: lowered analysis returns None and the COMPILED module's count
bakes in platform rewrites — measured ~2x textbook even for pure-matmul
ViT). MFU quoted against either convention overstates. This module counts
the textbook way instead: walk the jaxpr and sum 2*MACs over exactly the
``dot_general`` and ``conv_general_dilated`` equations — shape-determined,
platform-independent, trace-only (no compile), stable across jax versions.

Intended use (benchmarks/run_benchmarks.py, benchmarks/patch_mfu.py):
forward FLOPs = ``analytic_flops(fn, *args)`` on the eval/forward fn;
training FLOPs ~ 3x forward (the standard fwd + 2x bwd / "6ND" convention).
Trace under VLP_DISABLE_PALLAS=1 so kernels lower to countable XLA ops —
model FLOPs are path-independent.
"""
from __future__ import annotations

import math
import os
from typing import Any

import jax
from jax._src import core as jax_core


def _dot_general_macs(eqn) -> float:
    """MACs of one dot_general: prod(batch) * M * N * K."""
    lhs, rhs = (v.aval.shape for v in eqn.invars[:2])
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = math.prod(lhs[d] for d in lc)
    b = math.prod(lhs[d] for d in lb)
    m = math.prod(s for d, s in enumerate(lhs) if d not in set(lc) | set(lb))
    n = math.prod(s for d, s in enumerate(rhs) if d not in set(rc) | set(rb))
    return b * m * n * k


def _conv_macs(eqn) -> float:
    """MACs of one conv_general_dilated: prod(out) * C_in_per_group *
    prod(kernel_spatial). The kernel's in-channel dim is ALREADY
    per-group (HWIO depthwise kernels carry I=1), so no division by
    feature_group_count."""
    out = math.prod(eqn.outvars[0].aval.shape)
    rhs = eqn.invars[1].aval.shape
    dnums = eqn.params["dimension_numbers"]
    c_in = rhs[dnums.rhs_spec[1]]  # rhs_spec = (out_C, in_C, *spatial)
    k_spatial = math.prod(rhs[d] for d in dnums.rhs_spec[2:])
    return out * c_in * k_spatial


def _jaxpr_macs(jaxpr) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_macs(eqn)
        elif name == "conv_general_dilated":
            total += _conv_macs(eqn)
        elif name == "scan":
            total += eqn.params["length"] * _jaxpr_macs(
                eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            # trip count is data-dependent; count one body iteration (the
            # forward paths counted here do not use while loops)
            total += _jaxpr_macs(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max((_jaxpr_macs(b.jaxpr)
                          for b in eqn.params["branches"]), default=0.0)
        else:
            # pjit / remat / custom_vjp / closed_call / shard_map etc.
            for v in eqn.params.values():
                total += _param_macs(v)
    return total


def _param_macs(v: Any) -> float:
    if isinstance(v, jax_core.ClosedJaxpr):
        return _jaxpr_macs(v.jaxpr)
    if isinstance(v, jax_core.Jaxpr):
        return _jaxpr_macs(v)
    if isinstance(v, (tuple, list)):
        return sum(_param_macs(x) for x in v)
    return 0.0


def analytic_flops(fn, *args, disable_pallas: bool = True) -> float:
    """Textbook 2*MAC FLOPs of one ``fn(*args)`` call (dots + convs only;
    elementwise/reduction work excluded by convention). Trace-only."""
    prior = os.environ.get("VLP_DISABLE_PALLAS")
    try:
        if disable_pallas:
            os.environ["VLP_DISABLE_PALLAS"] = "1"
        closed = jax.make_jaxpr(fn)(*args)
        return 2.0 * _jaxpr_macs(closed.jaxpr)
    finally:
        if disable_pallas:
            if prior is None:
                os.environ.pop("VLP_DISABLE_PALLAS", None)
            else:
                os.environ["VLP_DISABLE_PALLAS"] = prior
