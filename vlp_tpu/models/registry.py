"""Backbone registry — the reference's model allowlist
(OnlyImagingModule.py:25-32): resnet34 | resnet50 | resnet18 |
vit_base_patch16_224 | vit_large_patch16_224 | nest_small |
resnet50-res512-all (torchxrayvision ResNet50, 1-channel input).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from vlp_tpu.models import nest, resnet, vit

BACKBONE_FEATURE_DIMS = {
    **resnet.FEATURE_DIMS,
    **vit.FEATURE_DIMS,
    **nest.FEATURE_DIMS,
    "resnet50-res512-all": 2048,  # torchxrayvision ResNet50
}


def create_backbone(name: str, num_classes: int = 0,
                    dtype: jnp.dtype = jnp.bfloat16,
                    axis_name: Optional[str] = None,
                    dropout_rate: float = 0.0,
                    norm_dtype: jnp.dtype = jnp.float32,
                    stem: str = "conv7",
                    fused_attention: Optional[bool] = None,
                    megakernel: bool = True,
                    remat: bool = False):
    """Returns (module, feature_dim). ``num_classes=0`` => features only.

    ``fused_attention``: Pallas fused block-attention for ViT/NesT
    (ops/block_attention.py). None = the model's default. Changes the attn
    param-tree structure (FusedSelfAttention docstring)."""
    if name not in BACKBONE_FEATURE_DIMS:
        raise ValueError(
            f"Unknown backbone {name!r}; allowed: {sorted(BACKBONE_FEATURE_DIMS)}"
        )
    kw = dict(num_classes=num_classes, dtype=dtype, axis_name=axis_name)
    if name.startswith("resnet"):
        kw["norm_dtype"] = norm_dtype
        kw["stem"] = stem
    else:
        kw["megakernel"] = megakernel
        kw["remat"] = remat
        if fused_attention is not None:
            kw["fused_attention"] = fused_attention
    if name == "resnet18":
        m = resnet.resnet18(**kw)
    elif name == "resnet_micro":
        m = resnet.resnet_micro(**kw)
    elif name == "resnet34":
        m = resnet.resnet34(**kw)
    elif name in ("resnet50", "resnet50-res512-all"):
        m = resnet.resnet50(**kw)
    elif name == "vit_base_patch16_224":
        m = vit.vit_base_patch16_224(**kw)
    elif name == "vit_large_patch16_224":
        m = vit.vit_large_patch16_224(**kw)
    elif name == "nest_small":
        m = nest.nest_small(**kw)
    else:  # pragma: no cover
        raise AssertionError(name)
    return m, BACKBONE_FEATURE_DIMS[name]
