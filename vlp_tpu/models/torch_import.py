"""PyTorch checkpoint import: torchvision/torchxrayvision ResNets -> Flax.

The reference's strongest model is the torchxrayvision ResNet50
("resnet50-res512-all": torchvision resnet50 with a 1-channel conv1, trained
on 512x512 chest x-rays scaled to -1024..1024; reference
OnlyImagingModule.py:55-69). This module converts such torch state_dicts
into our ResNet param/batch_stats trees. Weight files must be locally
available (zero-egress); when absent, callers fall back to random init with
a loud log (reference quality for the xrv rows then won't be met — that is
an environment limitation, not a code path gap).

Name mapping (torchvision -> ours):
  conv1/bn1                      -> stem_conv / stem_bn
  layer{L}.{B}.conv{K}/bn{K}     -> stage{L-1}_block{B}.conv{K}/bn{K}
  layer{L}.{B}.downsample.0/1    -> stage{L-1}_block{B}.ds_conv/ds_bn
  fc                             -> head (when num_classes matches)
Tensor layout: conv OIHW -> HWIO; linear [out,in] -> [in,out].
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional, Tuple

import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def convert_torchvision_resnet(
    state_dict: Dict[str, np.ndarray],
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    prefix: str = "",
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Returns (new_params, new_batch_stats) with converted weights grafted
    into copies of the given trees. Raises KeyError/ValueError on missing or
    shape-mismatched tensors (strict import — partial loads are the caller's
    job via utils.checkpoint.graft_backbone)."""
    sd = {k.removeprefix(prefix): np.asarray(v) for k, v in state_dict.items()}
    p = copy.deepcopy(params)
    bs = copy.deepcopy(batch_stats)

    def put_conv(dst: Dict, key: str):
        w = _conv_w(sd[key])
        if dst["kernel"].shape != w.shape:
            raise ValueError(
                f"{key}: shape {w.shape} != {dst['kernel'].shape}")
        dst["kernel"] = w

    def put_bn(pdst: Dict, bdst: Dict, key: str):
        pdst["scale"] = sd[f"{key}.weight"]
        pdst["bias"] = sd[f"{key}.bias"]
        bdst["mean"] = sd[f"{key}.running_mean"]
        bdst["var"] = sd[f"{key}.running_var"]

    put_conv(p["stem_conv"], "conv1.weight")
    put_bn(p["stem_bn"], bs["stem_bn"], "bn1")

    for name in list(p.keys()):
        if not name.startswith("stage"):
            continue
        stage = int(name[5])
        block = int(name.split("block")[1])
        tsrc = f"layer{stage + 1}.{block}"
        blk_p, blk_b = p[name], bs[name]
        k = 1
        while f"conv{k}" in blk_p:
            put_conv(blk_p[f"conv{k}"], f"{tsrc}.conv{k}.weight")
            put_bn(blk_p[f"bn{k}"], blk_b[f"bn{k}"], f"{tsrc}.bn{k}")
            k += 1
        if "ds_conv" in blk_p:
            put_conv(blk_p["ds_conv"], f"{tsrc}.downsample.0.weight")
            put_bn(blk_p["ds_bn"], blk_b["ds_bn"], f"{tsrc}.downsample.1")

    if "head" in p and "fc.weight" in sd:
        w = sd["fc.weight"].T
        if p["head"]["kernel"].shape == w.shape:
            p["head"]["kernel"] = w
            p["head"]["bias"] = sd["fc.bias"]
        else:
            logger.info("fc head shape %s != %s; keeping fresh head "
                        "(strict=False transfer semantics)",
                        w.shape, p["head"]["kernel"].shape)
    return p, bs


def load_torchxrayvision_resnet50(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weights_path: Optional[str] = None,
) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Load the xrv 'resnet50-res512-all' weights from a local file (torch
    .pt/.pth) or the torchxrayvision package cache. Returns None when
    unavailable."""
    try:
        import torch

        if weights_path:
            sd = torch.load(weights_path, map_location="cpu",
                            weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
        else:
            import torchxrayvision as xrv  # noqa: optional dep

            model = xrv.models.ResNet(weights="resnet50-res512-all")
            sd = model.state_dict()
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
        # xrv wraps torchvision resnet under 'model.'
        prefix = "model." if any(k.startswith("model.") for k in sd) else ""
        return convert_torchvision_resnet(sd, params, batch_stats, prefix)
    except Exception as e:
        logger.warning(
            "torchxrayvision resnet50 weights unavailable (%s: %s); the xrv "
            "path runs from random init.", type(e).__name__, e)
        return None
