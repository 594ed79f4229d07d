"""ResNet-18/34/50 in Flax Linen (NHWC, bf16 compute, fp32 params/BN).

TPU-native re-implementation of the timm ResNets the reference instantiates
(reference OnlyImagingModule.py:71-73 uses timm resnet34/resnet50 with
num_classes=1; VisionLanguageModule.py:27-35 uses num_classes=0 + avg pool).
Also covers the torchxrayvision-style ResNet50 (1-channel input, reference
OnlyImagingModule.py:55-69) via ``in_channels=1`` inputs.

Design notes:
- NHWC layout + channel-last convs (XLA's native TPU layout).
- Compute dtype is a parameter (bf16 by default on TPU); params and batch
  norm statistics stay fp32.
- BatchNorm takes an optional ``axis_name`` so running statistics sync
  across the data-parallel mesh (the reference is single-device; under pjit
  this keeps semantics equal to one big batch).
- setup()-style so ``forward_features`` / ``forward_head`` are separately
  applicable, mirroring the timm split the reference relies on
  (OnlyImagingModule.py:243-249).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


def _bn(axis_name: Optional[str], name: str,
        dtype: jnp.dtype = jnp.float32) -> nn.BatchNorm:
    # dtype=bf16 skips the fp32 cast round trip at every block (a measured
    # throughput lever); statistics/params stay fp32 via param_dtype.
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32, axis_name=axis_name,
                        name=name)


def _conv(filters: int, kernel: int, strides: int, dtype, name: str) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(filters, (kernel, kernel), (strides, strides),
                   padding=((pad, pad), (pad, pad)), use_bias=False,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.conv1 = _conv(self.filters, 3, self.strides, self.dtype, "conv1")
        self.bn1 = _bn(self.axis_name, "bn1", self.norm_dtype)
        self.conv2 = _conv(self.filters, 3, 1, self.dtype, "conv2")
        self.bn2 = _bn(self.axis_name, "bn2", self.norm_dtype)
        if self.downsample:
            self.ds_conv = _conv(self.filters, 1, self.strides, self.dtype, "ds_conv")
            self.ds_bn = _bn(self.axis_name, "ds_bn", self.norm_dtype)

    def __call__(self, x, train: bool):
        use_ra = not train
        residual = x
        y = self.conv1(x)
        y = self.bn1(y.astype(self.norm_dtype), use_running_average=use_ra)
        y = nn.relu(y.astype(self.dtype))
        y = self.conv2(y)
        y = self.bn2(y.astype(self.norm_dtype), use_running_average=use_ra)
        if self.downsample:
            residual = self.ds_conv(residual)
            residual = self.ds_bn(residual.astype(self.norm_dtype),
                                  use_running_average=use_ra)
        return nn.relu((y + residual).astype(self.dtype))


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None

    def setup(self):
        self.conv1 = _conv(self.filters, 1, 1, self.dtype, "conv1")
        self.bn1 = _bn(self.axis_name, "bn1", self.norm_dtype)
        self.conv2 = _conv(self.filters, 3, self.strides, self.dtype, "conv2")
        self.bn2 = _bn(self.axis_name, "bn2", self.norm_dtype)
        self.conv3 = _conv(self.filters * self.expansion, 1, 1, self.dtype, "conv3")
        self.bn3 = _bn(self.axis_name, "bn3", self.norm_dtype)
        if self.downsample:
            self.ds_conv = _conv(self.filters * self.expansion, 1,
                                 self.strides, self.dtype, "ds_conv")
            self.ds_bn = _bn(self.axis_name, "ds_bn", self.norm_dtype)

    def __call__(self, x, train: bool):
        use_ra = not train
        residual = x
        y = self.conv1(x)
        y = nn.relu(self.bn1(y.astype(jnp.float32),
                             use_running_average=use_ra).astype(self.dtype))
        y = self.conv2(y)
        y = nn.relu(self.bn2(y.astype(jnp.float32),
                             use_running_average=use_ra).astype(self.dtype))
        y = self.conv3(y)
        y = self.bn3(y.astype(self.norm_dtype), use_running_average=use_ra)
        if self.downsample:
            residual = self.ds_conv(residual)
            residual = self.ds_bn(residual.astype(self.norm_dtype),
                                  use_running_average=use_ra)
        return nn.relu((y + residual).astype(self.dtype))


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block_cls: ModuleDef
    num_classes: int = 0  # 0 => features only (timm convention)
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    dropout_rate: float = 0.0
    # "conv7": torchvision-compatible 7x7/2 stem (weight-importable).
    # "s2d": space-to-depth stem (2x2 blocks -> 4x4/1 conv) — the MLPerf TPU
    # trick replacing the MXU-hostile 3-channel conv; from-scratch only.
    stem: str = "conv7"

    def setup(self):
        if self.stem == "s2d":
            self.stem_conv = nn.Conv(64, (4, 4), (1, 1),
                                     padding=((2, 1), (2, 1)), use_bias=False,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name="stem_conv_s2d")
        else:
            self.stem_conv = _conv(64, 7, 2, self.dtype, "stem_conv")
        self.stem_bn = _bn(self.axis_name, "stem_bn", self.norm_dtype)
        expansion = getattr(self.block_cls, "expansion", None)
        blocks = []
        in_dim = 64
        for i, size in enumerate(self.stage_sizes):
            filters = 64 * 2**i
            out_dim = filters * (4 if self.block_cls is Bottleneck else 1)
            for j in range(size):
                strides = 2 if i > 0 and j == 0 else 1
                blocks.append(self.block_cls(
                    filters=filters, strides=strides,
                    downsample=(strides != 1 or in_dim != out_dim),
                    dtype=self.dtype, norm_dtype=self.norm_dtype,
                    axis_name=self.axis_name,
                    name=f"stage{i}_block{j}"))
                in_dim = out_dim
        self.blocks = blocks
        if self.dropout_rate > 0:
            self.dropout = nn.Dropout(self.dropout_rate)
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="head")

    def __call__(self, x, train: bool = False):
        feats = self.forward_features(x, train)
        return self.forward_head(feats, train)

    def forward_features(self, x, train: bool = False):
        """Stem + stages + global average pool -> [B, D] float32."""
        use_ra = not train
        x = x.astype(self.dtype)
        if self.stem == "s2d":
            b, h, w, c = x.shape
            x = x.reshape(b, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = self.stem_conv(x)
        x = self.stem_bn(x.astype(self.norm_dtype), use_running_average=use_ra)
        x = nn.relu(x.astype(self.dtype))
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for block in self.blocks:
            x = block(x, train=train)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    def forward_head(self, feats, train: bool = False):
        if self.dropout_rate > 0:
            feats = self.dropout(feats, deterministic=not train)
        if self.num_classes > 0:
            feats = self.head(feats)
        return feats


def resnet18(**kw) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block_cls=BasicBlock, **kw)


def resnet34(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=BasicBlock, **kw)


def resnet50(**kw) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), block_cls=Bottleneck, **kw)


def resnet_micro(**kw) -> ResNet:
    """Two-stage, one-block-per-stage micro ResNet. Not in the reference
    allowlist — exists so sharding dryruns and CPU-mesh tests compile in
    seconds while exercising the identical stem/block/BN/pool code paths."""
    return ResNet(stage_sizes=(1, 1), block_cls=BasicBlock, **kw)


FEATURE_DIMS = {"resnet18": 512, "resnet34": 512, "resnet50": 2048,
                "resnet_micro": 128}
