"""NesT (Nested Hierarchical Transformer, Zhang et al. 2021) in Flax Linen.

Covers the reference's nest_small backbone (timm ``nest_small``: patch 4,
3 levels, dims (96,192,384), heads (3,6,12), depths (2,2,20) — reference
OnlyImagingModule.py:25-32). The structure: 4x4 conv patch embed, then per
level the token map is partitioned into non-overlapping 14x14 blocks;
transformer layers run WITHIN each block (local attention); levels are
joined by a ConvPool aggregation (3x3 conv + LayerNorm + 3x3/2 max pool)
that halves the spatial size and doubles the width. Head: LayerNorm + global
average pool.

TPU mapping: blocks fold into the batch dimension, so attention is one big
batched [B*num_blocks, 196, D] chain with static shapes; no gather/scatter.
By default it runs through the Pallas fused block kernels
(ops/block_attention.py packed-qkv attention + ops/fused_mlp.py), measured
+20% train throughput over the plain-XLA path (which remains available via
fused_attention=False; see docs/DESIGN.md §4b for the analysis and the
head_dim-32 padding ceiling).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vlp_tpu.models.vit import EncoderBlock


def blockify(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, nb, block*block, C] with nb = (H/b)*(W/b)."""
    b, h, w, c = x.shape
    gh, gw = h // block, w // block
    x = x.reshape(b, gh, block, gw, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, block * block, c)


def unblockify(x: jnp.ndarray, block: int, h: int, w: int) -> jnp.ndarray:
    """Inverse of blockify."""
    b, nb, t, c = x.shape
    gh, gw = h // block, w // block
    x = x.reshape(b, gh, gw, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class ConvPool(nn.Module):
    """Level aggregation: 3x3 conv -> LayerNorm -> 3x3/2 max pool."""

    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return nn.max_pool(x.astype(self.dtype), (3, 3), (2, 2),
                           padding=((1, 1), (1, 1)))


class NesT(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    embed_dims: Sequence[int] = (96, 192, 384)
    num_heads: Sequence[int] = (3, 6, 12)
    depths: Sequence[int] = (2, 2, 20)
    block_size: int = 14
    num_classes: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None  # unused; API parity with ResNet
    fused_attention: bool = True  # Pallas fused attention (block_attention.py)
    megakernel: bool = True  # half-block megakernels (fused_block.py)
    # Blockify-free NHWC windowed attention (fused_block.ln_attention_windows):
    # measured SLOWER on v5e (797 vs 878 img/s nest_small train — the
    # in-kernel strided window slices/reshapes cost more than the
    # blockify/unblockify transposes they remove), so OFF by default;
    # kept as a tested variant for future Mosaic layout improvements.
    nhwc_windows: bool = False
    # Per-block jax.checkpoint (see vit.ViT.remat): off by default —
    # NesT-S easily fits; the knob exists for larger variants/batches.
    remat: bool = False

    def setup(self):
        self.patch_embed = nn.Conv(
            self.embed_dims[0], (self.patch_size, self.patch_size),
            (self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed")
        grid = self.img_size // self.patch_size  # 56
        levels = []
        pos_embeds = []
        pools = []
        size = grid
        for li, (dim, heads, depth) in enumerate(
                zip(self.embed_dims, self.num_heads, self.depths)):
            nb = (size // self.block_size) ** 2
            pos_embeds.append(self.param(
                f"pos_embed_{li}", nn.initializers.normal(0.02),
                (1, nb, self.block_size**2, dim), jnp.float32))
            block_cls = nn.remat(EncoderBlock, prevent_cse=False) \
                if self.remat else EncoderBlock
            levels.append([
                block_cls(heads, 4.0, self.dtype,
                          fused_attention=self.fused_attention,
                          megakernel=self.megakernel,
                          window=self.block_size,
                          name=f"l{li}_block{d}")
                for d in range(depth)])
            if li < len(self.embed_dims) - 1:
                pools.append(ConvPool(self.embed_dims[li + 1], self.dtype,
                                      name=f"pool{li}"))
            size //= 2
        self.levels = levels
        self.pos_embeds = pos_embeds
        self.pools = pools
        self.final_norm = nn.LayerNorm(dtype=jnp.float32, name="final_norm")
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="head")

    def __call__(self, x, train: bool = False):
        feats = self.forward_features(x, train)
        return self.forward_head(feats, train)

    def _level_uses_nhwc(self, x, li: int) -> bool:
        """Blockify-free windowed megakernel path for this level's shapes:
        attention runs straight on the NHWC map (ops/fused_block.py
        ln_attention_windows) — no blockify/unblockify transposes."""
        from vlp_tpu.ops import fused_block as FB
        from vlp_tpu.ops.kernel_gate import active_kernel_mesh, mosaic_ok

        if not (self.fused_attention and self.megakernel
                and self.nhwc_windows):
            return False
        if not (mosaic_ok() or FB._use_interpret()):
            return False
        b, h, w, d = x.shape
        mesh, _ = active_kernel_mesh()
        shards = mesh.size if mesh is not None else 1
        itemsize = jnp.dtype(self.dtype).itemsize
        # index by LEVEL, not by dim value: embed_dims may repeat (e.g.
        # (192, 192, 384)), where .index(d) would return the wrong level's
        # head count
        heads = self.num_heads[li] if d == self.embed_dims[li] else 0
        return b % shards == 0 and heads > 0 and FB.supports_window(
            b // shards, h, w, d, heads, self.block_size, itemsize)

    def forward_features(self, x, train: bool = False):
        x = self.patch_embed(x.astype(self.dtype))  # [B, 56, 56, 96]
        size = x.shape[1]
        for li, blocks in enumerate(self.levels):
            if self._level_uses_nhwc(x, li):
                # pos embed is STORED blockified ([1, nb, S, D] — the
                # checkpoint layout); unblockify once per step (tiny)
                pe = unblockify(self.pos_embeds[li].astype(self.dtype),
                                self.block_size, size, size)
                x = x + pe
                for blk in blocks:
                    x = blk(x)  # 4-D NHWC windowed megakernels
            else:
                t = blockify(x, self.block_size)  # [B, nb, 196, D]
                t = t + self.pos_embeds[li].astype(self.dtype)
                bsz, nb, seq, dim = t.shape
                t = t.reshape(bsz * nb, seq, dim)  # fold blocks into batch
                for blk in blocks:
                    t = blk(t)
                t = t.reshape(bsz, nb, seq, dim)
                x = unblockify(t, self.block_size, size, size)
            if li < len(self.pools):
                x = self.pools[li](x)
                size //= 2
        x = self.final_norm(x.astype(jnp.float32))
        return jnp.mean(x, axis=(1, 2))  # global average pool

    def forward_head(self, feats, train: bool = False):
        if self.num_classes > 0:
            return self.head(feats)
        return feats


def nest_small(**kw) -> NesT:
    return NesT(embed_dims=(96, 192, 384), num_heads=(3, 6, 12),
                depths=(2, 2, 20), **kw)


FEATURE_DIMS = {"nest_small": 384}
