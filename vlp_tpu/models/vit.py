"""Vision Transformer (ViT-B/16, ViT-L/16) in Flax Linen.

Covers the reference's vit_base_patch16_224 / vit_large_patch16_224 backbone
options (reference OnlyImagingModule.py:25-32 allowlist). Pre-LN ViT with a
class token; ``num_classes=0`` returns the CLS embedding (timm convention).

TPU notes: attention and MLP matmuls run in bf16 with fp32 accumulation
(``preferred_element_type`` via dot_general defaults when dtype=bf16 +
fp32 params); sequence length 197 pads fine onto MXU tiles.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class _DenseParams(nn.Module):
    """Materializes a Dense layer's params under the SAME tree path as
    nn.Dense (kernel [in, out], bias [out]) without running the matmul —
    lets the fused Pallas MLP share checkpoints with the unfused path."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class MlpBlock(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    # Pallas fused fc1->GELU->fc2 (ops/fused_mlp.py): hidden stays in VMEM,
    # backward recomputes it. Param tree is identical to the unfused path,
    # so this is independent of the attention choice and on by default
    # (falls back per shape via supports()).
    fused: bool = True

    @nn.compact
    def __call__(self, x):
        from vlp_tpu.ops import fused_mlp as FM

        d = x.shape[-1]
        lead = x.shape[:-1]
        m = math.prod(lead)
        from vlp_tpu.ops.kernel_gate import active_kernel_mesh, mosaic_ok

        # under a multi-device mesh the kernel runs per shard_map shard:
        # supports() must see the LOCAL row count, and rows must divide
        mesh, _ = active_kernel_mesh()
        shards = mesh.size if mesh is not None else 1
        itemsize = jnp.dtype(self.dtype).itemsize
        if self.fused and m % shards == 0 and \
                FM.supports(m // shards, d, self.hidden_dim, itemsize) and (
                mosaic_ok() or FM._use_interpret()):
            w1, b1 = _DenseParams(d, self.hidden_dim, name="fc1")()
            w2, b2 = _DenseParams(self.hidden_dim, d, name="fc2")()
            out = FM.fused_mlp(x.reshape(m, d).astype(self.dtype),
                               w1, b1, w2, b2)
            return out.reshape(*lead, d)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class FusedSelfAttention(nn.Module):
    """Self-attention built for the Pallas fused kernel: ONE fused QKV
    projection to [N, S, 3D] and heads kept packed in the minor dim end to
    end — no [N, S, H, Dh] relayout copies (measured ~0.3 ms per reshape on
    [2048,196,96] under the flax MHA layout). Same math as
    nn.MultiHeadDotProductAttention without mask/bias/dropout.

    NOTE: parameter structure differs from flax MHA (attn/{qkv,out} vs
    attn/{query,key,value,out}); fused and unfused checkpoints are not
    interchangeable."""

    num_heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from vlp_tpu.ops.block_attention import attend_qkv

        d = x.shape[-1]
        # the packed [N, S, 3D] projection goes STRAIGHT into the kernel —
        # an XLA-level split would cost lane-relayout copies when D is not
        # a multiple of 128 (NesT level 0: D=96)
        qkv = nn.Dense(3 * d, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        o = attend_qkv(qkv, self.num_heads)
        return nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out")(o)


class _LnParams(nn.Module):
    """LayerNorm params under the same tree path as nn.LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,),
                       jnp.float32)
        return s, b


class _AttnParams(nn.Module):
    """qkv/out projection params under FusedSelfAttention's tree paths."""

    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = _DenseParams(self.dim, 3 * self.dim, name="qkv")()
        wo, bo = _DenseParams(self.dim, self.dim, name="out")()
        return wq, bq, wo, bo


class _MlpParams(nn.Module):
    """fc1/fc2 params under MlpBlock's tree paths."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        w2, b2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return w1, b1, w2, b2


class EncoderBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16
    # Pallas fused block-attention (ops/block_attention.py): probs stay in
    # VMEM, backward recomputes them on-chip; single fused QKV matmul.
    # Changes the attn param structure (see FusedSelfAttention). Default ON:
    # measured +21% nest_small and +22% vit_base train throughput on v5e.
    fused_attention: bool = True
    # Half-block megakernels (ops/fused_block.py): LN1+QKV+attention+out-
    # proj+residual in ONE program, LN2+MLP+residual in another — the
    # activation touches HBM once per half-block per direction. Param tree
    # identical to the fused path; engages per shape via supports_*().
    megakernel: bool = True
    # NesT windowed attention: when set, a 4-D [B, H, W, D] input runs the
    # blockify-free NHWC megakernel (attention within window x window
    # tiles, fed by BlockSpec index maps — no layout transposes). The
    # caller (NesT) guards with supports_window(); 3-D inputs behave as
    # before. Param tree unchanged.
    window: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        from vlp_tpu.ops import fused_block as FB
        from vlp_tpu.ops.kernel_gate import active_kernel_mesh, mosaic_ok

        if x.ndim == 4:
            return self._window_call(x, FB)
        d = x.shape[-1]
        lead = x.shape[:-1]
        n, s = x.shape[0], math.prod(x.shape[1:-1])
        mesh, _ = active_kernel_mesh()
        shards = mesh.size if mesh is not None else 1
        itemsize = jnp.dtype(self.dtype).itemsize
        kernels_on = mosaic_ok() or FB._use_interpret()
        mega_attn = (self.megakernel and self.fused_attention and kernels_on
                     and x.ndim == 3 and n % shards == 0
                     and FB.supports_attn(n // shards, s, d, self.num_heads,
                                          itemsize))
        hidden = int(d * self.mlp_ratio)
        m = n * s
        mega_mlp = (self.megakernel and self.fused_attention and kernels_on
                    and m % shards == 0
                    and FB.supports_mlp(m // shards, d, hidden, itemsize))

        if mega_attn:
            gamma, beta = _LnParams(d, name="ln1")()
            wq, bq, wo, bo = _AttnParams(d, name="attn")()
            x = FB.ln_attention(x.astype(self.dtype), gamma, beta, wq, bq,
                                wo, bo, self.num_heads)
        else:
            y = nn.LayerNorm(dtype=jnp.float32,
                             name="ln1")(x.astype(jnp.float32))
            y = y.astype(self.dtype)
            if self.fused_attention:
                y = FusedSelfAttention(self.num_heads, self.dtype,
                                       name="attn")(y)
            else:
                y = nn.MultiHeadDotProductAttention(
                    num_heads=self.num_heads, dtype=self.dtype,
                    param_dtype=jnp.float32, name="attn")(y)
            x = x + y
        if mega_mlp:
            gamma2, beta2 = _LnParams(d, name="ln2")()
            w1, b1, w2, b2 = _MlpParams(d, hidden, name="mlp")()
            y = FB.ln_mlp(x.reshape(m, d).astype(self.dtype), gamma2, beta2,
                          w1, b1, w2, b2)
            return y.reshape(*lead, d)
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x.astype(jnp.float32))
        # fused MLP is checkpoint-compatible with the unfused path and so
        # stays on regardless of the attention choice
        y = MlpBlock(hidden, dtype=self.dtype, name="mlp")(y.astype(self.dtype))
        return x + y

    def _window_call(self, x, FB):
        """Blockify-free NesT path: x [B, H, W, D]; the caller guarantees
        supports_window() holds (NesT checks per level). Params are created
        in the SAME order/names as the 3-D paths."""
        from vlp_tpu.ops.kernel_gate import active_kernel_mesh

        assert self.window, "4-D EncoderBlock input requires window="
        b, hh, ww, d = x.shape
        mesh, _ = active_kernel_mesh()
        shards = mesh.size if mesh is not None else 1
        itemsize = jnp.dtype(self.dtype).itemsize
        gamma, beta = _LnParams(d, name="ln1")()
        wq, bq, wo, bo = _AttnParams(d, name="attn")()
        x = FB.ln_attention_windows(x.astype(self.dtype), self.window,
                                    gamma, beta, wq, bq, wo, bo,
                                    self.num_heads)
        hidden = int(d * self.mlp_ratio)
        m = b * hh * ww
        if m % shards == 0 and FB.supports_mlp(m // shards, d, hidden,
                                               itemsize):
            gamma2, beta2 = _LnParams(d, name="ln2")()
            w1, b1, w2, b2 = _MlpParams(d, hidden, name="mlp")()
            y = FB.ln_mlp(x.reshape(m, d).astype(self.dtype), gamma2,
                          beta2, w1, b1, w2, b2)
            return y.reshape(b, hh, ww, d)
        y = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x.astype(jnp.float32))
        y = MlpBlock(hidden, dtype=self.dtype, name="mlp")(y.astype(self.dtype))
        return x + y


class ViT(nn.Module):
    patch_size: int = 16
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 0
    img_size: int = 224  # pos-embed grid; reference models are 224-locked
    dtype: jnp.dtype = jnp.bfloat16
    axis_name: Optional[str] = None  # unused (no BN); kept for API parity
    fused_attention: bool = True  # Pallas fused attention (block_attention.py)
    megakernel: bool = True  # half-block megakernels (fused_block.py)
    # Per-block rematerialization (jax.checkpoint): only block INPUTS are
    # saved as backward residuals; each block's forward is recomputed
    # on-chip during the backward. Trades ~1/3 more FLOPs for O(depth)
    # less activation HBM — REQUIRED for ViT-L train at batch >= 64 on a
    # 16 GB v5e chip (without it the AOT compile aborts; with it batch 128
    # fits). Composes with the Pallas custom-VJP kernels (they recompute
    # within the block either way). Value/grad parity:
    # tests/test_models.py (test_vit_values_and_grads_match,
    # test_vit_remat_with_pallas_interpret).
    remat: bool = False

    def setup(self):
        self.patch_embed = nn.Conv(
            self.hidden_dim, (self.patch_size, self.patch_size),
            (self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_dim),
            jnp.float32)
        # e.g. 224/16 = 14 -> 196 patches + CLS
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, (self.img_size // self.patch_size) ** 2 + 1, self.hidden_dim),
            jnp.float32)
        # prevent_cse=False: safe under jit/scan (flax docs) and lets XLA
        # CSE within the recomputed forward
        block_cls = nn.remat(EncoderBlock, prevent_cse=False) \
            if self.remat else EncoderBlock
        self.encoder_blocks = [
            block_cls(self.num_heads, self.mlp_ratio, self.dtype,
                      fused_attention=self.fused_attention,
                      megakernel=self.megakernel,
                      name=f"block{i}") for i in range(self.depth)]
        self.final_ln = nn.LayerNorm(dtype=jnp.float32, name="final_ln")
        if self.num_classes > 0:
            self.head = nn.Dense(self.num_classes, dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="head")

    def __call__(self, x, train: bool = False):
        feats = self.forward_features(x, train)
        return self.forward_head(feats, train)

    def forward_features(self, x, train: bool = False):
        b = x.shape[0]
        x = self.patch_embed(x.astype(self.dtype))  # [B, H/p, W/p, D]
        x = x.reshape(b, -1, self.hidden_dim)
        cls = jnp.broadcast_to(self.cls_token.astype(self.dtype),
                               (b, 1, self.hidden_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embed.astype(self.dtype)
        for block in self.encoder_blocks:
            x = block(x)
        x = self.final_ln(x.astype(jnp.float32))
        return x[:, 0]  # CLS token

    def forward_head(self, feats, train: bool = False):
        if self.num_classes > 0:
            return self.head(feats)
        return feats


def vit_base_patch16_224(**kw) -> ViT:
    return ViT(patch_size=16, hidden_dim=768, depth=12, num_heads=12, **kw)


def vit_large_patch16_224(**kw) -> ViT:
    return ViT(patch_size=16, hidden_dim=1024, depth=24, num_heads=16, **kw)


FEATURE_DIMS = {"vit_base_patch16_224": 768, "vit_large_patch16_224": 1024}
