"""Dual-tower CLIP-style vision-language model.

Reference VisionLanguageModule.py:27-111: ImageEncoder = timm backbone with
num_classes=0 + avg pool (+ optional dropout); TextEncoder = DistilBERT or
TinyBERT CLS embedding; learned linear projections as raw parameter matrices
init N(0, dim^-0.5); learnable logit_scale init log(1/0.07), exp-then-clamp
at 100 in forward (:456-457).

forward(batch) -> (image_embeddings, text_embeddings) un-normalized; the
loss/eval code normalizes and builds the [B,B] logits
(vlp_tpu.ops.losses.clip_logits), so embeddings can be all-gathered across
the mesh before the contrastive matrix is formed.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vlp_tpu.models.bert import TEXT_CONFIGS, BertEncoder
from vlp_tpu.models.registry import create_backbone


class VisionLanguageModel(nn.Module):
    image_model: str = "resnet34"
    text_model: str = "distilbert"
    embedding_dim: int = 128
    image_dropout: float = 0.0
    logit_scale_init: float = 2.6592  # log(1/0.07)
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    stem: str = "conv7"
    fused_attention: Optional[bool] = None  # ViT/NesT Pallas attention
    megakernel: bool = True  # half-block megakernels (fused_block.py)
    remat: bool = False  # per-block jax.checkpoint (vit.ViT.remat)

    def setup(self):
        self.image_encoder, self.image_dim = create_backbone(
            self.image_model, num_classes=0, dtype=self.dtype,
            axis_name=self.axis_name, dropout_rate=self.image_dropout,
            norm_dtype=self.norm_dtype, stem=self.stem,
            fused_attention=self.fused_attention,
            megakernel=self.megakernel, remat=self.remat)
        text_cfg = TEXT_CONFIGS[self.text_model]
        self.text_encoder = BertEncoder(text_cfg, dtype=self.dtype,
                                        name="text_encoder")
        self.text_dim = text_cfg.hidden_size
        # raw projection matrices, init N(0, d^-0.5)
        # (reference VisionLanguageModule.py:102-109)
        self.image_projection = self.param(
            "image_projection",
            nn.initializers.normal(self.image_dim**-0.5),
            (self.image_dim, self.embedding_dim), jnp.float32)
        self.text_projection = self.param(
            "text_projection",
            nn.initializers.normal(self.text_dim**-0.5),
            (self.text_dim, self.embedding_dim), jnp.float32)
        self.logit_scale = self.param(
            "logit_scale",
            lambda rng, shape, dtype: jnp.full(shape, self.logit_scale_init,
                                               dtype),
            (), jnp.float32)

    def __call__(self, images, input_ids, attention_mask, train: bool = False):
        img_emb = self.encode_image(images, train)
        txt_emb = self.encode_text(input_ids, attention_mask, train)
        return img_emb, txt_emb, self.logit_scale

    def encode_image(self, images, train: bool = False):
        feats = self.image_encoder(images, train=train)  # [B, D_img]
        return feats @ self.image_projection

    def image_features(self, images, train: bool = False):
        """Un-projected pooled backbone features — what the linear probe and
        the encoder-transfer path consume (reference
        LinearProbeCallback.py:92-116, OnlyImagingModule.py:75-98)."""
        return self.image_encoder(images, train=train)

    def encode_text(self, input_ids, attention_mask, train: bool = False):
        feats = self.text_encoder(input_ids, attention_mask, train=train)
        return feats @ self.text_projection
