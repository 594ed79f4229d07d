"""Task modules: OnlyImaging, Fusion, VisionLanguage.

Functional analogues of the reference's three LightningModules
(src/models/baseline/OnlyImagingModule.py, FusionModule.py,
src/models/pretrain/VisionLanguageModule.py). Each task owns a Flax module
plus a pure ``loss_fn(variables, batch, rng) -> (loss, aux)`` the train step
differentiates, and an ``eval_fn`` producing per-sample outputs for the
streaming metric layer.

Device batch schema (built by the input pipeline; everything fixed-shape):
- downstream: image_u8 [B,S,S], label [B], clinical [B,15], dataset_id [B]
  (0=INTERNAL, 1=BTXRD), mask [B].
- pretrain: image_u8 [B,S,S], input_ids [B,L], attention_mask [B,L],
  caption_id [B], mask [B].
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp_tpu.config import Config
from vlp_tpu.models.heads import ClinicalMLP, FusionHead
from vlp_tpu.models.registry import create_backbone
from vlp_tpu.models.vlm import VisionLanguageModel
from vlp_tpu.ops import losses
from vlp_tpu.ops.augment import AugmentConfig, augment_and_normalize, normalize_only


# --------------------------------------------------------------------------
# Flax wrapper modules
# --------------------------------------------------------------------------

class OnlyImagingModel(nn.Module):
    """Backbone + 1-logit head, exposing features for CORAL
    (reference OnlyImagingModule.py:243-302)."""

    backbone_name: str = "resnet34"
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    stem: str = "conv7"
    fused_attention: Optional[bool] = None  # ViT/NesT Pallas attention
    megakernel: bool = True  # half-block megakernels (fused_block.py)
    remat: bool = False  # per-block jax.checkpoint (vit.ViT.remat)

    def setup(self):
        self.backbone, self.feature_dim = create_backbone(
            self.backbone_name, num_classes=0, dtype=self.dtype,
            axis_name=self.axis_name, norm_dtype=self.norm_dtype,
            stem=self.stem, fused_attention=self.fused_attention,
            megakernel=self.megakernel, remat=self.remat)
        self.head = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                             name="head")

    def __call__(self, images, train: bool = False):
        feats = self.backbone(images, train=train)
        return self.head(feats).squeeze(-1), feats


class FusionModel(nn.Module):
    """Image branch (10 logits) + clinical MLP (10) + fusion Linear(20,1)
    (reference FusionModule.py:58-117, :318-331)."""

    backbone_name: str = "resnet34"
    dtype: jnp.dtype = jnp.bfloat16
    norm_dtype: jnp.dtype = jnp.float32
    axis_name: Optional[str] = None
    stem: str = "conv7"
    fused_attention: Optional[bool] = None  # ViT/NesT Pallas attention
    megakernel: bool = True  # half-block megakernels (fused_block.py)
    remat: bool = False  # per-block jax.checkpoint (vit.ViT.remat)

    def setup(self):
        self.backbone, self.feature_dim = create_backbone(
            self.backbone_name, num_classes=0, dtype=self.dtype,
            axis_name=self.axis_name, norm_dtype=self.norm_dtype,
            stem=self.stem, fused_attention=self.fused_attention,
            megakernel=self.megakernel, remat=self.remat)
        self.image_head = nn.Dense(10, dtype=jnp.float32,
                                   param_dtype=jnp.float32, name="image_head")
        self.clinical_mlp = ClinicalMLP(name="clinical_mlp")
        self.fusion_head = FusionHead(name="fusion_head")

    def __call__(self, images, clinical, train: bool = False):
        feats = self.backbone(images, train=train)
        img_logits = self.image_head(feats)
        clin = self.clinical_mlp(clinical, train=train)
        out = self.fusion_head(img_logits, clin).squeeze(-1)
        return out, feats


# --------------------------------------------------------------------------
# Tasks
# --------------------------------------------------------------------------

@dataclasses.dataclass
class TaskStatics:
    """Per-fold statics threaded into the jitted step as python constants."""

    mean: float = 0.0
    std: float = 1.0
    class_weights: Tuple[float, float] = (1.0, 1.0)
    out_channels: int = 3
    scale_intensity: bool = False
    augment: AugmentConfig = AugmentConfig()


class BaseTask:
    model: nn.Module

    def init_variables(self, rng: jax.Array, batch: Dict[str, jax.Array]):
        raise NotImplementedError

    def loss_fn(self, params, extra_vars, batch, rng):
        """Returns (loss, (mutated_vars, aux_dict)). Differentiated w.r.t.
        params with train-mode batch statistics mutation."""
        raise NotImplementedError

    def eval_fn(self, variables, batch):
        """Returns dict with at least logits/labels/mask for metric updates."""
        raise NotImplementedError

    # -- shared helpers -----------------------------------------------------
    def _prep_train(self, batch, rng, statics: TaskStatics):
        return augment_and_normalize(
            batch["image_u8"], rng, jnp.float32(statics.mean),
            jnp.float32(statics.std), statics.augment,
            out_channels=statics.out_channels, dtype=self.dtype,
            scale_intensity=statics.scale_intensity)

    def _prep_eval(self, batch, statics: TaskStatics):
        return normalize_only(
            batch["image_u8"], jnp.float32(statics.mean),
            jnp.float32(statics.std), out_channels=statics.out_channels,
            dtype=self.dtype, scale_intensity=statics.scale_intensity)


class OnlyImagingTask(BaseTask):
    """Weighted BCE + optional CORAL between INTERNAL/BTXRD features
    (reference OnlyImagingModule.py:251-302)."""

    def __init__(self, cfg: Config, statics: TaskStatics,
                 axis_name: Optional[str] = None):
        self.dtype = jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32
        norm_dtype = jnp.bfloat16 if cfg.trainer.bn_dtype == "bf16" else jnp.float32
        self.model = OnlyImagingModel(backbone_name=cfg.model.model,
                                      dtype=self.dtype, norm_dtype=norm_dtype,
                                      axis_name=axis_name,
                                      stem=cfg.model.stem,
                                      fused_attention=cfg.model.fused_attention,
                                      megakernel=cfg.model.megakernel,
                                      remat=cfg.model.remat)
        self.coral_lambda = float(cfg.model.coral_lambda)
        self.statics = statics

    def init_variables(self, rng, batch):
        images = self._prep_eval(batch, self.statics)
        return self.model.init({"params": rng}, images, train=False)

    def loss_fn(self, params, extra_vars, batch, rng):
        akey, _ = jax.random.split(rng)
        images = self._prep_train(batch, akey, self.statics)
        (logits, feats), mutated = self.model.apply(
            {"params": params, **extra_vars}, images, train=True,
            mutable=["batch_stats"])
        labels = batch["label"].astype(jnp.float32)
        mask = batch.get("mask", jnp.ones_like(labels))
        w = losses.per_sample_class_weights(labels, self.statics.class_weights)
        loss = losses.bce_with_logits(logits, labels, w, mask)
        aux = {"bce": loss}
        if self.coral_lambda > 0:
            src_mask = mask * (batch["dataset_id"] == 0)
            tgt_mask = mask * (batch["dataset_id"] == 1)
            cl = losses.coral_loss(feats, feats, src_mask, tgt_mask)
            loss = loss + self.coral_lambda * cl
            aux["coral"] = cl
        aux["loss"] = loss
        return loss, (mutated, {"logits": logits, "labels": labels,
                                "mask": mask, **aux})

    def eval_fn(self, variables, batch):
        images = self._prep_eval(batch, self.statics)
        logits, _ = self.model.apply(variables, images, train=False)
        labels = batch["label"].astype(jnp.float32)
        mask = batch.get("mask", jnp.ones_like(labels))
        w = losses.per_sample_class_weights(labels, self.statics.class_weights)
        loss = losses.bce_with_logits(logits, labels, w, mask)
        return {"logits": logits, "labels": labels, "mask": mask,
                "dataset_id": batch["dataset_id"], "loss": loss}

    def features_fn(self, variables, batch):
        """Pooled backbone features (t-SNE / linear probe / transfer eval)."""
        images = self._prep_eval(batch, self.statics)
        _, feats = self.model.apply(variables, images, train=False)
        return feats

    def plot_outputs_fn(self, variables, batch):
        """[B, F+1] features ++ logit column in ONE forward pass — feeds the
        post-fit t-SNE/confusion plots through collect_over_loader's scanned
        dispatch (the model already returns both)."""
        images = self._prep_eval(batch, self.statics)
        logits, feats = self.model.apply(variables, images, train=False)
        return jnp.concatenate(
            [feats, logits.reshape(feats.shape[0], 1)], axis=-1)


class FusionTask(BaseTask):
    """Imaging + clinical late fusion; CORAL on IMAGE features
    (reference FusionModule.py:341-390)."""

    def __init__(self, cfg: Config, statics: TaskStatics,
                 axis_name: Optional[str] = None):
        self.dtype = jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32
        norm_dtype = jnp.bfloat16 if cfg.trainer.bn_dtype == "bf16" else jnp.float32
        self.model = FusionModel(backbone_name=cfg.model.model,
                                 dtype=self.dtype, norm_dtype=norm_dtype,
                                 axis_name=axis_name, stem=cfg.model.stem,
                                 fused_attention=cfg.model.fused_attention,
                                 megakernel=cfg.model.megakernel,
                                 remat=cfg.model.remat)
        self.coral_lambda = float(cfg.model.coral_lambda)
        self.statics = statics

    def init_variables(self, rng, batch):
        images = self._prep_eval(batch, self.statics)
        return self.model.init({"params": rng}, images, batch["clinical"],
                               train=False)

    def loss_fn(self, params, extra_vars, batch, rng):
        akey, _ = jax.random.split(rng)
        images = self._prep_train(batch, akey, self.statics)
        (logits, feats), mutated = self.model.apply(
            {"params": params, **extra_vars}, images, batch["clinical"],
            train=True, mutable=["batch_stats"])
        labels = batch["label"].astype(jnp.float32)
        mask = batch.get("mask", jnp.ones_like(labels))
        w = losses.per_sample_class_weights(labels, self.statics.class_weights)
        loss = losses.bce_with_logits(logits, labels, w, mask)
        aux = {"bce": loss}
        if self.coral_lambda > 0:
            src_mask = mask * (batch["dataset_id"] == 0)
            tgt_mask = mask * (batch["dataset_id"] == 1)
            cl = losses.coral_loss(feats, feats, src_mask, tgt_mask)
            loss = loss + self.coral_lambda * cl
            aux["coral"] = cl
        aux["loss"] = loss
        return loss, (mutated, {"logits": logits, "labels": labels,
                                "mask": mask, **aux})

    def eval_fn(self, variables, batch):
        images = self._prep_eval(batch, self.statics)
        logits, _ = self.model.apply(variables, images, batch["clinical"],
                                     train=False)
        labels = batch["label"].astype(jnp.float32)
        mask = batch.get("mask", jnp.ones_like(labels))
        w = losses.per_sample_class_weights(labels, self.statics.class_weights)
        loss = losses.bce_with_logits(logits, labels, w, mask)
        return {"logits": logits, "labels": labels, "mask": mask,
                "dataset_id": batch["dataset_id"], "loss": loss}

    def features_fn(self, variables, batch):
        images = self._prep_eval(batch, self.statics)
        _, feats = self.model.apply(variables, images, batch["clinical"],
                                    train=False)
        return feats

    def plot_outputs_fn(self, variables, batch):
        """[B, F+1] image features ++ fused logit column in one pass (see
        OnlyImagingTask.plot_outputs_fn)."""
        images = self._prep_eval(batch, self.statics)
        logits, feats = self.model.apply(variables, images,
                                         batch["clinical"], train=False)
        return jnp.concatenate(
            [feats, logits.reshape(feats.shape[0], 1)], axis=-1)


class VisionLanguageTask(BaseTask):
    """CLIP dual tower + symmetric InfoNCE (reference
    VisionLanguageModule.py:441-553). Embeddings leave the towers sharded by
    batch; the [B,B] logits matmul runs on the global batch (GSPMD inserts
    the all-gather; an explicit shard_map variant lives in
    vlp_tpu.parallel.infonce)."""

    def __init__(self, cfg: Config, statics: TaskStatics,
                 axis_name: Optional[str] = None):
        self.dtype = jnp.bfloat16 if cfg.trainer.precision == "bf16" else jnp.float32
        norm_dtype = jnp.bfloat16 if cfg.trainer.bn_dtype == "bf16" else jnp.float32
        self.model = VisionLanguageModel(
            image_model=cfg.model.model, text_model=cfg.model.text_model,
            embedding_dim=cfg.model.embedding_dim,
            image_dropout=cfg.model.image_dropout,
            logit_scale_init=cfg.model.logit_scale_init,
            dtype=self.dtype, norm_dtype=norm_dtype, axis_name=axis_name,
            stem=cfg.model.stem,
            fused_attention=cfg.model.fused_attention,
            megakernel=cfg.model.megakernel, remat=cfg.model.remat)
        self.scale_max = float(cfg.model.logit_scale_max)
        self.loss_variant = cfg.model.loss_variant
        self.statics = statics
        self.axis_name = axis_name
        # gspmd: dense [B,B] logits, GSPMD inserts the all-gather.
        # shard_map: chunked global-batch loss — each shard materializes
        # only its [B_local, B_global] row block (parallel/infonce.py);
        # the scale axis for large global batches (SURVEY.md §5).
        if cfg.mesh.infonce_impl not in ("gspmd", "shard_map"):
            raise ValueError(
                f"mesh.infonce_impl={cfg.mesh.infonce_impl!r} "
                "(expected 'gspmd' or 'shard_map')")
        self.infonce_impl = cfg.mesh.infonce_impl

    def init_variables(self, rng, batch):
        images = self._prep_eval(batch, self.statics)
        return self.model.init({"params": rng, "dropout": rng}, images,
                               batch["input_ids"], batch["attention_mask"],
                               train=False)

    def loss_fn(self, params, extra_vars, batch, rng):
        akey, dkey = jax.random.split(rng)
        images = self._prep_train(batch, akey, self.statics)
        (img_emb, txt_emb, logit_scale), mutated = self.model.apply(
            {"params": params, **extra_vars}, images, batch["input_ids"],
            batch["attention_mask"], train=True, mutable=["batch_stats"],
            rngs={"dropout": dkey})
        mask = batch.get("mask", jnp.ones(img_emb.shape[0]))
        if self.loss_variant == "masked":
            logits = losses.clip_logits(img_emb, txt_emb, logit_scale,
                                        self.scale_max)
            loss = losses.masked_infonce(logits, batch["caption_id"], mask)
        elif self.loss_variant == "non_square":
            logits = losses.clip_logits(img_emb, txt_emb, logit_scale,
                                        self.scale_max)
            loss = losses.non_square_infonce(logits, batch["caption_id"],
                                             mask)
        else:
            loss = self._symmetric_loss(img_emb, txt_emb, logit_scale, mask)
        aux = {"loss": loss, "logit_scale": logit_scale,
               "img_emb": img_emb, "txt_emb": txt_emb, "mask": mask}
        return loss, (mutated, aux)

    def _symmetric_loss(self, img_emb, txt_emb, logit_scale, mask):
        """Symmetric InfoNCE via the configured impl. The shard_map variant
        engages when mesh.infonce_impl='shard_map' and a multi-device mesh
        is active; the masked/non_square deprecated variants always use the
        dense path (they index caption_id against the full matrix)."""
        if self.infonce_impl == "shard_map":
            from vlp_tpu.ops.kernel_gate import active_kernel_mesh
            from vlp_tpu.parallel.infonce import global_infonce_shard_map

            mesh, axis = active_kernel_mesh()
            if mesh is not None:
                scale = jnp.minimum(jnp.exp(logit_scale), self.scale_max)
                return global_infonce_shard_map(mesh, axis)(
                    img_emb.astype(jnp.float32),
                    txt_emb.astype(jnp.float32), scale,
                    mask.astype(jnp.float32))
        logits = losses.clip_logits(img_emb, txt_emb, logit_scale,
                                    self.scale_max)
        return losses.symmetric_infonce(logits, mask)

    def eval_fn(self, variables, batch):
        images = self._prep_eval(batch, self.statics)
        img_emb, txt_emb, logit_scale = self.model.apply(
            variables, images, batch["input_ids"], batch["attention_mask"],
            train=False)
        logits = losses.clip_logits(img_emb, txt_emb, logit_scale,
                                    self.scale_max)
        mask = batch.get("mask", jnp.ones(logits.shape[0]))
        loss = losses.symmetric_infonce(logits, mask)
        return {"img_emb": img_emb, "txt_emb": txt_emb, "mask": mask,
                "loss": loss}

    def embed_images_fn(self, variables, batch):
        """Projected image embeddings for retrieval / downstream zero-shot
        precision@k (reference :299-361)."""
        images = self._prep_eval(batch, self.statics)
        return self.model.apply(variables, images, False,
                                method="encode_image")

    def features_fn(self, variables, batch):
        """Un-projected backbone features for the linear probe
        (reference LinearProbeCallback.py:92-116)."""
        images = self._prep_eval(batch, self.statics)
        return self.model.apply(variables, images, False,
                                method="image_features")


def build_task(cfg: Config, statics: TaskStatics,
               axis_name: Optional[str] = None) -> BaseTask:
    if cfg.model.task == "only_imaging":
        return OnlyImagingTask(cfg, statics, axis_name)
    if cfg.model.task == "fusion":
        return FusionTask(cfg, statics, axis_name)
    if cfg.model.task == "vision_language":
        return VisionLanguageTask(cfg, statics, axis_name)
    raise ValueError(f"unknown task {cfg.model.task!r}")
