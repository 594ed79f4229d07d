"""vlp_tpu — TPU-native vision-language pretraining for bone-tumor detection.

A from-scratch JAX/XLA/Pallas/pjit framework with the capabilities of the
reference PyTorch-Lightning codebase
(schusterbenjamin/Vision-Language-Pretraining-for-Bone-Tumor-Detection):

- Supervised baselines (ResNet34 / NesT-Small / ViT / XRV-ResNet50) on the
  combined INTERNAL+BTXRD downstream task, imaging-only and imaging+clinical
  late fusion (reference: src/models/baseline/).
- CLIP-style contrastive vision-language pretraining (ResNet image towers +
  DistilBERT/TinyBERT text towers) on MURA+LERA with LLM-generated captions,
  followed by linear-probe / fine-tune transfer
  (reference: src/models/pretrain/VisionLanguageModule.py).
- K-fold cross-validation driver, frozen-test-split protocol, per-subgroup
  offline evaluation, experiment/sweep configuration
  (reference: src/train.py, scripts/).

Architecture (TPU-first, NOT a port):
- Functional core: pure ``loss_fn(params, batch) -> scalar`` under ``jit``,
  explicit PRNG threading, donated train state.
- Data: one-time host-side deterministic preprocessing into memory-mapped
  uint8 caches; all per-epoch work (augmentation, normalization) runs
  on-device as a single fused XLA program.
- Parallelism: ``jax.sharding.Mesh`` + pjit data parallelism; global-batch
  InfoNCE via sharded logits (automatic GSPMD all-gather) plus an explicit
  ``shard_map`` variant.
- Checkpointing via Orbax; metrics as psum-reducible streaming counters.
"""

__version__ = "0.1.0"
