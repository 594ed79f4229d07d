"""Orbax checkpointing + encoder-subtree transfer surgery.

Reference equivalents: Lightning ModelCheckpoint with save_top_k=1 and
metric-monitored best selection (configs/callbacks/model_checkpoint_*.yaml);
``load_from_checkpoint``; and the VLP->downstream transfer that strips the
``image_encoder.model.`` prefix from a VLP state_dict and loads it into a
fresh classifier backbone with strict=False (OnlyImagingModule.py:75-98,
FusionModule.py:92-96). Here: Orbax StandardCheckpointer over the raw param
pytree; transfer = extracting the ``image_encoder`` subtree of a VLP
checkpoint and grafting it under the classifier's ``backbone`` key.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class Checkpointer:
    """save_top_k=1 best-metric checkpointing.

    With ``async_write`` (default) the Orbax write runs in a background
    thread and overlaps the next epoch's training: ``save`` returns once the
    arrays are copied to host, and the commit is awaited lazily — before the
    NEXT write, or at :meth:`wait` (the Trainer calls it when ``fit``
    returns, so readers after ``fit`` always see committed files). The meta
    sidecar and the old-best deletion are deferred to that same commit
    barrier, so a crash mid-write never leaves a sidecar without its body or
    zero checkpoints on disk. TPU idiom: checkpoint I/O must never stall the
    device (the reference's Lightning ModelCheckpoint writes synchronously,
    configs/callbacks/model_checkpoint_*.yaml).
    """

    def __init__(self, directory: str, monitor: str, mode: str = "max",
                 async_write: bool = True) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.async_write = async_write
        self.best: Optional[float] = None
        self.best_path: Optional[str] = None
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_delete: Optional[str] = None
        self._pending_meta: Optional[Dict] = None
        self._pending_meta_path: Optional[str] = None

    def improved(self, value: float) -> bool:
        if self.best is None:
            return True
        return value > self.best if self.mode == "max" else value < self.best

    def _commit(self) -> None:
        """Await the in-flight write, then apply its deferred side effects
        (meta sidecar, old-best deletion) in commit order."""
        self._ckptr.wait_until_finished()
        if self._pending_meta is not None:
            import json

            with open(self._pending_meta_path, "w") as fh:
                json.dump(self._pending_meta, fh)
            self._pending_meta = None
            self._pending_meta_path = None
        if self._pending_delete is not None:
            import shutil

            old = self._pending_delete
            self._pending_delete = None
            if os.path.exists(old):
                shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(old + ".meta.json"):
                os.remove(old + ".meta.json")

    def wait(self) -> None:
        """Barrier: returns only when the last write is durable on disk and
        its sidecar/deletion side effects are applied."""
        self._commit()

    def maybe_save(self, metrics: Dict[str, float], state_tree: Any,
                   epoch: int, meta: Optional[Dict] = None) -> bool:
        """Save when the monitored metric improved; keeps only the best
        (save_top_k=1). ``meta`` adds the loop-counter sidecar that makes
        the checkpoint exactly resumable."""
        if self.monitor not in metrics:
            return False
        value = float(metrics[self.monitor])
        if not self.improved(value):
            return False
        self._commit()  # serialize with any in-flight write
        old = self.best_path
        self.best = value
        safe = self.monitor.replace("/", "_")
        self.best_path = os.path.join(
            self.directory, f"epoch{epoch:03d}_{safe}{value:.4f}")
        self._ckptr.save(self.best_path, state_tree, force=True)
        if meta is not None:
            meta = dict(meta)
            meta["checkpoint_best"] = value
            meta["checkpoint_best_path"] = self.best_path
            self._pending_meta = meta
            self._pending_meta_path = self.best_path + ".meta.json"
        if old:
            self._pending_delete = old
        if not self.async_write:
            self._commit()
        logger.info("Checkpoint: new best %s=%.4f -> %s%s", self.monitor,
                    value, self.best_path,
                    " (async)" if self.async_write else "")
        return True

    def restore_best(self, example_tree: Any) -> Any:
        if self.best_path is None:
            raise RuntimeError("no checkpoint saved yet")
        self._commit()
        return restore(self.best_path, example_tree)


class LastStateSaver:
    """Per-epoch full-state ``last`` checkpoint (exact resume), written
    asynchronously on a persistent Orbax checkpointer. The write overlaps
    the next epoch; the meta sidecar is written only after the body commits
    (a crash mid-write leaves the previous epoch's consistent pair, never a
    sidecar pointing at a torn body). The Trainer awaits :meth:`wait` when
    ``fit`` returns. Reference analogue: Lightning's ``save_last``
    (reference src/train.py:171, configs/train.yaml:53)."""

    def __init__(self, path: str, async_write: bool = True) -> None:
        self.path = os.path.abspath(path)
        self.async_write = async_write
        self._ckptr = ocp.StandardCheckpointer()
        self._pending_meta: Optional[Dict] = None

    def _commit(self) -> None:
        self._ckptr.wait_until_finished()
        if self._pending_meta is not None:
            import json

            with open(self.path + ".meta.json", "w") as fh:
                json.dump(self._pending_meta, fh)
            self._pending_meta = None

    def wait(self) -> None:
        self._commit()

    def save(self, state, meta: Optional[Dict] = None) -> str:
        self._commit()  # serialize with the previous epoch's write
        self._ckptr.save(self.path, state_to_tree(state), force=True)
        self._pending_meta = dict(meta) if meta is not None else None
        if not self.async_write:
            self._commit()
        return self.path


# --------------------------------------------------------------------------
# Full training-state checkpoints (exact resume)
# --------------------------------------------------------------------------

def state_to_tree(state) -> Dict:
    """TrainState -> plain-dict checkpoint tree. Keys 'params'/'extra_vars'
    stay at the top level so weights-only consumers (transfer surgery, eval
    CLIs) read full-state checkpoints unchanged. The PRNG key is stored as
    raw key data (typed key arrays don't serialize portably)."""
    return {
        "params": state.params,
        "extra_vars": state.extra_vars,
        "opt_state": state.opt_state,
        "step": state.step,
        "rng_data": jax.random.key_data(state.rng),
    }


def save_train_state(path: str, state, meta: Optional[Dict] = None) -> str:
    """Save the FULL training state (params, BN stats, optimizer moments,
    step, RNG) plus a JSON meta sidecar with host-side loop counters (epoch,
    early-stop/best-metric state, sampler RNG) — the analogue of Lightning's
    resumable ckpt (reference src/train.py:171, configs/train.yaml:53)."""
    path = save(path, state_to_tree(state))
    if meta is not None:
        import json

        with open(path + ".meta.json", "w") as fh:
            json.dump(meta, fh)
    return path


def load_meta(path: str) -> Optional[Dict]:
    """Loop-counter sidecar of a full-state checkpoint; None for
    weights-only checkpoints (which then warm-start instead of resuming)."""
    import json

    meta_path = os.path.abspath(path) + ".meta.json"
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fh:
        return json.load(fh)


def restore_train_state(path: str, example_state):
    """Restore a full-state checkpoint into a TrainState shaped like
    ``example_state`` (same model/optimizer config)."""
    tree = restore(path, state_to_tree(example_state))
    rng = jax.random.wrap_key_data(tree["rng_data"])
    return example_state.replace(
        params=tree["params"], extra_vars=tree["extra_vars"],
        opt_state=tree["opt_state"], step=tree["step"], rng=rng)


def save(path: str, tree: Any) -> str:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore(path: str, example_tree: Any) -> Any:
    """Restore into the shape of ``example_tree``. When the checkpoint holds
    a SUPERSET of the requested top-level keys (full-state checkpoints read
    by weights-only consumers), the requested subset is returned. Attention
    param layouts are migrated automatically when the checkpoint and the
    target disagree on ``model.fused_attention`` (fused attn/{qkv,out} vs
    flax attn/{query,key,value,out} — the two are linear repackagings)."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                       getattr(x, "dtype", None)), example_tree)
    try:
        return ckptr.restore(os.path.abspath(path), abstract)
    except Exception:
        if not isinstance(example_tree, dict):
            raise
        raw = restore_raw(path)
        missing = set(example_tree) - set(raw)
        if missing:
            raise KeyError(
                f"checkpoint {path} lacks requested keys {sorted(missing)}")
        subset = {k: raw[k] for k in example_tree}
        subset, n = adapt_attention_layout(subset, example_tree)
        if n:
            logger.info(
                "Migrated %d attention block(s) between fused and flax "
                "param layouts while restoring %s (checkpoint was saved "
                "with a different model.fused_attention setting)", n, path)
        _check_same_structure(subset, example_tree, path)
        return subset


def restore_raw(path: str) -> Any:
    """Restore a checkpoint with its SAVED structure (no abstract tree) —
    required when the consumer's tree differs from the producer's, e.g.
    loading a VLP checkpoint to graft its image tower into a classifier."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


# -- fused <-> flax attention layout migration ------------------------------
#
# FusedSelfAttention (models/vit.py) stores attn/{qkv,out} with a packed
# [D, 3D] qkv kernel; flax nn.MultiHeadDotProductAttention stores
# attn/{query,key,value,out} with [D, H, Dh] / [H, Dh, D] kernels. The head
# packing inside each D block is identical (heads-major, contiguous Dh
# columns), so checkpoints convert exactly by reshape+concat — restoring a
# checkpoint saved under the other model.fused_attention setting must not
# fail (ADVICE r2, medium).

def _is_unfused_attn(node) -> bool:
    return isinstance(node, dict) and \
        {"query", "key", "value", "out"} <= set(node) and \
        isinstance(node.get("query"), dict) and "kernel" in node["query"] \
        and getattr(node["query"]["kernel"], "ndim", 0) == 3


def _is_fused_attn(node) -> bool:
    return isinstance(node, dict) and set(node) >= {"qkv", "out"} and \
        isinstance(node.get("qkv"), dict) and "kernel" in node["qkv"]


def _fuse_attn(node) -> Dict:
    import numpy as np

    d = node["query"]["kernel"].shape[0]
    kern = np.concatenate(
        [np.asarray(node[k]["kernel"]).reshape(d, -1)
         for k in ("query", "key", "value")], axis=1)
    bias = np.concatenate(
        [np.asarray(node[k]["bias"]).reshape(-1)
         for k in ("query", "key", "value")])
    out_k = np.asarray(node["out"]["kernel"]).reshape(-1, d)
    out_b = np.asarray(node["out"]["bias"]).reshape(-1)
    return {"qkv": {"kernel": kern, "bias": bias},
            "out": {"kernel": out_k, "bias": out_b}}


def _unfuse_attn(node, target) -> Dict:
    import numpy as np

    qk = target["query"]["kernel"].shape  # [D, H, Dh]
    d = qk[0]
    kern = np.asarray(node["qkv"]["kernel"])
    bias = np.asarray(node["qkv"]["bias"])
    parts = {}
    for i, k in enumerate(("query", "key", "value")):
        parts[k] = {"kernel": kern[:, i * d:(i + 1) * d].reshape(qk),
                    "bias": bias[i * d:(i + 1) * d].reshape(qk[1:])}
    ok = target["out"]["kernel"].shape  # [H, Dh, D]
    parts["out"] = {"kernel": np.asarray(node["out"]["kernel"]).reshape(ok),
                    "bias": np.asarray(node["out"]["bias"]).reshape(-1)}
    return parts


def adapt_attention_layout(loaded: Any, target: Any, _count=None):
    """Walk ``loaded`` and ``target`` in parallel; convert attention nodes
    between the fused and flax layouts wherever they disagree. Returns
    (adapted_tree, number_of_converted_blocks)."""
    top = _count is None
    count = [0] if top else _count
    if isinstance(loaded, dict) and isinstance(target, dict):
        if _is_unfused_attn(loaded) and _is_fused_attn(target):
            count[0] += 1
            return (_fuse_attn(loaded), count[0]) if top else _fuse_attn(loaded)
        if _is_fused_attn(loaded) and _is_unfused_attn(target):
            count[0] += 1
            return (_unfuse_attn(loaded, target), count[0]) if top \
                else _unfuse_attn(loaded, target)
        out = {k: (adapt_attention_layout(v, target[k], count)
                   if k in target else v)
               for k, v in loaded.items()}
        return (out, count[0]) if top else out
    return (loaded, count[0]) if top else loaded


def _check_same_structure(loaded: Any, target: Any, path: str) -> None:
    """Clear error when the restored tree still mismatches the model —
    naming model.fused_attention when an attention node is the culprit."""
    ld = jax.tree.structure(loaded)
    tg = jax.tree.structure(target)
    if ld == tg:
        return
    flat_l = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(loaded)}
    flat_t = {jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(target)}
    diff = sorted(flat_l ^ flat_t)
    hint = ""
    if any("attn" in k and ("qkv" in k or "query" in k) for k in diff):
        hint = (" — the checkpoint and the model disagree on the attention "
                "param layout; set model.fused_attention to match the run "
                "that produced the checkpoint")
    raise ValueError(
        f"checkpoint {path} does not match the model tree{hint}; "
        f"first differing leaves: {diff[:6]}")


def extract_image_encoder(vlp_params: Dict) -> Dict:
    """VLP param tree -> image-tower backbone subtree (the analogue of
    stripping the 'image_encoder.model.' state_dict prefix,
    reference OnlyImagingModule.py:76-80)."""
    if "image_encoder" not in vlp_params:
        raise KeyError("checkpoint has no image_encoder subtree")
    return vlp_params["image_encoder"]


def graft_backbone(classifier_params: Dict, encoder_subtree: Dict) -> Dict:
    """Replace the classifier's backbone params with a pretrained encoder
    subtree (strict=False semantics: heads keep their fresh init)."""
    out = dict(classifier_params)
    if "backbone" not in out:
        raise KeyError("classifier params have no 'backbone' subtree")
    encoder_subtree, n = adapt_attention_layout(encoder_subtree,
                                                out["backbone"])
    if n:
        logger.info("Migrated %d attention block(s) to the classifier's "
                    "layout during encoder transfer", n)
    _assert_compatible(out["backbone"], encoder_subtree, path="backbone")
    out["backbone"] = encoder_subtree
    return out


def _assert_compatible(a: Any, b: Any, path: str = "") -> None:
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(b)}
    for p, va in la:
        key = jax.tree_util.keystr(p)
        if key not in lb:
            raise KeyError(f"transfer mismatch: {path}{key} missing in source")
        if getattr(va, "shape", None) != getattr(lb[key], "shape", None):
            raise ValueError(
                f"transfer shape mismatch at {path}{key}: "
                f"{getattr(va, 'shape', None)} vs {getattr(lb[key], 'shape', None)}")
