"""Text towers: DistilBERT / TinyBERT-architecture encoders in Flax Linen.

The reference's TextEncoder wraps HF ``distilbert-base-uncased`` or
``huawei-noah/TinyBERT_General_4L_312D`` and takes the CLS-token (index 0)
of the last hidden state (reference VisionLanguageModule.py:38-60). Here the
architectures are implemented natively (post-LN transformer encoders) with a
converter that imports pretrained HF checkpoints when weights are locally
available (zero-egress environments fall back to random init — flagged in
logs because pretrained text towers matter for VLP quality).

Configs:
- distilbert: vocab 30522, 6 layers, 768 hidden, 12 heads, ffn 3072,
  word+position embeddings (no token type).
- tinybert:   vocab 30522, 4 layers, 312 hidden, 12 heads, ffn 1200,
  word+position+token-type embeddings (BERT layout).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position: int = 512
    use_token_type: bool = False
    layer_norm_eps: float = 1e-12
    hf_name: str = ""


DISTILBERT = BertConfig(hidden_size=768, num_layers=6, num_heads=12,
                        intermediate_size=3072, use_token_type=False,
                        hf_name="distilbert-base-uncased")
TINYBERT = BertConfig(hidden_size=312, num_layers=4, num_heads=12,
                      intermediate_size=1200, use_token_type=True,
                      hf_name="huawei-noah/TinyBERT_General_4L_312D")
# Not a reference tower: 2-layer micro encoder so sharding dryruns and
# CPU-mesh tests compile fast while running the same encoder code path.
MICROBERT = BertConfig(hidden_size=64, num_layers=2, num_heads=2,
                       intermediate_size=128, max_position=64)

TEXT_CONFIGS = {"distilbert": DISTILBERT, "tinybert": TINYBERT,
                "microbert": MICROBERT}


class BertLayer(nn.Module):
    """Post-LN transformer encoder layer (BERT/DistilBERT style)."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.attn = nn.MultiHeadDotProductAttention(
            num_heads=self.cfg.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32, name="attn")
        self.attn_ln = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                    dtype=jnp.float32, name="attn_ln")
        self.ffn_in = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype,
                               param_dtype=jnp.float32, name="ffn_in")
        self.ffn_out = nn.Dense(self.cfg.hidden_size, dtype=self.dtype,
                                param_dtype=jnp.float32, name="ffn_out")
        self.ffn_ln = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps,
                                   dtype=jnp.float32, name="ffn_ln")

    def __call__(self, x, attn_mask):
        y = self.attn(x.astype(self.dtype), mask=attn_mask)
        x = self.attn_ln((x + y).astype(jnp.float32)).astype(self.dtype)
        y = self.ffn_out(nn.gelu(self.ffn_in(x), approximate=False))
        return self.ffn_ln((x + y).astype(jnp.float32)).astype(self.dtype)


class BertEncoder(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size,
                                        param_dtype=jnp.float32,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(c.max_position, c.hidden_size,
                                            param_dtype=jnp.float32,
                                            name="position_embeddings")
        if c.use_token_type:
            self.token_type_embeddings = nn.Embed(2, c.hidden_size,
                                                  param_dtype=jnp.float32,
                                                  name="token_type_embeddings")
        self.embed_ln = nn.LayerNorm(epsilon=c.layer_norm_eps,
                                     dtype=jnp.float32, name="embed_ln")
        self.layers = [BertLayer(c, self.dtype, name=f"layer{i}")
                       for i in range(c.num_layers)]

    def __call__(self, input_ids, attention_mask, train: bool = False):
        """[B, L] int32 ids + [B, L] 0/1 mask -> [B, D] CLS embedding."""
        b, l = input_ids.shape
        pos = jnp.arange(l)[None, :]
        x = self.word_embeddings(input_ids) + self.position_embeddings(pos)
        if self.cfg.use_token_type:
            x = x + self.token_type_embeddings(jnp.zeros_like(input_ids))
        x = self.embed_ln(x.astype(jnp.float32)).astype(self.dtype)
        # [B, 1, L(q), L(kv)] boolean mask: every query attends valid keys
        mask = attention_mask[:, None, None, :].astype(bool)
        mask = jnp.broadcast_to(mask, (b, 1, l, l))
        for layer in self.layers:
            x = layer(x, mask)
        return x[:, 0].astype(jnp.float32)  # CLS token


# --------------------------------------------------------------------------
# HF checkpoint import
# --------------------------------------------------------------------------

def load_hf_weights(params: dict, model_key: str) -> Optional[dict]:
    """Convert a locally-cached HF torch checkpoint into our param tree.

    Returns the converted params, or None when weights are unavailable
    (zero-egress). Callers keep random init in that case; the reference's
    pretrained text towers then become from-scratch towers, which is logged
    loudly since it changes expected VLP quality.
    """
    cfg = TEXT_CONFIGS[model_key]
    try:
        import os

        # hard offline: some HF code paths (adapter discovery) still issue
        # HEAD requests with retries despite local_files_only
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
        import torch  # noqa: local import; heavy
        from transformers import AutoModel

        hf = AutoModel.from_pretrained(cfg.hf_name, local_files_only=True)
    except Exception as e:  # pragma: no cover - depends on local HF cache
        logger.warning(
            "Pretrained %s weights unavailable locally (%s); text tower "
            "uses random init.", cfg.hf_name, type(e).__name__)
        return None
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    return (_convert_distilbert(params, sd) if model_key == "distilbert"
            else _convert_bert(params, sd))


def _copy_dense(dst: dict, w: np.ndarray, b: np.ndarray) -> dict:
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _split_heads(w: np.ndarray, b: np.ndarray, heads: int) -> dict:
    d = w.shape[1]
    hd = w.shape[0] // heads
    return {"kernel": jnp.asarray(w.T.reshape(d, heads, hd)),
            "bias": jnp.asarray(b.reshape(heads, hd))}


def _merge_heads(w: np.ndarray, b: np.ndarray, heads: int) -> dict:
    """HF out-projection [d_out, d_in] -> Flax attn 'out' kernel
    [heads, head_dim, d_out]. HF computes y = x @ W.T, so the Flax kernel is
    W.T reshaped over the (flattened-head) input dimension."""
    d_out, d_in = w.shape
    hd = d_in // heads
    return {"kernel": jnp.asarray(w.T.reshape(heads, hd, d_out)),
            "bias": jnp.asarray(b)}


def _convert_distilbert(params: dict, sd: dict) -> dict:  # pragma: no cover
    import copy

    p = copy.deepcopy(params)
    heads = DISTILBERT.num_heads
    p["word_embeddings"]["embedding"] = jnp.asarray(
        sd["embeddings.word_embeddings.weight"])
    p["position_embeddings"]["embedding"] = jnp.asarray(
        sd["embeddings.position_embeddings.weight"])
    p["embed_ln"] = {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
                     "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"])}
    for i in range(DISTILBERT.num_layers):
        pre = f"transformer.layer.{i}"
        lp = p[f"layer{i}"]
        lp["attn"]["query"] = _split_heads(
            sd[f"{pre}.attention.q_lin.weight"], sd[f"{pre}.attention.q_lin.bias"], heads)
        lp["attn"]["key"] = _split_heads(
            sd[f"{pre}.attention.k_lin.weight"], sd[f"{pre}.attention.k_lin.bias"], heads)
        lp["attn"]["value"] = _split_heads(
            sd[f"{pre}.attention.v_lin.weight"], sd[f"{pre}.attention.v_lin.bias"], heads)
        lp["attn"]["out"] = _merge_heads(
            sd[f"{pre}.attention.out_lin.weight"],
            sd[f"{pre}.attention.out_lin.bias"], heads)
        lp["attn_ln"] = {"scale": jnp.asarray(sd[f"{pre}.sa_layer_norm.weight"]),
                         "bias": jnp.asarray(sd[f"{pre}.sa_layer_norm.bias"])}
        lp["ffn_in"] = _copy_dense({}, sd[f"{pre}.ffn.lin1.weight"],
                                   sd[f"{pre}.ffn.lin1.bias"])
        lp["ffn_out"] = _copy_dense({}, sd[f"{pre}.ffn.lin2.weight"],
                                    sd[f"{pre}.ffn.lin2.bias"])
        lp["ffn_ln"] = {"scale": jnp.asarray(sd[f"{pre}.output_layer_norm.weight"]),
                        "bias": jnp.asarray(sd[f"{pre}.output_layer_norm.bias"])}
    return p


def _convert_bert(params: dict, sd: dict) -> dict:  # pragma: no cover
    import copy

    p = copy.deepcopy(params)
    heads = TINYBERT.num_heads
    p["word_embeddings"]["embedding"] = jnp.asarray(
        sd["embeddings.word_embeddings.weight"])
    p["position_embeddings"]["embedding"] = jnp.asarray(
        sd["embeddings.position_embeddings.weight"])
    p["token_type_embeddings"]["embedding"] = jnp.asarray(
        sd["embeddings.token_type_embeddings.weight"])
    p["embed_ln"] = {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
                     "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"])}
    for i in range(TINYBERT.num_layers):
        pre = f"encoder.layer.{i}"
        lp = p[f"layer{i}"]
        lp["attn"]["query"] = _split_heads(
            sd[f"{pre}.attention.self.query.weight"],
            sd[f"{pre}.attention.self.query.bias"], heads)
        lp["attn"]["key"] = _split_heads(
            sd[f"{pre}.attention.self.key.weight"],
            sd[f"{pre}.attention.self.key.bias"], heads)
        lp["attn"]["value"] = _split_heads(
            sd[f"{pre}.attention.self.value.weight"],
            sd[f"{pre}.attention.self.value.bias"], heads)
        lp["attn"]["out"] = _merge_heads(
            sd[f"{pre}.attention.output.dense.weight"],
            sd[f"{pre}.attention.output.dense.bias"], heads)
        lp["attn_ln"] = {
            "scale": jnp.asarray(sd[f"{pre}.attention.output.LayerNorm.weight"]),
            "bias": jnp.asarray(sd[f"{pre}.attention.output.LayerNorm.bias"])}
        lp["ffn_in"] = _copy_dense({}, sd[f"{pre}.intermediate.dense.weight"],
                                   sd[f"{pre}.intermediate.dense.bias"])
        lp["ffn_out"] = _copy_dense({}, sd[f"{pre}.output.dense.weight"],
                                    sd[f"{pre}.output.dense.bias"])
        lp["ffn_ln"] = {"scale": jnp.asarray(sd[f"{pre}.output.LayerNorm.weight"]),
                        "bias": jnp.asarray(sd[f"{pre}.output.LayerNorm.bias"])}
    return p
