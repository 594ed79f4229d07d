"""Structural test of the HF->Flax text-tower converters: synthetic
torch-style state dicts with DistilBERT/TinyBERT key layouts but tiny dims,
verifying name mapping, head splitting, and transposition."""
import numpy as np
import pytest

from vlp_tpu.models.bert import (
    DISTILBERT,
    TINYBERT,
    _convert_bert,
    _convert_distilbert,
    _merge_heads,
    _split_heads,
)


class TestHeadReshape:
    def test_split_heads_layout(self):
        heads, hd, d = 4, 3, 12
        w = np.arange(heads * hd * d, dtype=np.float32).reshape(heads * hd, d)
        b = np.arange(heads * hd, dtype=np.float32)
        out = _split_heads(w, b, heads)
        assert out["kernel"].shape == (d, heads, hd)
        assert out["bias"].shape == (heads, hd)
        # row j of torch weight (output unit j) lands at [:, j//hd, j%hd]
        np.testing.assert_array_equal(np.asarray(out["kernel"][:, 1, 2]),
                                      w[1 * hd + 2, :])

    def test_merge_heads_layout(self):
        heads, hd, d = 4, 3, 12
        wT = np.arange(d * heads * hd, dtype=np.float32).reshape(d, heads * hd)
        b = np.zeros(d, np.float32)
        out = _merge_heads(wT, b, heads)
        assert out["kernel"].shape == (heads, hd, d)


def _fake_params_distilbert(hidden, layers, ffn, vocab=50, pos=16):
    import jax.numpy as jnp

    heads = DISTILBERT.num_heads
    hd = hidden // heads
    p = {
        "word_embeddings": {"embedding": jnp.zeros((vocab, hidden))},
        "position_embeddings": {"embedding": jnp.zeros((pos, hidden))},
        "embed_ln": {"scale": jnp.zeros(hidden), "bias": jnp.zeros(hidden)},
    }
    for i in range(layers):
        p[f"layer{i}"] = {
            "attn": {"query": {}, "key": {}, "value": {}, "out": {}},
            "attn_ln": {},
            "ffn_in": {}, "ffn_out": {}, "ffn_ln": {},
        }
    return p


def _fake_sd_distilbert(hidden, layers, ffn, vocab=50, pos=16):
    rng = np.random.default_rng(0)
    sd = {
        "embeddings.word_embeddings.weight": rng.normal(size=(vocab, hidden)),
        "embeddings.position_embeddings.weight": rng.normal(size=(pos, hidden)),
        "embeddings.LayerNorm.weight": rng.normal(size=hidden),
        "embeddings.LayerNorm.bias": rng.normal(size=hidden),
    }
    for i in range(layers):
        pre = f"transformer.layer.{i}"
        for lin in ("q_lin", "k_lin", "v_lin", "out_lin"):
            sd[f"{pre}.attention.{lin}.weight"] = rng.normal(
                size=(hidden, hidden))
            sd[f"{pre}.attention.{lin}.bias"] = rng.normal(size=hidden)
        sd[f"{pre}.sa_layer_norm.weight"] = rng.normal(size=hidden)
        sd[f"{pre}.sa_layer_norm.bias"] = rng.normal(size=hidden)
        sd[f"{pre}.ffn.lin1.weight"] = rng.normal(size=(ffn, hidden))
        sd[f"{pre}.ffn.lin1.bias"] = rng.normal(size=ffn)
        sd[f"{pre}.ffn.lin2.weight"] = rng.normal(size=(hidden, ffn))
        sd[f"{pre}.ffn.lin2.bias"] = rng.normal(size=hidden)
        sd[f"{pre}.output_layer_norm.weight"] = rng.normal(size=hidden)
        sd[f"{pre}.output_layer_norm.bias"] = rng.normal(size=hidden)
    return {k: v.astype(np.float32) for k, v in sd.items()}


class TestDistilbertConversion:
    def test_structure_and_values(self):
        hidden, layers, ffn = 24, DISTILBERT.num_layers, 48
        params = _fake_params_distilbert(hidden, layers, ffn)
        sd = _fake_sd_distilbert(hidden, layers, ffn)
        out = _convert_distilbert(params, sd)
        np.testing.assert_array_equal(
            np.asarray(out["word_embeddings"]["embedding"]),
            sd["embeddings.word_embeddings.weight"])
        # ffn_in is transposed torch lin1
        np.testing.assert_array_equal(
            np.asarray(out["layer3"]["ffn_in"]["kernel"]),
            sd["transformer.layer.3.ffn.lin1.weight"].T)
        # attention query reshaped to [d, heads, hd]
        q = out["layer0"]["attn"]["query"]["kernel"]
        assert q.shape == (hidden, DISTILBERT.num_heads,
                           hidden // DISTILBERT.num_heads)
        np.testing.assert_array_equal(
            np.asarray(out["layer5"]["ffn_ln"]["scale"]),
            sd["transformer.layer.5.output_layer_norm.weight"])


class TestTinybertConversion:
    def test_token_type_and_layers(self):
        import jax.numpy as jnp

        hidden, ffn = 24, 36
        layers = TINYBERT.num_layers
        heads = TINYBERT.num_heads
        params = _fake_params_distilbert(hidden, layers, ffn)
        params["token_type_embeddings"] = {"embedding": jnp.zeros((2, hidden))}
        rng = np.random.default_rng(1)
        sd = {
            "embeddings.word_embeddings.weight": rng.normal(size=(50, hidden)),
            "embeddings.position_embeddings.weight": rng.normal(size=(16, hidden)),
            "embeddings.token_type_embeddings.weight": rng.normal(size=(2, hidden)),
            "embeddings.LayerNorm.weight": rng.normal(size=hidden),
            "embeddings.LayerNorm.bias": rng.normal(size=hidden),
        }
        for i in range(layers):
            pre = f"encoder.layer.{i}"
            for lin in ("query", "key", "value"):
                sd[f"{pre}.attention.self.{lin}.weight"] = rng.normal(
                    size=(hidden, hidden))
                sd[f"{pre}.attention.self.{lin}.bias"] = rng.normal(size=hidden)
            sd[f"{pre}.attention.output.dense.weight"] = rng.normal(
                size=(hidden, hidden))
            sd[f"{pre}.attention.output.dense.bias"] = rng.normal(size=hidden)
            sd[f"{pre}.attention.output.LayerNorm.weight"] = rng.normal(size=hidden)
            sd[f"{pre}.attention.output.LayerNorm.bias"] = rng.normal(size=hidden)
            sd[f"{pre}.intermediate.dense.weight"] = rng.normal(size=(ffn, hidden))
            sd[f"{pre}.intermediate.dense.bias"] = rng.normal(size=ffn)
            sd[f"{pre}.output.dense.weight"] = rng.normal(size=(hidden, ffn))
            sd[f"{pre}.output.dense.bias"] = rng.normal(size=hidden)
            sd[f"{pre}.output.LayerNorm.weight"] = rng.normal(size=hidden)
            sd[f"{pre}.output.LayerNorm.bias"] = rng.normal(size=hidden)
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
        out = _convert_bert(params, sd)
        np.testing.assert_array_equal(
            np.asarray(out["token_type_embeddings"]["embedding"]),
            sd["embeddings.token_type_embeddings.weight"])
        assert out["layer0"]["attn"]["query"]["kernel"].shape == (
            hidden, heads, hidden // heads)
        np.testing.assert_array_equal(
            np.asarray(out["layer3"]["ffn_out"]["kernel"]),
            sd["encoder.layer.3.output.dense.weight"].T)


class TestHFValueRoundtrip:
    """Value-level parity against randomly-initialized HF models built
    locally (no downloads): convert the state dict and compare CLS outputs.
    Catches layout/transpose bugs that shape-only tests pass (e.g. a
    transposed attention out-projection)."""

    def _compare(self, hf_model, our_cfg, converter, seq=12, batch=2):
        import jax
        import jax.numpy as jnp
        import torch

        from vlp_tpu.models.bert import BertEncoder

        hf_model.eval()
        sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
        rng = np.random.default_rng(0)
        ids_np = rng.integers(0, our_cfg.vocab_size, size=(batch, seq))
        mask_np = np.ones((batch, seq), dtype=np.int64)
        mask_np[1, seq // 2:] = 0  # exercise key masking
        enc = BertEncoder(our_cfg, dtype=jnp.float32)
        ids = jnp.asarray(ids_np, jnp.int32)
        mask = jnp.asarray(mask_np, jnp.int32)
        params = enc.init(jax.random.key(0), ids, mask)["params"]
        ours = np.asarray(enc.apply({"params": converter(params, sd)},
                                    ids, mask))
        with torch.no_grad():
            out = hf_model(input_ids=torch.tensor(ids_np),
                           attention_mask=torch.tensor(mask_np))
        theirs = out.last_hidden_state[:, 0].numpy()
        np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)

    def test_distilbert_cls_values_match_hf(self):
        transformers = pytest.importorskip("transformers")
        import torch

        torch.manual_seed(0)
        hf = transformers.DistilBertModel(transformers.DistilBertConfig())
        self._compare(hf, DISTILBERT, _convert_distilbert)

    def test_tinybert_cls_values_match_hf(self):
        transformers = pytest.importorskip("transformers")
        import torch

        torch.manual_seed(0)
        cfg = transformers.BertConfig(
            vocab_size=TINYBERT.vocab_size, hidden_size=TINYBERT.hidden_size,
            num_hidden_layers=TINYBERT.num_layers,
            num_attention_heads=TINYBERT.num_heads,
            intermediate_size=TINYBERT.intermediate_size, hidden_act="gelu")
        hf = transformers.BertModel(cfg, add_pooling_layer=False)
        self._compare(hf, TINYBERT, _convert_bert)
