"""Model unit tests: shapes, feature/head split, gradient flow, BERT
masking, VLM embedding contract. Tiny configurations keep single-core CPU
compile times tractable; full-size architectures are exercised by the CLI
smoke (experiment=smoke_*) and on TPU by bench.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.models.bert import TEXT_CONFIGS, BertConfig, BertEncoder
from vlp_tpu.models.heads import ClinicalMLP, FusionHead
from vlp_tpu.models.nest import NesT, blockify, unblockify
from vlp_tpu.models.registry import BACKBONE_FEATURE_DIMS, create_backbone
from vlp_tpu.models.resnet import ResNet, BasicBlock
from vlp_tpu.models.vit import ViT


class TestResNet:
    def test_tiny_shapes_and_split(self):
        m = ResNet(stage_sizes=(1, 1), block_cls=BasicBlock,
                   num_classes=1, dtype=jnp.float32)
        x = jnp.zeros((2, 32, 32, 3))
        vars_ = m.init(jax.random.key(0), x, train=False)
        out = m.apply(vars_, x, train=False)
        assert out.shape == (2, 1)
        feats = m.apply(vars_, x, False, method="forward_features")
        assert feats.shape == (2, 128)  # 64 * 2^(2-1)
        head = m.apply(vars_, feats, False, method="forward_head")
        assert head.shape == (2, 1)

    def test_batch_stats_update_in_train(self):
        m = ResNet(stage_sizes=(1,), block_cls=BasicBlock, dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (4, 16, 16, 1))
        vars_ = m.init(jax.random.key(0), x, train=False)
        _, mutated = m.apply(vars_, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(vars_["batch_stats"])
        after = jax.tree.leaves(mutated["batch_stats"])
        assert any(float(jnp.abs(a - b).sum()) > 0
                   for a, b in zip(after, before))

    def test_gradients_flow(self):
        m = ResNet(stage_sizes=(1,), block_cls=BasicBlock, num_classes=1,
                   dtype=jnp.float32)
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 1))
        vars_ = m.init(jax.random.key(0), x, train=False)

        def loss(p):
            out, _ = m.apply({"params": p,
                              "batch_stats": vars_["batch_stats"]}, x,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).mean()

        grads = jax.grad(loss)(vars_["params"])
        gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
        assert gsum > 0


class TestViT:
    def test_tiny_vit(self):
        m = ViT(patch_size=8, hidden_dim=32, depth=2, num_heads=4,
                num_classes=0, dtype=jnp.float32)
        # pos_embed sized for 224 grid; use 224-compatible small? patch 8 ->
        # pos_embed expects (224/8)^2+1. Use matching input 224 is too big
        # for CPU tests, so rebuild with custom: patch 8 over 32px -> 16+1.
        # ViT hardcodes 224 in pos_embed; test that contract at patch 16:
        m = ViT(patch_size=56, hidden_dim=32, depth=1, num_heads=4,
                num_classes=2, dtype=jnp.float32)
        x = jnp.zeros((2, 224, 224, 3))
        vars_ = m.init(jax.random.key(0), x, train=False)
        out = m.apply(vars_, x, train=False)
        assert out.shape == (2, 2)


class TestNesT:
    def test_blockify_roundtrip(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        b = blockify(x, 4)
        assert b.shape == (2, 4, 16, 3)
        back = unblockify(b, 4, 8, 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_tiny_nest_forward(self):
        m = NesT(img_size=32, patch_size=4, embed_dims=(16, 32),
                 num_heads=(2, 2), depths=(1, 1), block_size=4,
                 num_classes=3, dtype=jnp.float32)
        x = jnp.zeros((2, 32, 32, 3))
        vars_ = m.init(jax.random.key(0), x, train=False)
        out = m.apply(vars_, x, train=False)
        assert out.shape == (2, 3)
        feats = m.apply(vars_, x, False, method="forward_features")
        assert feats.shape == (2, 32)

    def test_nest_small_config(self):
        from vlp_tpu.models.nest import nest_small

        m = nest_small(dtype=jnp.float32)
        assert m.embed_dims == (96, 192, 384)
        assert m.depths == (2, 2, 20)
        assert m.num_heads == (3, 6, 12)


class TestBert:
    def _tiny(self):
        return BertConfig(vocab_size=100, hidden_size=16, num_layers=2,
                          num_heads=2, intermediate_size=32, max_position=32,
                          use_token_type=True)

    def test_cls_output_shape(self):
        m = BertEncoder(self._tiny(), dtype=jnp.float32)
        ids = jnp.ones((3, 10), jnp.int32)
        mask = jnp.ones((3, 10), jnp.int32)
        vars_ = m.init(jax.random.key(0), ids, mask)
        out = m.apply(vars_, ids, mask)
        assert out.shape == (3, 16)

    def test_padding_mask_matters(self):
        """Padded tokens must not affect the CLS embedding."""
        m = BertEncoder(self._tiny(), dtype=jnp.float32)
        rng = np.random.default_rng(0)
        ids_a = jnp.asarray(rng.integers(1, 100, (1, 10)), jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 1, 0, 0, 0, 0, 0]], jnp.int32)
        vars_ = m.init(jax.random.key(0), ids_a, mask)
        out_a = m.apply(vars_, ids_a, mask)
        # change ONLY padded positions
        ids_b = ids_a.at[0, 7].set(55)
        out_b = m.apply(vars_, ids_b, mask)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-5)
        # changing a VALID position does change the output
        ids_c = ids_a.at[0, 2].set(55)
        out_c = m.apply(vars_, ids_c, mask)
        assert float(jnp.abs(out_a - out_c).max()) > 1e-5

    def test_reference_configs(self):
        assert TEXT_CONFIGS["distilbert"].hidden_size == 768
        assert TEXT_CONFIGS["distilbert"].num_layers == 6
        assert TEXT_CONFIGS["tinybert"].hidden_size == 312
        assert TEXT_CONFIGS["tinybert"].num_layers == 4
        assert TEXT_CONFIGS["tinybert"].intermediate_size == 1200


class TestHeads:
    def test_clinical_mlp_shape(self):
        m = ClinicalMLP()
        x = jnp.zeros((4, 15))
        vars_ = m.init(jax.random.key(0), x, train=False)
        out = m.apply(vars_, x, train=False)
        assert out.shape == (4, 10)

    def test_fusion_head(self):
        m = FusionHead()
        vars_ = m.init(jax.random.key(0), jnp.zeros((4, 10)),
                       jnp.zeros((4, 10)))
        out = m.apply(vars_, jnp.ones((4, 10)), jnp.ones((4, 10)))
        assert out.shape == (4, 1)


class TestRegistry:
    def test_allowlist_matches_reference(self):
        # reference OnlyImagingModule.py:25-32
        for name in ("resnet18", "resnet34", "resnet50", "nest_small",
                     "vit_base_patch16_224", "vit_large_patch16_224",
                     "resnet50-res512-all"):
            assert name in BACKBONE_FEATURE_DIMS

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="Unknown backbone"):
            create_backbone("resnet101")

    def test_feature_dims(self):
        assert BACKBONE_FEATURE_DIMS["resnet34"] == 512
        assert BACKBONE_FEATURE_DIMS["resnet50"] == 2048
        assert BACKBONE_FEATURE_DIMS["nest_small"] == 384


class TestS2DStem:
    def test_s2d_shapes_match_conv7(self):
        from vlp_tpu.models.resnet import resnet18

        x = jnp.zeros((2, 64, 64, 3))
        for stem in ("conv7", "s2d"):
            m = resnet18(num_classes=1, dtype=jnp.float32, stem=stem)
            v = m.init(jax.random.key(0), x, train=False)
            assert m.apply(v, x, train=False).shape == (2, 1)
            feats = m.apply(v, x, False, method="forward_features")
            assert feats.shape == (2, 512)

    def test_s2d_gradients_flow(self):
        from vlp_tpu.models.resnet import resnet18

        m = resnet18(num_classes=1, dtype=jnp.float32, stem="s2d")
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 1))
        v = m.init(jax.random.key(0), x, train=False)

        def loss(p):
            out, _ = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"])
            return (out ** 2).mean()

        grads = jax.grad(loss)(v["params"])
        assert sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)) > 0


class TestRemat:
    """model.remat wraps each encoder block in jax.checkpoint (vit.py):
    values AND gradients must equal the plain path exactly — remat changes
    residual storage, not math. Covers the Pallas-kernel interaction via
    the interpreter (custom-VJP kernels inside a checkpointed block)."""

    def _vit(self, remat, img_size=56, fused=None):
        kw = dict(patch_size=8, hidden_dim=32, depth=2, num_heads=4,
                  num_classes=2, dtype=jnp.float32, img_size=img_size,
                  remat=remat)
        if fused is not None:
            kw["fused_attention"] = fused
        return ViT(**kw)

    def test_vit_values_and_grads_match(self):
        x = jax.random.normal(jax.random.key(1), (2, 56, 56, 3))
        y = jnp.asarray([0.0, 1.0])
        m0, m1 = self._vit(False), self._vit(True)
        p = m0.init(jax.random.key(0), x, train=False)

        def loss(m):
            def f(p, x):
                out = m.apply(p, x, train=False)
                return jnp.mean((out.sum(-1) - y) ** 2)
            return f

        np.testing.assert_allclose(
            np.asarray(m1.apply(p, x, train=False)),
            np.asarray(m0.apply(p, x, train=False)), atol=1e-6)
        g0 = jax.grad(loss(m0))(p, x)
        g1 = jax.grad(loss(m1))(p, x)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6, err_msg=str(ka))

    def test_vit_remat_with_pallas_interpret(self, monkeypatch):
        monkeypatch.setenv("VLP_PALLAS_INTERPRET", "1")
        x = jax.random.normal(jax.random.key(2), (2, 56, 56, 3))
        m = self._vit(True, fused=True)
        p = m.init(jax.random.key(0), x, train=False)

        def f(p, x):
            return jnp.mean(m.apply(p, x, train=False) ** 2)

        g = jax.grad(f)(p, x)
        gsum = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert np.isfinite(gsum) and gsum > 0

    def test_nest_remat_values_and_grads_match(self):
        from vlp_tpu.models.nest import NesT

        x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
        kw = dict(img_size=32, patch_size=4, embed_dims=(8, 16),
                  num_heads=(2, 2), depths=(1, 1), block_size=4,
                  num_classes=2, dtype=jnp.float32)
        m0 = NesT(remat=False, **kw)
        m1 = NesT(remat=True, **kw)
        p = m0.init(jax.random.key(0), x, train=False)

        def f(m):
            return lambda p, x: jnp.mean(m.apply(p, x, train=False) ** 2)

        np.testing.assert_allclose(
            np.asarray(m1.apply(p, x, train=False)),
            np.asarray(m0.apply(p, x, train=False)), atol=1e-6)
        g0, g1 = jax.grad(f(m0))(p, x), jax.grad(f(m1))(p, x)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6, err_msg=str(ka))
