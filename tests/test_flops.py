"""Analytic 2*MAC FLOP counter (vlp_tpu/utils/flops.py).

These pins are what make the benchmark suite's ``analytic_mfu_pct`` a
number that can be trusted: dots and convs against closed-form counts,
whole towers against timm's published GMACs (reference models come from
timm / HF — OnlyImagingModule.py:25-32, VisionLanguageModule.py:24-43).
"""
import jax
import jax.numpy as jnp
import pytest
from jax import lax

from vlp_tpu.utils.flops import analytic_flops


def _sds(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


class TestClosedForm:
    def test_matmul(self):
        f = analytic_flops(lambda a, b: a @ b, _sds((128, 128)),
                           _sds((128, 128)))
        assert f == 2 * 128 ** 3

    def test_batched_dot_general(self):
        # [B, M, K] @ [B, K, N] -> 2 * B * M * N * K
        def f(a, b):
            return lax.dot_general(a, b, (((2,), (1,)), ((0,), (0,))))

        got = analytic_flops(f, _sds((4, 16, 32)), _sds((4, 32, 8)))
        assert got == 2 * 4 * 16 * 8 * 32

    def test_conv(self):
        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        got = analytic_flops(conv, _sds((1, 224, 224, 3)),
                             _sds((3, 3, 3, 64)))
        assert got == 2 * 224 * 224 * 64 * 3 * 3 * 3

    def test_grouped_conv(self):
        # depthwise: feature_group_count = C, each output channel sees
        # C_in/groups = 1 input channel
        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", feature_group_count=8,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        got = analytic_flops(conv, _sds((1, 16, 16, 8)),
                             _sds((3, 3, 1, 8)))
        assert got == 2 * 16 * 16 * 8 * 3 * 3 * 1

    def test_strided_conv_counts_output_positions(self):
        def conv(x, w):
            return lax.conv_general_dilated(
                x, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        got = analytic_flops(conv, _sds((1, 224, 224, 3)),
                             _sds((7, 7, 3, 64)))
        assert got == 2 * 112 * 112 * 64 * 7 * 7 * 3

    def test_scan_multiplies_by_length(self):
        def f(a):
            def body(c, _):
                return c @ c, None

            out, _ = lax.scan(body, a, None, length=5)
            return out

        assert analytic_flops(f, _sds((64, 64))) == 5 * 2 * 64 ** 3

    def test_elementwise_is_free(self):
        # convention: only dots/convs count
        assert analytic_flops(lambda x: jnp.tanh(x) + x * 2,
                              _sds((1024, 1024))) == 0

    def test_recurses_into_jit_and_remat(self):
        inner = jax.checkpoint(lambda a: a @ a)
        f = analytic_flops(jax.jit(lambda a: inner(a) @ a), _sds((32, 32)))
        assert f == 2 * 2 * 32 ** 3


class TestTowersMatchTimm:
    """timm's published GMACs (2*MAC FLOPs = 2x those) for the exact
    architectures the reference instantiates."""

    def test_vit_base(self):
        from vlp_tpu.models.vit import vit_base_patch16_224

        m = vit_base_patch16_224(num_classes=2)
        x = _sds((1, 224, 224, 3), jnp.bfloat16)
        v = jax.eval_shape(lambda: m.init(jax.random.key(0),
                                          jnp.zeros(x.shape, x.dtype)))
        got = analytic_flops(lambda p, xx: m.apply(p, xx), v, x)
        assert got / 1e9 == pytest.approx(2 * 17.58, rel=0.02)

    def test_nest_small(self):
        from vlp_tpu.models.nest import NesT

        m = NesT()
        x = _sds((1, 224, 224, 3), jnp.bfloat16)
        v = jax.eval_shape(lambda: m.init(jax.random.key(0),
                                          jnp.zeros(x.shape, x.dtype)))
        got = analytic_flops(lambda p, xx: m.apply(p, xx), v, x)
        assert got / 1e9 == pytest.approx(2 * 10.35, rel=0.02)

    def test_resnet34_1ch(self):
        from vlp_tpu.models import resnet

        m = resnet.resnet34(num_classes=2)
        x = _sds((1, 224, 224, 1), jnp.bfloat16)
        v = jax.eval_shape(lambda: m.init(jax.random.key(0),
                                          jnp.zeros(x.shape, x.dtype)))
        got = analytic_flops(lambda p, xx: m.apply(p, xx, train=False), v, x)
        # timm resnet34 = 3.67 GMACs at 3ch; the 1ch stem saves
        # 112^2*64*49*2 MACs
        expected = 2 * (3.67e9 - 112 * 112 * 64 * 49 * 2)
        assert got == pytest.approx(expected, rel=0.02)
