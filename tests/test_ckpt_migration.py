"""Checkpoint attention-layout migration (ADVICE r2, medium).

Checkpoints saved with model.fused_attention=True store attn/{qkv,out}
(packed [D,3D] kernel); unfused ones store flax attn/{query,key,value,out}
([D,H,Dh] kernels). Restoring across the flag must transparently convert —
the two layouts are exact linear repackagings — and a real mismatch must
raise an error that names model.fused_attention.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlp_tpu.models.vit import EncoderBlock
from vlp_tpu.utils import checkpoint as C


def _blocks():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 24)),
                    jnp.float32)
    fused = EncoderBlock(num_heads=3, dtype=jnp.float32,
                         fused_attention=True)
    unfused = EncoderBlock(num_heads=3, dtype=jnp.float32,
                           fused_attention=False)
    return x, fused, unfused


@pytest.mark.parametrize("direction", ["fused_to_unfused",
                                       "unfused_to_fused"])
def test_cross_layout_restore_value_parity(tmp_path, direction):
    x, fused, unfused = _blocks()
    src, dst = (fused, unfused) if direction == "fused_to_unfused" \
        else (unfused, fused)
    p_src = src.init(jax.random.key(0), x)["params"]
    p_dst_example = dst.init(jax.random.key(1), x)["params"]
    path = str(tmp_path / "ck")
    C.save(path, {"params": p_src})
    restored = C.restore(path, {"params": p_dst_example})["params"]
    # the restored params must drive dst to EXACTLY src's function
    out_src = src.apply({"params": p_src}, x)
    out_dst = dst.apply({"params": restored}, x)
    np.testing.assert_allclose(np.asarray(out_dst), np.asarray(out_src),
                               atol=1e-5)


def test_same_layout_restore_untouched(tmp_path):
    x, fused, _ = _blocks()
    p = fused.init(jax.random.key(0), x)["params"]
    path = str(tmp_path / "ck")
    C.save(path, {"params": p})
    restored = C.restore(path, {"params": p})["params"]
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_backbone_migrates():
    x, fused, unfused = _blocks()
    p_f = fused.init(jax.random.key(0), x)["params"]
    p_u = unfused.init(jax.random.key(1), x)["params"]
    grafted = C.graft_backbone({"backbone": p_u, "head": {"w": jnp.ones(3)}},
                               p_f)
    out_graft = unfused.apply({"params": grafted["backbone"]}, x)
    out_src = fused.apply({"params": p_f}, x)
    np.testing.assert_allclose(np.asarray(out_graft), np.asarray(out_src),
                               atol=1e-5)


def test_true_mismatch_names_the_flag():
    x, fused, unfused = _blocks()
    p_f = fused.init(jax.random.key(0), x)["params"]
    p_u = unfused.init(jax.random.key(1), x)["params"]
    with pytest.raises(ValueError, match="fused_attention"):
        C._check_same_structure(p_f, p_u, "<test>")
