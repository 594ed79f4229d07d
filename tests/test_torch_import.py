"""Torch->Flax ResNet conversion: build a synthetic torchvision-style state
dict shaped from the Flax tree, convert, and check every tensor lands in the
right leaf with the right layout."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlp_tpu.models.resnet import resnet50
from vlp_tpu.models.torch_import import convert_torchvision_resnet


def _flax_trees():
    m = resnet50(num_classes=0, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 1))
    vars_ = m.init(jax.random.key(0), x, train=False)
    return vars_["params"], vars_["batch_stats"]


def _synthetic_state_dict(params, batch_stats):
    """Reverse-map our tree into torchvision names with UNIQUE values so the
    test can verify placement."""
    sd = {}
    counter = [0.0]

    def fresh(shape):
        counter[0] += 1.0
        return np.full(shape, counter[0], np.float32)

    def conv_src(kernel):  # HWIO -> OIHW
        h, w, i, o = kernel.shape
        return fresh((o, i, h, w))

    sd["conv1.weight"] = conv_src(params["stem_conv"]["kernel"])
    for t, name in (("weight", "scale"), ("bias", "bias")):
        sd[f"bn1.{t}"] = fresh(params["stem_bn"][name].shape)
    sd["bn1.running_mean"] = fresh(batch_stats["stem_bn"]["mean"].shape)
    sd["bn1.running_var"] = fresh(batch_stats["stem_bn"]["var"].shape)
    for name, blk in params.items():
        if not name.startswith("stage"):
            continue
        stage = int(name[5]) + 1
        block = int(name.split("block")[1])
        pre = f"layer{stage}.{block}"
        k = 1
        while f"conv{k}" in blk:
            sd[f"{pre}.conv{k}.weight"] = conv_src(blk[f"conv{k}"]["kernel"])
            sd[f"{pre}.bn{k}.weight"] = fresh(blk[f"bn{k}"]["scale"].shape)
            sd[f"{pre}.bn{k}.bias"] = fresh(blk[f"bn{k}"]["bias"].shape)
            bstats = batch_stats[name][f"bn{k}"]
            sd[f"{pre}.bn{k}.running_mean"] = fresh(bstats["mean"].shape)
            sd[f"{pre}.bn{k}.running_var"] = fresh(bstats["var"].shape)
            k += 1
        if "ds_conv" in blk:
            sd[f"{pre}.downsample.0.weight"] = conv_src(blk["ds_conv"]["kernel"])
            sd[f"{pre}.downsample.1.weight"] = fresh(blk["ds_bn"]["scale"].shape)
            sd[f"{pre}.downsample.1.bias"] = fresh(blk["ds_bn"]["bias"].shape)
            sd[f"{pre}.downsample.1.running_mean"] = fresh(
                batch_stats[name]["ds_bn"]["mean"].shape)
            sd[f"{pre}.downsample.1.running_var"] = fresh(
                batch_stats[name]["ds_bn"]["var"].shape)
    return sd


class TestTorchImport:
    def test_full_conversion_placement(self):
        params, batch_stats = _flax_trees()
        sd = _synthetic_state_dict(params, batch_stats)
        new_p, new_b = convert_torchvision_resnet(sd, params, batch_stats)
        # stem conv transposed correctly: OIHW value v -> HWIO everywhere v
        v = sd["conv1.weight"][0, 0, 0, 0]
        assert float(new_p["stem_conv"]["kernel"][0, 0, 0, 0]) == v
        assert new_p["stem_conv"]["kernel"].shape == \
            params["stem_conv"]["kernel"].shape
        # a deep block's bn running stats landed
        np.testing.assert_array_equal(
            np.asarray(new_b["stage3_block2"]["bn3"]["var"]),
            sd["layer4.2.bn3.running_var"])
        # downsample mapped
        assert float(new_p["stage1_block0"]["ds_conv"]["kernel"][0, 0, 0, 0]) \
            == sd["layer2.0.downsample.0.weight"][0, 0, 0, 0]
        # untouched tree unchanged
        assert float(np.asarray(params["stem_conv"]["kernel"]).sum()) != \
            float(np.asarray(new_p["stem_conv"]["kernel"]).sum())

    def test_prefix_stripping(self):
        params, batch_stats = _flax_trees()
        sd = {f"model.{k}": v
              for k, v in _synthetic_state_dict(params, batch_stats).items()}
        new_p, _ = convert_torchvision_resnet(sd, params, batch_stats,
                                              prefix="model.")
        assert float(new_p["stem_conv"]["kernel"][0, 0, 0, 0]) == \
            sd["model.conv1.weight"][0, 0, 0, 0]

    def test_shape_mismatch_raises(self):
        params, batch_stats = _flax_trees()
        sd = _synthetic_state_dict(params, batch_stats)
        sd["conv1.weight"] = np.zeros((64, 3, 3, 3), np.float32)  # wrong HW
        with pytest.raises(ValueError, match="shape"):
            convert_torchvision_resnet(sd, params, batch_stats)

    def test_missing_key_raises(self):
        params, batch_stats = _flax_trees()
        sd = _synthetic_state_dict(params, batch_stats)
        del sd["layer3.0.conv2.weight"]
        with pytest.raises(KeyError):
            convert_torchvision_resnet(sd, params, batch_stats)
