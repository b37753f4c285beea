"""Weight-converter structure test: a synthetic smp/timm-named state_dict is
converted and must reproduce the exact param/stat tree of our UNet init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.convert_weights import (
    convert_people_seg_unet,
    convert_wrapper_output_conv,
    detect_variant_by_key_count,
    strip_prefixes,
)
from human_instance_segmentation_tpu.models.efficientnet import _B0_STAGES, VARIANTS, round_repeats
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet


def _fake_torch_sd(variant: str, flax_vars) -> dict:
    """Invert the converter mapping: build a torch-style state_dict from our
    init so converted output must equal the original tree."""
    rng = np.random.default_rng(0)
    p = flax_vars["params"]
    s = flax_vars["batch_stats"]
    sd = {}

    def conv_t(kern):
        return np.transpose(np.asarray(kern), (3, 2, 0, 1))

    def put_bn(prefix, bnp, bns):
        sd[f"{prefix}.weight"] = np.asarray(bnp["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bnp["bias"])
        sd[f"{prefix}.running_mean"] = rng.normal(size=bnp["scale"].shape).astype(np.float32)
        sd[f"{prefix}.running_var"] = np.abs(rng.normal(size=bnp["scale"].shape)).astype(np.float32) + 0.5

    enc_p, enc_s = p["encoder"], s["encoder"]
    sd["encoder.conv_stem.weight"] = conv_t(enc_p["stem_conv"]["kernel"])
    put_bn("encoder.bn1", enc_p["stem_bn"], enc_s["stem_bn"])

    _, depth, _ = VARIANTS[variant]
    for stage_i, (e, k, st, c, r) in enumerate(_B0_STAGES):
        for j in range(round_repeats(r, depth)):
            t = f"encoder.blocks.{stage_i}.{j}"
            bp = enc_p[f"stage{stage_i}_block{j}"]
            bs = enc_s[f"stage{stage_i}_block{j}"]
            if e == 1:
                sd[f"{t}.conv_dw.weight"] = conv_t(bp["dw_conv"]["kernel"])
                put_bn(f"{t}.bn1", bp["bn1"], bs["bn1"])
                sd[f"{t}.conv_pw.weight"] = conv_t(bp["project_conv"]["kernel"])
                put_bn(f"{t}.bn2", bp["bn2"], bs["bn2"])
            else:
                sd[f"{t}.conv_pw.weight"] = conv_t(bp["expand_conv"]["kernel"])
                put_bn(f"{t}.bn1", bp["bn0"], bs["bn0"])
                sd[f"{t}.conv_dw.weight"] = conv_t(bp["dw_conv"]["kernel"])
                put_bn(f"{t}.bn2", bp["bn1"], bs["bn1"])
                sd[f"{t}.conv_pwl.weight"] = conv_t(bp["project_conv"]["kernel"])
                put_bn(f"{t}.bn3", bp["bn2"], bs["bn2"])
            sd[f"{t}.se.conv_reduce.weight"] = conv_t(bp["se"]["reduce"]["kernel"])
            sd[f"{t}.se.conv_reduce.bias"] = np.asarray(bp["se"]["reduce"]["bias"])
            sd[f"{t}.se.conv_expand.weight"] = conv_t(bp["se"]["expand"]["kernel"])
            sd[f"{t}.se.conv_expand.bias"] = np.asarray(bp["se"]["expand"]["bias"])

    i = 0
    while f"decoder{i}" in p:
        for ci in (1, 2):
            sd[f"decoder.blocks.{i}.conv{ci}.0.weight"] = conv_t(p[f"decoder{i}"][f"conv{ci-1}"]["kernel"])
            put_bn(f"decoder.blocks.{i}.conv{ci}.1", p[f"decoder{i}"][f"bn{ci-1}"],
                   s[f"decoder{i}"][f"bn{ci-1}"])
        i += 1
    sd["segmentation_head.0.weight"] = conv_t(p["seg_head"]["kernel"])
    sd["segmentation_head.0.bias"] = np.asarray(p["seg_head"]["bias"])
    return sd


@pytest.mark.slow
def test_convert_round_trip_structure():
    variant = "tiny"
    model = PeopleSegmentationUNet(encoder_variant=variant,
                                   decoder_channels=(16, 16, 8, 8, 8))
    x = jnp.zeros((1, 32, 32, 3))
    flax_vars = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.PRNGKey(0))
    flax_vars = jax.device_get(flax_vars)

    sd = _fake_torch_sd(variant, flax_vars)
    converted = convert_people_seg_unet(sd, variant=variant)

    # identical tree structure
    ref_paths = set(str(p) for p, _ in jax.tree_util.tree_flatten_with_path(flax_vars["params"])[0])
    got_paths = set(str(p) for p, _ in jax.tree_util.tree_flatten_with_path(converted["params"])[0])
    assert got_paths == ref_paths

    # conv kernels round-trip exactly
    for path, leaf in jax.tree_util.tree_flatten_with_path(converted["params"])[0]:
        ref_leaf = flax_vars["params"]
        for k in path:
            ref_leaf = ref_leaf[k.key]
        assert np.asarray(leaf).shape == np.asarray(ref_leaf).shape, path
        if "kernel" in str(path):
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref_leaf))

    # converted variables run through the model
    out = model.apply(converted, x, train=False)
    assert out.shape == (1, 32, 32, 1)


def test_prefix_strip_and_variant_detect():
    sd = {"model.encoder.conv_stem.weight": 1, "unet.decoder.x": 2, "plain": 3}
    out = strip_prefixes(sd)
    assert set(out) == {"encoder.conv_stem.weight", "decoder.x", "plain"}
    few = {f"encoder.k{i}": 0 for i in range(100)}
    many = {f"encoder.k{i}": 0 for i in range(800)}
    assert detect_variant_by_key_count(few) == "b0"
    assert detect_variant_by_key_count(many) == "b7"


def test_wrapper_output_conv_conversion():
    sd = {"output_conv.weight": np.asarray([[[[1.0]]], [[[-1.0]]]], np.float32),
          "output_conv.bias": np.zeros(2, np.float32)}
    v = convert_wrapper_output_conv(sd)
    assert v["params"]["output_conv"]["kernel"].shape == (1, 1, 1, 2)
    np.testing.assert_array_equal(
        v["params"]["output_conv"]["kernel"].reshape(-1), [1.0, -1.0])
