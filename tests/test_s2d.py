"""Space-to-depth fused decoder tail: exactness vs the plain path.

The fused tail (ops/s2d.py + DecoderBlock(fused=True)) must be numerically
identical (f32) to the plain upsample->conv path it replaces, including the
border rows/cols where the edge-clamped upsample meets zero-padded convs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.ops.s2d import (
    conv3x3_s2d, conv_up_s2d, depth_to_space, space_to_depth)
from human_instance_segmentation_tpu.ops.sampling import upsample_2x_bilinear
from human_instance_segmentation_tpu.models.unet import DecoderBlock, PeopleSegmentationUNet


def _conv_same(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_s2d_round_trip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    y = space_to_depth(x, 2)
    assert y.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(y, 2)), np.asarray(x))
    # phase order: channel block (ay*2+ax)*C + c
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, 5:10]), np.asarray(x[0, 0, 1, :]))
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0, 10:15]), np.asarray(x[0, 1, 0, :]))


def test_conv3x3_s2d_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 6, 7)).astype(np.float32) * 0.2)
    want = _conv_same(x, k)
    got = depth_to_space(conv3x3_s2d(space_to_depth(x, 2), k), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_conv_up_s2d_exact_including_borders(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 4)).astype(np.float32) * 0.2)
    want = _conv_same(upsample_2x_bilinear(x), k)  # (2, 12, 16, 4)
    got = depth_to_space(conv_up_s2d(x, k), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_conv_up_s2d_nearest_exact_including_borders(rng):
    """smp-parity mode: conv3x3(F.interpolate(x, 2, mode='nearest')) as one
    composed conv — exact everywhere with NO border machinery (an
    out-of-range full-res tap maps to an out-of-range cell)."""
    from human_instance_segmentation_tpu.ops.s2d import upsample_2x_nearest

    x = jnp.asarray(rng.standard_normal((2, 6, 8, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 4)).astype(np.float32) * 0.2)
    want = _conv_same(upsample_2x_nearest(x), k)  # (2, 12, 16, 4)
    got = depth_to_space(conv_up_s2d(x, k, mode="nearest"), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    # tiny inputs route through the strips oracle — also exact
    xt = x[:, :3, :3]
    want_t = _conv_same(upsample_2x_nearest(xt), k)
    got_t = depth_to_space(conv_up_s2d(xt, k, mode="nearest"), 2)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-5, rtol=1e-5)


def test_conv_up_s2d_nested_nearest_exact(rng):
    from human_instance_segmentation_tpu.ops.s2d import (
        conv_up_s2d_nested, n4_to_plain, upsample_2x_nearest)

    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 2)).astype(np.float32) * 0.2)
    want = _conv_same(upsample_2x_nearest(x), k)          # (2, 24, 32, 2)
    from human_instance_segmentation_tpu.ops.s2d import n4_regroup_to_s2d

    got = conv_up_s2d_nested(space_to_depth(x, 2), k, mode="nearest")
    got = depth_to_space(n4_regroup_to_s2d(got), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("with_skip", [True, False])
def test_decoder_block_nearest_fused_matches_plain(rng, with_skip):
    """Nearest-mode DecoderBlock: fused S2D path == plain
    upsample-nearest -> concat -> conv path, same params."""
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10)).astype(np.float32))
    skip = (jnp.asarray(rng.standard_normal((2, 12, 16, 4)).astype(np.float32))
            if with_skip else None)
    plain = DecoderBlock(features=12, fused=False, upsample_mode="nearest")
    fused = DecoderBlock(features=12, fused=True, upsample_mode="nearest")
    variables = jax.device_get(
        plain.init(jax.random.PRNGKey(0), x, skip, train=False))
    for bn in ("bn0", "bn1"):
        variables["batch_stats"][bn]["mean"] = rng.standard_normal(12).astype(np.float32) * 0.1
        variables["batch_stats"][bn]["var"] = (rng.random(12).astype(np.float32) + 0.5)
    want = plain.apply(variables, x, skip, train=False)
    got = depth_to_space(fused.apply(variables, x, skip, train=False), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def unet_tiny():
    """One shared fast_init (tests/helpers.py) for every UNet-tail
    equivalence test below — the plain/fused/n4/nearest variants all share
    the exact same parameter tree by construction, and these tests only
    compare two serving paths of the SAME params."""
    from helpers import fast_init

    dec = (16, 16, 8, 8, 8)
    plain = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec)
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 3)).astype(np.float32))
    return dec, x, fast_init(plain, x, train=False)


def test_unet_nearest_fused_tail_matches_plain(unet_tiny):
    dec, x, variables = unet_tiny
    plain = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec,
                                   upsample_mode="nearest")
    fused = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec,
                                   upsample_mode="nearest", fused_tail=2)
    bil = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec)
    want = plain.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)
    # and the stencil actually matters: bilinear differs from nearest
    other = bil.apply(variables, x, train=False)
    assert np.abs(np.asarray(other) - np.asarray(want)).max() > 1e-4


@pytest.mark.slow
@pytest.mark.parametrize("with_skip", [True, False])
def test_decoder_block_fused_matches_plain(rng, with_skip):
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 10)).astype(np.float32))
    skip = (jnp.asarray(rng.standard_normal((2, 12, 16, 4)).astype(np.float32))
            if with_skip else None)

    plain = DecoderBlock(features=12, fused=False)
    fused = DecoderBlock(features=12, fused=True)
    variables = plain.init(jax.random.PRNGKey(0), x, skip, train=False)
    # randomise BN stats so eval-mode normalisation is non-trivial
    variables = jax.device_get(variables)
    for bn in ("bn0", "bn1"):
        variables["batch_stats"][bn]["mean"] = rng.standard_normal(12).astype(np.float32) * 0.1
        variables["batch_stats"][bn]["var"] = (rng.random(12).astype(np.float32) + 0.5)

    want = plain.apply(variables, x, skip, train=False)
    got = depth_to_space(fused.apply(variables, x, skip, train=False), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_unet_fused_tail_matches_plain():
    dec = (16, 16, 8, 8, 8)
    plain = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec)
    fused = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec,
                                   fused_tail=2)
    x = jnp.asarray(np.random.default_rng(3).random((1, 64, 64, 3)).astype(np.float32))
    variables = jax.jit(lambda r: plain.init(r, x, train=False))(jax.random.PRNGKey(0))

    want = plain.apply(variables, x, train=False)
    got = fused.apply(variables, x, train=False)
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # init with the fused module produces the identical tree (holders match)
    v2 = jax.jit(lambda r: fused.init(r, x, train=False))(jax.random.PRNGKey(0))
    p1 = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    p2 = {str(p) for p, _ in jax.tree_util.tree_flatten_with_path(v2)[0]}
    assert p1 == p2


@pytest.mark.slow
def test_flagship_fused_deployed_outputs_match_plain(rng):
    """Full deployed contract (instance + binary person-prob masks) through
    the n4 fused-tail serving path == plain path, same params. Covers the
    elementwise person_prob epilogue (models/assembly.py) end to end."""
    from human_instance_segmentation_tpu.inference import deployed_outputs
    from human_instance_segmentation_tpu.models.assembly import (
        HierarchicalInstanceSegmenter)

    kw = dict(encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
              image_size=(64, 64), base_channels=16, depth=2, mid_channels=32,
              feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8))
    plain = HierarchicalInstanceSegmenter(**kw)
    fused = HierarchicalInstanceSegmenter(**kw, fused_tail=3)
    images = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8],
                        [1.0, 0.1, 0.05, 0.6, 0.9]], jnp.float32)
    variables = jax.jit(lambda r: plain.init(r, images, rois, train=False))(
        jax.random.PRNGKey(0))

    lp, ap = plain.apply(variables, images, rois, train=False)
    lf, af = fused.apply(variables, images, rois, train=False)
    assert "person_prob_n4" in af
    inst_p, bin_p = deployed_outputs(lp, ap["full_image_logits"], rois, 1)
    inst_f, bin_f = deployed_outputs(lf, af, rois, 1)
    np.testing.assert_array_equal(np.asarray(inst_p), np.asarray(inst_f))
    np.testing.assert_allclose(np.asarray(bin_f), np.asarray(bin_p),
                               atol=2e-5, rtol=1e-4)


def test_conv3x3_strided_s2d_exact(rng):
    from human_instance_segmentation_tpu.ops.s2d import conv3x3_strided_s2d

    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 6)).astype(np.float32) * 0.2)
    want = _conv_same(x, k)
    got = depth_to_space(conv3x3_strided_s2d(x, k), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", [(8, 8, 3, 5), (12, 16, 16, 16), (16, 12, 16, 1)])
def test_conv3x3_n4_exact(rng, shape):
    """conv3x3_n4 == plain SAME 3x3 conv, evaluated wholly in N4 phase form
    (center phase matmul + 8 thin crossing terms; zero pad exact in cell
    space)."""
    from human_instance_segmentation_tpu.ops.s2d import conv3x3_n4

    h, w, ci, co = shape
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32) * 0.1
    want = _conv_same(x, k)
    got_n4 = conv3x3_n4(space_to_depth(space_to_depth(x, 2), 2), k)
    got = depth_to_space(depth_to_space(got_n4, 2), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_unet_n4_tail_matches_plain(mode, unet_tiny):
    """The N4 tail (last decoder stage + seg head entirely in phase form —
    no depth_to_space, no regroup) is exact vs the plain path, and its raw
    output is the same N4 logit contract the bucketed serving path uses."""
    from human_instance_segmentation_tpu.ops.s2d import n4_to_plain

    dec, x, variables = unet_tiny
    plain = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec,
                                   upsample_mode=mode)
    n4 = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=dec,
                                fused_tail=2, n4_tail=True, upsample_mode=mode)

    want = plain.apply(variables, x, train=False)
    got = n4.apply(variables, x, train=False)
    assert got.shape == want.shape == (1, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    form, t = n4.apply(variables, x, train=False, raw=True)
    assert form == "n4" and t.shape == (1, 16, 16, 16)
    np.testing.assert_allclose(np.asarray(n4_to_plain(t)), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
