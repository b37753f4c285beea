"""Encoder S2D front (composed-kernel stem/stage-0/stage-1-entry): exactness.

The serving-only ``s2d_front`` path computes the encoder's lane-starved
high-resolution blocks in S2D(2) phase form via composed kernels
(ops/s2d.py: stem_kernel_s2d, dw_kernel_s2d, dw_stride2_exit_kernel_s2d,
conv1x1_kernel_s2d) with eval BNs folded in. It must match the plain path
numerically and share its exact parameter tree (checkpoints swap freely).

Reference semantics: timm-EfficientNet encoder inside the frozen smp UNet
(/root/reference/src/human_edge_detection/advanced/
hierarchical_segmentation_unet.py:1708-1916).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.efficientnet import (
    EfficientNetEncoder, MBConv)
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
from human_instance_segmentation_tpu.ops.s2d import depth_to_space, space_to_depth


def test_mbconv_s2d_inout_matches_plain(rng):
    """Stride-1 k3 block (stage-0 shape): S2D in/out == plain, same tree."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    plain = MBConv(out_channels=8, expand_ratio=1, kernel=3, stride=1)
    s2d = MBConv(out_channels=8, expand_ratio=1, kernel=3, stride=1,
                 s2d_in=True, s2d_out=True)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    a = plain.apply(params, x, train=False)
    b = s2d.apply(params, space_to_depth(x, 2), train=False)
    np.testing.assert_allclose(np.asarray(depth_to_space(b, 2)),
                               np.asarray(a), atol=1e-5, rtol=1e-5)


def test_mbconv_s2d_exit_matches_plain(rng):
    """Stride-2 k3 expand block (stage-1 entry): S2D in, plain out."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    plain = MBConv(out_channels=12, expand_ratio=6, kernel=3, stride=2)
    s2d = MBConv(out_channels=12, expand_ratio=6, kernel=3, stride=2,
                 s2d_in=True, s2d_out=False)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    a = plain.apply(params, x, train=False)
    b = s2d.apply(params, space_to_depth(x, 2), train=False)
    assert b.shape == a.shape
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


def test_mbconv_s2d_stride2_inform_matches_plain(rng):
    """Stride-2 k3 block staying in S2D form (stage-1 entry, extended
    front): output is the S2D(2) form of the plain half-res output."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    plain = MBConv(out_channels=12, expand_ratio=6, kernel=3, stride=2)
    s2d = MBConv(out_channels=12, expand_ratio=6, kernel=3, stride=2,
                 s2d_in=True, s2d_out=True)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    a = plain.apply(params, x, train=False)
    b = s2d.apply(params, space_to_depth(x, 2), train=False)
    np.testing.assert_allclose(np.asarray(depth_to_space(b, 2)),
                               np.asarray(a), atol=1e-5, rtol=1e-5)


def test_mbconv_s2d_k5_exit_matches_plain(rng):
    """Stride-2 k5 expand block (stage-2 entry): S2D in, plain out."""
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 8)), jnp.float32)
    plain = MBConv(out_channels=10, expand_ratio=6, kernel=5, stride=2)
    s2d = MBConv(out_channels=10, expand_ratio=6, kernel=5, stride=2,
                 s2d_in=True, s2d_out=False)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    a = plain.apply(params, x, train=False)
    b = s2d.apply(params, space_to_depth(x, 2), train=False)
    assert b.shape == a.shape
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_encoder_s2d_front_matches_plain(rng):
    x = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    plain = EfficientNetEncoder(variant="b0")
    s2d = EfficientNetEncoder(variant="b0", s2d_front=True)
    params = plain.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                s2d.init(jax.random.PRNGKey(0), x, train=False)))
    fa = plain.apply(params, x, train=False)
    fb = s2d.apply(params, x, train=False)
    # stem tap comes back in S2D(2) phase form
    np.testing.assert_allclose(np.asarray(depth_to_space(fb[0], 2)),
                               np.asarray(fa[0]), atol=1e-5, rtol=1e-5)
    for a, b in zip(fa[1:], fb[1:]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_unet_s2d_front_matches_plain(rng):
    """Full stage-1 UNet: s2d_front + fused tail == plain path, same tree."""
    images = jnp.asarray(rng.random((1, 64, 96, 3)), jnp.float32)
    base = PeopleSegmentationUNet(encoder_variant="b0")
    fast = PeopleSegmentationUNet(encoder_variant="b0", fused_tail=3,
                                  encoder_s2d_front=True)
    params = base.init(jax.random.PRNGKey(0), images, train=False)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                fast.init(jax.random.PRNGKey(0), images, train=False)))
    a = base.apply(params, images, train=False)
    b = fast.apply(params, images, train=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_unet_s2d_front_unfused_decoder_fallback(rng):
    """s2d_front with fused_tail=0: the S2D stem tap is materialised for
    the unfused decoder and the output still matches the plain path."""
    images = jnp.asarray(rng.random((1, 32, 48, 3)), jnp.float32)
    base = PeopleSegmentationUNet(encoder_variant="b0")
    fast = PeopleSegmentationUNet(encoder_variant="b0",
                                  encoder_s2d_front=True)
    params = base.init(jax.random.PRNGKey(0), images, train=False)
    a = base.apply(params, images, train=False)
    b = fast.apply(params, images, train=False)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               atol=5e-4, rtol=1e-4)
