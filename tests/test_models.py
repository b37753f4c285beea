"""Shape/behaviour tests for the model zoo (tiny sizes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.efficientnet import (
    EfficientNetEncoder,
    encoder_feature_channels,
)
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet, PeopleSegUNetWrapper
from human_instance_segmentation_tpu.models.heads import (
    EnhancedUNet,
    HierarchicalHeadV2,
    RefinedHierarchicalHead,
    PretrainedUNetGuidedHead,
    ShallowUNet,
)


@pytest.mark.slow
def test_efficientnet_b0_taps():
    m = EfficientNetEncoder(variant="b0")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    feats = m.apply(params, x, train=False)
    assert len(feats) == 5
    shapes = [f.shape for f in feats]
    assert shapes[0][1:3] == (32, 32)   # s2
    assert shapes[1][1:3] == (16, 16)   # s4
    assert shapes[2][1:3] == (8, 8)     # s8
    assert shapes[3][1:3] == (4, 4)     # s16
    assert shapes[4][1:3] == (2, 2)     # s32
    chans = tuple(s[-1] for s in shapes)
    assert chans == encoder_feature_channels("b0") == (32, 24, 40, 112, 320)


def test_efficientnet_channel_table():
    # Reference encoder out_channels for the four deployed variants
    assert encoder_feature_channels("b1") == (32, 24, 40, 112, 320)
    assert encoder_feature_channels("b3") == (40, 32, 48, 136, 384)
    assert encoder_feature_channels("b7") == (64, 48, 80, 224, 640)


@pytest.mark.slow
def test_people_seg_unet_and_wrapper():
    m = PeopleSegmentationUNet(encoder_variant="b0")
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(params, x, train=False)
    assert out.shape == (1, 64, 64, 1)

    w = PeopleSegUNetWrapper()
    wp = w.init(jax.random.PRNGKey(0), out)
    two = w.apply(wp, out)
    assert two.shape == (1, 64, 64, 2)
    # fixed [+x, -x] init
    np.testing.assert_allclose(np.asarray(two[..., 0]), np.asarray(out[..., 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(two[..., 1]), -np.asarray(out[..., 0]), atol=1e-6)


@pytest.mark.slow
def test_enhanced_unet_shapes():
    m = EnhancedUNet(base_channels=8, depth=3)
    x = jnp.zeros((2, 16, 12, 24))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(params, x, train=False)
    assert out.shape == (2, 16, 12, 2)


@pytest.mark.slow
def test_shallow_unet_shapes():
    m = ShallowUNet(base_channels=8)
    x = jnp.zeros((2, 28, 28, 16))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(params, x, train=False).shape == (2, 28, 28, 2)


@pytest.mark.slow
def test_hierarchical_head_v2():
    m = HierarchicalHeadV2(mid_channels=32, mask_size=(32, 24), base_channels=8, depth=3)
    x = jnp.zeros((3, 16, 12, 20))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = m.apply(params, x, train=False)
    assert logits.shape == (3, 32, 24, 3)
    assert aux["bg_fg_logits"].shape == (3, 32, 24, 2)
    assert aux["bg_fg_logits_low"].shape == (3, 16, 12, 2)
    assert aux["target_nontarget_logits"].shape == (3, 32, 24, 2)
    assert aux["fg_attention"].shape == (3, 16, 12, 32)
    # hierarchical combine identity: final[...,0] == bg_fg[...,0]
    np.testing.assert_allclose(
        np.asarray(logits[..., 0]), np.asarray(aux["bg_fg_logits"][..., 0]), atol=1e-6)


@pytest.mark.slow
def test_hierarchical_head_v2_attention_and_dropout():
    m = HierarchicalHeadV2(mid_channels=32, mask_size=(16, 16), base_channels=8,
                           depth=2, use_attention_module=True, dropout_rate=0.5)
    x = jnp.ones((2, 8, 8, 12))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    l1, _ = m.apply(params, x, train=False)
    l2, _ = m.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert l1.shape == l2.shape == (2, 16, 16, 3)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))  # dropout active in train


@pytest.mark.slow
def test_refined_head_aux_outputs():
    m = RefinedHierarchicalHead(
        mid_channels=32, mask_size=(32, 24), base_channels=8, depth=2,
        use_contour_detection=True, use_distance_transform=True,
    )
    x = jnp.zeros((2, 16, 12, 20))
    params = m.init(jax.random.PRNGKey(0), x, train=False)
    logits, aux = m.apply(params, x, train=False)
    assert logits.shape == (2, 32, 24, 3)
    assert aux["contours"].shape == (2, 32, 24, 1)
    assert aux["distance_mask"].shape == (2, 32, 24, 1)
    assert aux["distance_map"].shape == (2, 32, 24, 1)
    c = np.asarray(aux["contours"])
    assert (c >= 0).all() and (c <= 1).all()


@pytest.mark.slow
def test_refined_head_boundary_and_decoders():
    for flags in (dict(use_boundary_refinement=True),
                  dict(use_progressive_upsampling=True),
                  dict(use_subpixel_conv=True)):
        m = RefinedHierarchicalHead(mid_channels=16, mask_size=(16, 16),
                                    base_channels=8, depth=2, **flags)
        x = jnp.zeros((1, 8, 8, 12))
        params = m.init(jax.random.PRNGKey(0), x, train=False)
        logits, _ = m.apply(params, x, train=False)
        assert logits.shape == (1, 16, 16, 3), flags


def test_guided_head():
    m = PretrainedUNetGuidedHead(mid_channels=32, mask_size=(32, 24))
    feats = jnp.zeros((2, 16, 12, 20))
    mask2 = jnp.zeros((2, 16, 12, 2))
    params = m.init(jax.random.PRNGKey(0), feats, mask2, train=False)
    logits, aux = m.apply(params, feats, mask2, train=False)
    assert logits.shape == (2, 32, 24, 3)
    assert aux["bg_fg_logits"].shape == (2, 32, 24, 2)
    # log-prob synthesis: with zero logits P(fg)=0.5 -> both channels log(0.5)
    np.testing.assert_allclose(np.asarray(aux["bg_fg_logits"]), np.log(0.5 + 1e-7), atol=1e-5)
