"""Tests for the secondary model families: multi-scale, variable-ROI,
baseline, cascade, class-specific, auxiliary task, head variants V1/V3/V4."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.models.baseline import ROISegmentationModel
from human_instance_segmentation_tpu.models.extras import (
    AuxiliaryFgBgHead,
    CascadeSegmentationHead,
    ClassSpecificDecoder,
    cascade_loss,
    multi_task_loss,
)
from human_instance_segmentation_tpu.models.heads import (
    HierarchicalHeadV1,
    HierarchicalHeadV3,
    HierarchicalHeadV4,
)
from human_instance_segmentation_tpu.models.multiscale import (
    FEATURE_SPECS,
    ConvFeaturePyramid,
    MultiScaleSegmentationModel,
    VariableROISegmentationModel,
)

RNG = jax.random.PRNGKey(0)
ROIS = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8], [0.0, 0.1, 0.1, 0.5, 0.9]])


@pytest.mark.slow
def test_conv_feature_pyramid_specs():
    m = ConvFeaturePyramid(layers=("layer_3", "layer_22", "layer_34"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(RNG, x, train=False)
    feats = m.apply(params, x, train=False)
    for layer, f in feats.items():
        ch, stride = FEATURE_SPECS[layer]
        assert f.shape == (1, 64 // stride, 64 // stride, ch), layer


@pytest.mark.slow
def test_multiscale_model_all_fusions():
    for method in ("adaptive", "concat", "sum"):
        m = MultiScaleSegmentationModel(
            roi_size=(14, 14), mask_size=(28, 28), mid_channels=32,
            fusion_method=method)
        x = jnp.zeros((1, 64, 64, 3))
        params = m.init(RNG, x, ROIS, train=False)
        logits, aux = m.apply(params, x, ROIS, train=False)
        assert logits.shape == (2, 28, 28, 3), method


@pytest.mark.slow
def test_multiscale_head_only_external_features():
    m = MultiScaleSegmentationModel(roi_size=(14, 14), mask_size=(28, 28), mid_channels=32)
    feats = {
        "layer_3": jnp.zeros((1, 16, 16, 256)),
        "layer_22": jnp.zeros((1, 8, 8, 512)),
        "layer_34": jnp.zeros((1, 8, 8, 1024)),
    }
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(RNG, x, ROIS, train=False, features=feats)
    logits, _ = m.apply(params, x, ROIS, train=False, features=feats)
    assert logits.shape == (2, 28, 28, 3)
    # pyramid params absent when features are supplied externally
    assert "pyramid" not in params["params"]


@pytest.mark.slow
def test_variable_roi_model():
    m = VariableROISegmentationModel(
        roi_sizes={"layer_3": 56, "layer_22": 42, "layer_34": 28},
        mask_size=(56, 56), mid_channels=32, use_rgb_enhancement=True)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(RNG, x, ROIS, train=False)
    logits, aux = m.apply(params, x, ROIS, train=False)
    assert logits.shape == (2, 56, 56, 3)
    assert aux["roi_features"].shape == (2, 28, 28, 32)


@pytest.mark.slow
def test_baseline_model():
    m = ROISegmentationModel(roi_size=(14, 14), mask_size=(28, 28))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(RNG, x, ROIS, train=False)
    logits, _ = m.apply(params, x, ROIS, train=False)
    assert logits.shape == (2, 28, 28, 3)


@pytest.mark.slow
def test_head_variants():
    feats = jnp.zeros((2, 14, 14, 24))
    for cls, kw in ((HierarchicalHeadV1, {}),
                    (HierarchicalHeadV3, dict(base_channels=8, depth=2)),
                    (HierarchicalHeadV4, {})):
        m = cls(mid_channels=32, mask_size=(28, 28), **kw)
        params = m.init(RNG, feats, train=False)
        logits, aux = m.apply(params, feats, train=False)
        assert logits.shape == (2, 28, 28, 3), cls.__name__
        assert aux["bg_fg_logits"].shape == (2, 28, 28, 2), cls.__name__


def test_cascade_head_and_loss():
    m = CascadeSegmentationHead(mid_channels=32)
    feats = jnp.zeros((2, 14, 14, 24))
    params = m.init(RNG, feats, train=False)
    logits, aux = m.apply(params, feats, train=False)
    assert logits.shape == (2, 14, 14, 3)
    stages = aux["stage_outputs"]
    assert len(stages) == 3
    targets = jnp.zeros((2, 14, 14), jnp.int32)
    total, metrics = cascade_loss(stages, targets)
    assert np.isfinite(float(total))
    assert "stage2_loss" in metrics


def test_class_specific_decoder():
    m = ClassSpecificDecoder(mid_channels=16)
    feats = jnp.zeros((2, 14, 14, 24))
    params = m.init(RNG, feats, train=False)
    out = m.apply(params, feats, train=False)
    assert out.shape == (2, 14, 14, 3)


def test_auxiliary_head_and_multitask_loss():
    m = AuxiliaryFgBgHead(mid_channels=16)
    feats = jnp.zeros((2, 14, 14, 24))
    params = m.init(RNG, feats, train=False)
    aux_logits = m.apply(params, feats, train=False)
    assert aux_logits.shape == (2, 14, 14, 1)
    targets = jnp.ones((2, 28, 28), jnp.int32)
    total, metrics = multi_task_loss(jnp.asarray(1.0), aux_logits, targets,
                                     aux_weight=0.3, pos_weight=2.27)
    assert float(total) > 1.0
    assert np.isfinite(float(metrics["aux_fg_bg_loss"]))


def test_feature_pyramid_fusion():
    from human_instance_segmentation_tpu.models.multiscale import FeaturePyramidFusion

    feats = {
        "layer_3": jnp.zeros((1, 16, 16, 256)),
        "layer_22": jnp.zeros((1, 8, 8, 512)),
        "layer_34": jnp.zeros((1, 8, 8, 1024)),
    }
    for method in ("fpn", "concat", "sum"):
        m = FeaturePyramidFusion(out_channels=32, fusion_method=method)
        params = m.init(RNG, feats)
        out = m.apply(params, feats)
        assert set(out) == set(feats), method
        for layer, f in out.items():
            assert f.shape[:3] == feats[layer].shape[:3]
            assert f.shape[-1] == 32
