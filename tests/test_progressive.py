"""Progressive feature activation + cross-model weight transfer
(training/progressive.py; reference: experiments/progressive_training.py)."""

import dataclasses
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from human_instance_segmentation_tpu.config import (
    ConfigManager, loss_config_from_experiment)
from human_instance_segmentation_tpu.training.progressive import (
    FEATURE_FLAGS, activation_epochs, active_features, gate_config,
    transfer_weights)


SCHED = {"contour_detection": 10, "distance_transform": 20,
         "boundary_aware": 30}


def test_active_features_ladder():
    assert active_features(SCHED, 0) == []
    assert active_features(SCHED, 10) == ["contour_detection"]
    assert active_features(SCHED, 25) == ["contour_detection", "distance_transform"]
    assert active_features(SCHED, 99) == sorted(SCHED)
    assert activation_epochs(SCHED) == [10, 20, 30]


def test_gate_config_disables_future_features():
    cfg = ConfigManager.get_config(
        "rgb_hierarchical_unet_v2_fullimage_pretrained_peopleseg_"
        "r64x48m64x48_disttrans_contdet_baware_progressive")
    assert cfg.training.feature_schedule == SCHED
    # base config has every scheduled feature enabled
    assert cfg.model.use_contour_detection
    assert cfg.model.use_distance_transform
    assert cfg.model.use_boundary_aware_loss

    g0 = gate_config(cfg, SCHED, epoch=0)
    assert not g0.model.use_contour_detection
    assert not g0.model.use_distance_transform
    assert not g0.model.use_boundary_aware_loss
    # base config object untouched
    assert cfg.model.use_contour_detection

    g15 = gate_config(cfg, SCHED, epoch=15)
    assert g15.model.use_contour_detection
    assert not g15.model.use_distance_transform

    g30 = gate_config(cfg, SCHED, epoch=30)
    assert g30.model.use_boundary_aware_loss

    # the gated config flows into the loss config
    l0 = loss_config_from_experiment(g0)
    l30 = loss_config_from_experiment(g30)
    assert not l0.use_contour_detection and l30.use_contour_detection
    assert not l0.use_boundary_aware_loss and l30.use_boundary_aware_loss


def test_gate_config_rejects_unknown_feature():
    cfg = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    with pytest.raises(ValueError, match="unknown progressive feature"):
        gate_config(cfg, {"warp_drive": 3}, epoch=0)


def test_gate_config_distance_loss_group():
    cfg = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    cfg = dataclasses.replace(
        cfg, distance_loss=dataclasses.replace(cfg.distance_loss, enabled=True))
    sched = {"distance_loss": 5}
    assert not gate_config(cfg, sched, 4).distance_loss.enabled
    assert gate_config(cfg, sched, 5).distance_loss.enabled
    assert loss_config_from_experiment(gate_config(cfg, sched, 4)).distance_aware is None
    assert loss_config_from_experiment(gate_config(cfg, sched, 5)).distance_aware is not None


def test_transfer_weights_exact_and_suffix():
    src = {"params": {
        "encoder": {"conv": {"kernel": jnp.ones((3, 3, 4, 8))}},
        "head": {"out": {"kernel": jnp.full((1, 1, 8, 2), 2.0),
                         "bias": jnp.ones((2,))}},
        "only_src": {"w": jnp.ones((5,))},
    }}
    dst = {"params": {
        "encoder": {"conv": {"kernel": jnp.zeros((3, 3, 4, 8))}},
        # different module prefix, same trailing (out, kernel/bias) + shape
        "new_head": {"out": {"kernel": jnp.zeros((1, 1, 8, 2)),
                             "bias": jnp.zeros((2,))}},
        "fresh": {"w": jnp.zeros((7,))},
    }}
    merged, report = transfer_weights(src, dst)
    np.testing.assert_array_equal(
        merged["params"]["encoder"]["conv"]["kernel"], 1.0)
    np.testing.assert_array_equal(
        merged["params"]["new_head"]["out"]["kernel"], 2.0)
    np.testing.assert_array_equal(merged["params"]["new_head"]["out"]["bias"], 1.0)
    # untouched leaves stay at target values
    np.testing.assert_array_equal(merged["params"]["fresh"]["w"], 0.0)
    assert report["params/encoder/conv/kernel"] == "copied"
    assert report["params/head/out/kernel"].startswith("suffix:")
    assert report["params/only_src/w"] == "missing"


def test_transfer_weights_shape_mismatch_and_strict():
    src = {"a": {"kernel": jnp.ones((2, 2))},
           "x": {"b": {"kernel": jnp.ones((3,))}}}
    dst = {"a": {"kernel": jnp.zeros((4, 4))},
           "y": {"b": {"kernel": jnp.zeros((3,))}}}
    merged, report = transfer_weights(src, dst, strict=True)
    np.testing.assert_array_equal(merged["a"]["kernel"], 0.0)  # not copied
    assert report["a/kernel"] == "shape_mismatch"
    assert report["x/b/kernel"] == "missing"  # strict: no suffix fallback
    merged2, report2 = transfer_weights(src, dst, strict=False)
    # last-two components ("b", "kernel") match across module prefixes
    np.testing.assert_array_equal(merged2["y"]["b"]["kernel"], 1.0)
    assert report2["x/b/kernel"] == "suffix:y/b/kernel"


@pytest.mark.slow
def test_transfer_between_model_families():
    """Warm-start one model family from another: shared submodules (the RGB
    extractor) transfer; family-specific heads stay at init."""
    import jax

    from human_instance_segmentation_tpu.models.assembly import (
        PureRGBHierarchicalModel, ROIPretrainedHierarchicalModel)

    kw = dict(roi_size=(16, 12), mask_size=(32, 24), image_size=(64, 64),
              feature_dim=64)
    src_model = PureRGBHierarchicalModel(**kw)
    dst_model = ROIPretrainedHierarchicalModel(
        encoder_variant="tiny", unet_decoder_channels=(32, 24, 16, 16, 8),
        **kw)
    imgs = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    sp = src_model.init(jax.random.PRNGKey(0), imgs, rois, train=False)
    dp = dst_model.init(jax.random.PRNGKey(1), imgs, rois, train=False)
    merged, report = transfer_weights(sp["params"], dp["params"])
    copied = [k for k, v in report.items() if v == "copied"]
    # the shared hierarchical head transfers across model families
    assert any(k.startswith("head/") for k in copied), report["_summary"]
    # merged tree applies cleanly in the destination model
    vars2 = dict(dp)
    vars2["params"] = merged
    logits, _ = dst_model.apply(vars2, imgs, rois, train=False)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"), reason="slow tier")
def test_loop_crosses_activation_boundary(tmp_path):
    """Tiny synthetic run crossing a feature-activation epoch: the loop
    rebuilds the loss, logs the activation, and keeps training."""
    from human_instance_segmentation_tpu.training.loop import run_training

    out = str(tmp_path / "run")
    m = run_training(
        "rgb_hierarchical_unet_v2", steps=102, synthetic=True, tiny=True,
        output_dir=out, platform="cpu",
        config_modifications={
            "model": {"use_contour_detection": True},
            "training": {"feature_schedule": {"contour_detection": 1}},
        })
    assert np.isfinite(m["total_loss"])
    logs = list(Path(out, "logs").glob("*.log"))
    text = "\n".join(p.read_text() for p in logs)
    assert "progressive activation at epoch 1" in text
    assert "contour_detection" in text
