"""Config -> loss/training plumbing (VERDICT r1 items 5 and 7): bf16
compute_dtype is honored by the train step, and TrainingConfig /
DistanceLossConfig / data_stats fields change the computed loss."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from human_instance_segmentation_tpu.config import (
    ConfigManager,
    loss_config_from_experiment,
)
from human_instance_segmentation_tpu.losses.hierarchical import (
    HierarchicalLossState,
    RefinedLossConfig,
    refined_hierarchical_loss,
)
from human_instance_segmentation_tpu.models.assembly import (
    HierarchicalInstanceSegmenter,
)
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import make_train_step
import pytest


def _tiny_model_and_batch():
    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(8, 8), mask_size=(16, 16),
        image_size=(32, 32), base_channels=8, depth=2, mid_channels=16,
        feature_dim=16, unet_decoder_channels=(16, 16, 8, 8, 8))
    v = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 32, 32, 3)), jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]]),
        train=False))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {"images": rng.random((2, 32, 32, 3), np.float32),
             "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32), (2, 2, 1)),
             "masks": rng.integers(0, 3, (2, 2, 16, 16)).astype(np.int32),
             "valid": np.ones((2, 2), np.float32)}
    return model, v, batch


@pytest.mark.slow
def test_bf16_train_step_keeps_f32_masters():
    model, v, batch = _tiny_model_and_batch()
    tx = optax.adam(1e-3)
    state = TrainState.create(v, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, RefinedLossConfig(), donate=False,
                           compute_dtype="bfloat16")
    state2, metrics = step(state, batch)
    # master params and loss stay f32; the step actually updated params
    leaves = jax.tree.leaves(state2.params)
    assert all(l.dtype == jnp.float32 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
    assert np.isfinite(float(metrics["total_loss"]))
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        state.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0

    # bf16 loss close to the f32 loss on the same batch
    step32 = make_train_step(model, tx, RefinedLossConfig(), donate=False)
    _, m32 = step32(TrainState.create(v, tx, jax.random.PRNGKey(1)), batch)
    np.testing.assert_allclose(float(metrics["total_loss"]),
                               float(m32["total_loss"]), rtol=0.05)


def _loss_with(cfg, batch_like):
    preds, targets, aux, valid = batch_like
    total, _, _ = refined_hierarchical_loss(
        preds, targets, aux, HierarchicalLossState.create(), cfg, valid=valid)
    return float(total)


def test_config_fields_change_loss(tmp_path):
    rng = np.random.default_rng(1)
    n, h, w = 4, 16, 16
    preds = jnp.asarray(rng.normal(size=(n, h, w, 3)), jnp.float32)
    targets = jnp.asarray(rng.integers(0, 3, (n, h, w)), jnp.int32)
    aux = {"bg_fg_logits": jnp.asarray(rng.normal(size=(n, h, w, 2)), jnp.float32),
           "target_nontarget_logits": jnp.asarray(rng.normal(size=(n, h, w, 2)), jnp.float32)}
    valid = jnp.ones((n,), jnp.float32)
    batch_like = (preds, targets, aux, valid)

    cfg = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    cfg.data.data_stats = str(tmp_path / "missing.json")
    base = loss_config_from_experiment(cfg)
    l0 = _loss_with(base, batch_like)

    # ce_weight / dice_weight / use_focal all flow through
    cfg2 = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    cfg2.data.data_stats = str(tmp_path / "missing.json")
    cfg2.training.ce_weight = 3.0
    assert _loss_with(loss_config_from_experiment(cfg2), batch_like) != l0
    cfg2.training.ce_weight = 1.0
    cfg2.training.dice_weight = 5.0
    assert _loss_with(loss_config_from_experiment(cfg2), batch_like) != l0
    cfg2.training.dice_weight = 1.0
    cfg2.training.use_focal = True
    assert _loss_with(loss_config_from_experiment(cfg2), batch_like) != l0

    # data_stats pixel ratios -> final class weights
    stats = {"pixel_ratios": {"background": 0.8, "target": 0.15, "non_target": 0.05}}
    sp = tmp_path / "stats.json"
    sp.write_text(json.dumps(stats))
    cfg3 = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    cfg3.data.data_stats = str(sp)
    lc3 = loss_config_from_experiment(cfg3)
    assert lc3.base.final_class_weights is not None
    assert _loss_with(lc3, batch_like) != l0

    # DistanceLossConfig group -> distance-aware term
    cfg4 = ConfigManager.get_config("rgb_hierarchical_unet_v2")
    cfg4.data.data_stats = str(tmp_path / "missing.json")
    cfg4.distance_loss.enabled = True
    lc4 = loss_config_from_experiment(cfg4)
    assert lc4.distance_aware is not None
    assert _loss_with(lc4, batch_like) > l0
