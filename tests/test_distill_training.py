"""Distillation training steps: binary UNet KD and hierarchical ROI-model KD."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.losses.distillation import (
    DistillationConfig,
    DistillationState,
    feature_matching_loss,
)
from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
from human_instance_segmentation_tpu.models.assembly import HierarchicalInstanceSegmenter
from human_instance_segmentation_tpu.models.unet import PeopleSegmentationUNet
from human_instance_segmentation_tpu.training.distill import (
    make_distill_train_step,
    make_hierarchical_distill_step,
)
from human_instance_segmentation_tpu.training.state import TrainState


@pytest.mark.slow
def test_binary_distill_step():
    student = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=(16, 16, 8, 8, 8))
    teacher = PeopleSegmentationUNet(encoder_variant="tiny", decoder_channels=(16, 16, 8, 8, 8))
    x = jnp.zeros((2, 32, 32, 3))
    s_vars = jax.jit(lambda r: student.init(r, x, train=False))(jax.random.PRNGKey(0))
    t_vars = jax.jit(lambda r: teacher.init(r, x, train=False))(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-4)
    state = TrainState.create(s_vars, tx, jax.random.PRNGKey(2),
                              distill_state=DistillationState.create(temperature=4.0))
    step = make_distill_train_step(student, teacher, t_vars, tx, DistillationConfig())
    rng = np.random.default_rng(0)
    batch = {"images": rng.random((2, 32, 32, 3), np.float32),
             "masks": (rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32)}
    old_stats = jax.device_get(state.batch_stats)  # state is donated below
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    for k in ("kl_loss", "mse_loss", "bce_loss", "dice_loss",
              "student_miou", "teacher_miou", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    # batch_stats updated (student BN in train mode)
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).sum()),
                        jax.device_get(new_state.batch_stats), old_stats)
    assert sum(jax.tree.leaves(diff)) > 0


@pytest.mark.slow
def test_hierarchical_distill_step():
    kw = dict(roi_size=(8, 8), mask_size=(16, 16), image_size=(32, 32),
              base_channels=8, depth=2, mid_channels=16, feature_dim=16,
              unet_decoder_channels=(16, 16, 8, 8, 8))
    student = HierarchicalInstanceSegmenter(encoder_variant="tiny", **kw)
    teacher = HierarchicalInstanceSegmenter(encoder_variant="tiny", **kw)
    imgs = jnp.zeros((1, 32, 32, 3))
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]])
    s_vars = jax.jit(lambda r: student.init(r, imgs, rois, train=False))(jax.random.PRNGKey(0))
    t_vars = jax.jit(lambda r: teacher.init(r, imgs, rois, train=False))(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-4)
    state = TrainState.create(s_vars, tx, jax.random.PRNGKey(2))
    step = make_hierarchical_distill_step(
        student, teacher, t_vars, tx, RefinedLossConfig(), temperature=4.0, alpha=0.7)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.random((2, 32, 32, 3), np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32), (2, 2, 1)),
        "masks": rng.integers(0, 3, (2, 2, 16, 16)).astype(np.int32),
        "valid": np.ones((2, 2), np.float32),
    }
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    assert "kd_final" in metrics and float(metrics["kd_final"]) >= 0.0
    assert "kd_bg_fg_logits" in metrics


def test_feature_matching_loss(rng):
    s = {"l1": jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32)),
         "l2": jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))}
    t = {"l1": jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32)),
         "l2": jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))}  # size mismatch -> resized
    total, metrics = feature_matching_loss(s, t)
    assert np.isfinite(float(total)) and float(total) > 0
    assert "fm_l1" in metrics and "fm_l2" in metrics
    # identical features -> zero
    total0, _ = feature_matching_loss(t, t)
    assert float(total0) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.slow
def test_binary_distill_step_on_mesh_matches_single_device():
    """DP distillation step over the 8-device virtual mesh: metrics equal
    the single-device step on the same global batch (grads pmean over ICI).
    The virtual-mesh correctness half of the BASELINE distillation config
    (single-chip throughput recorded by scripts/bench_baseline_configs.py)."""
    from human_instance_segmentation_tpu.parallel.mesh import (
        create_mesh, replicate, shard_batch)

    student = PeopleSegmentationUNet(encoder_variant="tiny",
                                     decoder_channels=(16, 16, 8, 8, 8))
    teacher = PeopleSegmentationUNet(encoder_variant="tiny",
                                     decoder_channels=(16, 16, 8, 8, 8))
    x = jnp.zeros((8, 32, 32, 3))
    s_vars = jax.jit(lambda r: student.init(r, x[:1], train=False))(jax.random.PRNGKey(0))
    t_vars = jax.jit(lambda r: teacher.init(r, x[:1], train=False))(jax.random.PRNGKey(1))
    tx = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    batch = {"images": rng.random((8, 32, 32, 3), np.float32),
             "masks": (rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32)}

    def fresh_state():
        # deep-copy the variables: both steps donate their input state
        sv = jax.tree.map(lambda a: jnp.array(np.asarray(a)), s_vars)
        return TrainState.create(sv, tx, jax.random.PRNGKey(2),
                                 distill_state=DistillationState.create(temperature=4.0))

    step1 = make_distill_train_step(student, teacher, t_vars, tx,
                                    DistillationConfig())
    _, m1 = step1(fresh_state(), batch)

    mesh = create_mesh(8)
    stepm = make_distill_train_step(student, teacher, replicate(mesh, t_vars),
                                    tx, DistillationConfig(), mesh=mesh)
    state_m = replicate(mesh, fresh_state())
    _, mm = stepm(state_m, shard_batch(mesh, batch))

    # teacher is eval-mode -> exact across shardings (up to fp reassoc);
    # student metrics differ slightly because train-mode BatchNorm computes
    # PER-SHARD batch statistics under DP (1 img/shard here vs 8 globally)
    np.testing.assert_allclose(float(mm["teacher_miou"]),
                               float(m1["teacher_miou"]), rtol=2e-4)
    for k in ("total_loss", "kl_loss", "student_miou"):
        np.testing.assert_allclose(float(mm[k]), float(m1[k]), rtol=2e-2)
