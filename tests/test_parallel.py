"""Multi-device tests on the virtual 8-device CPU mesh: DP train step,
ROI-sharded inference, mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
from human_instance_segmentation_tpu.models.assembly import HierarchicalInstanceSegmenter
from human_instance_segmentation_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from human_instance_segmentation_tpu.parallel.roi_sharding import (
    make_roi_sharded_infer,
    shard_rois,
)
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import make_train_step


@pytest.fixture(scope="module")
def tiny():
    from helpers import fast_init

    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(8, 8), mask_size=(16, 16),
        image_size=(32, 32), base_channels=8, depth=2, mid_channels=16,
        feature_dim=16, unet_decoder_channels=(16, 16, 8, 8, 8))
    images = jnp.zeros((1, 32, 32, 3), jnp.float32)
    rois = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    # fast_init: all consumers compare mesh vs single-device outputs of the
    # SAME params — init values are free (tests/helpers.py)
    variables = fast_init(model, images, rois, train=False)
    return model, variables


def test_mesh_has_8_devices():
    mesh = create_mesh(8)
    assert int(np.prod(mesh.devices.shape)) == 8


@pytest.mark.slow
def test_roi_sharded_inference_matches_single_device(tiny):
    model, variables = tiny
    mesh = create_mesh(8)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    rois_np = np.concatenate([
        np.zeros((5, 1), np.float32),
        rng.uniform(0.05, 0.45, (5, 2)).astype(np.float32),
        rng.uniform(0.55, 0.95, (5, 2)).astype(np.float32)[:, ::-1],
    ], axis=1)
    rois_np[:, [2, 3]] = rois_np[:, [3, 2]]  # ensure x1<x2, y1<y2 layout
    rois_np = np.abs(rois_np)
    rois_np[:, 1:3] = np.minimum(rois_np[:, 1:3], 0.4)
    rois_np[:, 3:5] = np.maximum(rois_np[:, 3:5], 0.6)

    sharded = make_roi_sharded_infer(model, mesh, dilation_pixels=1)
    device_rois, n = shard_rois(mesh, rois_np)
    inst_s, bin_s = sharded(replicate(mesh, variables), replicate(mesh, images), device_rois)

    from human_instance_segmentation_tpu.inference import deployed_outputs, pad_rois

    padded = jnp.asarray(pad_rois(rois_np, device_rois.shape[0]))
    logits, aux = model.apply(variables, images, padded, train=False)
    inst_r, bin_r = deployed_outputs(logits, aux["full_image_logits"], padded, 1)

    np.testing.assert_allclose(np.asarray(inst_s)[:n], np.asarray(inst_r)[:n], atol=1e-5)
    np.testing.assert_allclose(np.asarray(bin_s), np.asarray(bin_r), atol=1e-5)


@pytest.mark.slow
def test_dp_train_step_runs_on_mesh(tiny):
    model, variables = tiny
    mesh = create_mesh(4)
    tx = optax.adamw(1e-4)
    state = replicate(mesh, TrainState.create(variables, tx, jax.random.PRNGKey(1)))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "images": rng.random((4, 32, 32, 3), np.float32),
        "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32), (4, 2, 1)),
        "masks": rng.integers(0, 3, (4, 2, 16, 16)).astype(np.int32),
        "valid": np.ones((4, 2), np.float32),
    })
    step = make_train_step(model, tx, RefinedLossConfig(), mesh=mesh, donate=False)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # dp-equivalence: the same batch on 1 device gives (nearly) the same loss
    step1 = make_train_step(model, tx, RefinedLossConfig(), mesh=None, donate=False)
    host_batch = jax.device_get(batch)
    state1 = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    _, m1 = step1(state1, host_batch)
    # dropout rngs differ per shard so losses differ slightly; same scale
    assert abs(float(m1["total_loss"]) - float(metrics["total_loss"])) < 1.0


@pytest.mark.slow
def test_engine_mesh_serving_matches_single_device(tiny):
    """InferenceEngine(mesh=...) — batch-DP GSPMD serving is exact."""
    from human_instance_segmentation_tpu.inference import InferenceEngine

    model, variables = tiny
    mesh = create_mesh(8)
    rng = np.random.default_rng(1)
    images = rng.random((8, 32, 32, 3), np.float32)
    rois = np.concatenate([
        np.repeat(np.arange(8, dtype=np.float32), 2)[:, None],
        np.tile(np.asarray([[0.1, 0.15, 0.85, 0.9]], np.float32), (16, 1)),
    ], axis=1)

    ref_eng = InferenceEngine(model, variables, dilation_pixels=1)
    mesh_eng = InferenceEngine(model, variables, dilation_pixels=1, mesh=mesh)
    inst_r, bin_r = ref_eng(images, rois)
    inst_m, bin_m = mesh_eng(images, rois)

    np.testing.assert_allclose(inst_m, inst_r, atol=1e-5)
    np.testing.assert_allclose(bin_m, bin_r, atol=1e-5)

    # non-divisible batch/bucket falls back to replication, still exact
    inst_r3, bin_r3 = ref_eng(images[:3], rois[:3])
    inst_m3, bin_m3 = mesh_eng(images[:3], rois[:3])
    np.testing.assert_allclose(inst_m3, inst_r3, atol=1e-5)
    np.testing.assert_allclose(bin_m3, bin_r3, atol=1e-5)


def test_engine_mesh_fallback_is_logged_and_mixed_sharding_exact(tiny, caplog):
    """Non-divisible axes REPLICATE (exact but sequential) and must say so
    in the log; a divisible batch still shards even when the roi bucket
    cannot (mixed case). VERDICT r2 item 6."""
    import logging

    from human_instance_segmentation_tpu.inference import InferenceEngine, pad_rois

    model, variables = tiny
    mesh = create_mesh(8)
    rng = np.random.default_rng(2)
    images = rng.random((8, 32, 32, 3), np.float32)
    rois = np.concatenate([
        np.asarray([[0.0], [3.0]], np.float32),
        np.tile(np.asarray([[0.1, 0.15, 0.85, 0.9]], np.float32), (2, 1)),
    ], axis=1)  # 2 rois -> bucket 2, NOT divisible by 8; batch 8 divisible

    ref_eng = InferenceEngine(model, variables, dilation_pixels=1)
    mesh_eng = InferenceEngine(model, variables, dilation_pixels=1, mesh=mesh)
    with caplog.at_level(logging.WARNING,
                         logger="human_instance_segmentation_tpu.inference"):
        inst_m, bin_m = mesh_eng(images, rois)
    assert any("REPLICATED" in r.message and "roi bucket" in r.message
               for r in caplog.records), caplog.records
    # the batch axis is NOT in the warnings (it sharded)
    assert not any("batch=" in r.message for r in caplog.records)

    inst_r, bin_r = ref_eng(images, rois)
    np.testing.assert_allclose(inst_m, inst_r, atol=1e-5)
    np.testing.assert_allclose(bin_m, bin_r, atol=1e-5)

    # GSPMD sanity: the compiled mixed-case program really shards the
    # image-side output over all 8 devices (not a silent full replicate)
    fn = mesh_eng._fn(8, 2)
    inst_d, bin_d, _ = fn(mesh_eng.params,
                          jnp.asarray(images), jnp.asarray(pad_rois(rois, 2)))
    assert len(bin_d.sharding.device_set) == 8
    assert not bin_d.sharding.is_fully_replicated
    assert inst_d.sharding.is_fully_replicated  # the non-divisible axis


def test_init_distributed_single_host():
    """Single-host: no jax.distributed handshake, returns device count."""
    from human_instance_segmentation_tpu.parallel.mesh import init_distributed

    n = init_distributed()
    assert n == len(jax.devices())
    assert init_distributed(num_processes=1) == n
