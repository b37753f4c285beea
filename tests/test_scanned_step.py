"""Scanned multi-step training: K optimizer steps per dispatch, equivalent
to K sequential single-step dispatches (fp-reassociation tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
from human_instance_segmentation_tpu.models.assembly import HierarchicalInstanceSegmenter
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import (
    make_scanned_train_step,
    make_train_step,
    stack_batches,
)


@pytest.mark.slow
def test_scanned_equals_sequential():
    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(8, 8), mask_size=(16, 16),
        image_size=(32, 32), base_channels=8, depth=2, mid_channels=16,
        feature_dim=16, unet_decoder_channels=(16, 16, 8, 8, 8))
    v = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 32, 32, 3)), jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]]),
        train=False))(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(0)

    def mk():
        return {"images": rng.random((2, 32, 32, 3), np.float32),
                "boxes": np.tile(np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32), (2, 2, 1)),
                "masks": rng.integers(0, 3, (2, 2, 16, 16)).astype(np.int32),
                "valid": np.ones((2, 2), np.float32)}

    batches = [mk() for _ in range(3)]
    sb = stack_batches(batches)
    assert sb["images"].shape == (3, 2, 32, 32, 3)

    state = TrainState.create(v, tx, jax.random.PRNGKey(1))
    scan_step = make_scanned_train_step(model, tx, RefinedLossConfig(),
                                        scan_steps=3, donate=False)
    state2, metrics = scan_step(state, sb)
    assert int(state2.step) == 3

    state_a = TrainState.create(v, tx, jax.random.PRNGKey(1))
    single = make_train_step(model, tx, RefinedLossConfig(), donate=False)
    for b in batches:
        state_a, m = single(state_a, b)
    np.testing.assert_allclose(float(m["total_loss"]), float(metrics["total_loss"]),
                               rtol=5e-4)
