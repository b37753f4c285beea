"""End-to-end learnability: tiny model on synthetic COCO, loss must drop and
target IoU must rise within a few dozen steps. This is the 'does training
actually learn' check the reference never had (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from human_instance_segmentation_tpu.data import (
    COCOInstanceSegmentationDataset,
    DatasetConfig,
    batch_iterator,
)
from human_instance_segmentation_tpu.data.synthetic import generate_synthetic_coco
from human_instance_segmentation_tpu.losses.hierarchical import RefinedLossConfig
from human_instance_segmentation_tpu.models.assembly import HierarchicalInstanceSegmenter
from human_instance_segmentation_tpu.training.state import TrainState
from human_instance_segmentation_tpu.training.steps import make_eval_step, make_train_step


@pytest.mark.slow
def test_training_learns_on_synthetic_coco(tmp_path):
    ann, img_dir = generate_synthetic_coco(str(tmp_path), n_images=8,
                                           image_size=(64, 64), max_instances=2)
    cfg = DatasetConfig(image_size=(64, 64), mask_size=(32, 24),
                        rois_per_image=2, min_roi_size=4)
    ds = COCOInstanceSegmentationDataset(ann, img_dir, cfg)
    assert len(ds) == 8

    model = HierarchicalInstanceSegmenter(
        encoder_variant="tiny", roi_size=(16, 12), mask_size=(32, 24),
        image_size=(64, 64), base_channels=16, depth=2, mid_channels=32,
        feature_dim=32, unet_decoder_channels=(32, 24, 16, 16, 8),
        freeze_pretrained=False)  # nothing is pretrained here — train it all

    imgs0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    rois0 = jnp.asarray([[0.0, 0.2, 0.2, 0.8, 0.8]], jnp.float32)
    variables = jax.jit(lambda r: model.init(r, imgs0, rois0, train=False))(
        jax.random.PRNGKey(0))

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(3e-3))
    state = TrainState.create(variables, tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, RefinedLossConfig(), donate=False)
    eval_step = make_eval_step(model)

    def epoch_batches(seed):
        return batch_iterator(ds, batch_size=4, shuffle=True, seed=seed)

    first_loss = None
    last_loss = None
    for epoch in range(15):
        for batch in epoch_batches(epoch):
            state, metrics = step(state, batch)
            if first_loss is None:
                first_loss = float(metrics["total_loss"])
            last_loss = float(metrics["total_loss"])

    assert last_loss < first_loss * 0.7, (first_loss, last_loss)

    sums = None
    for batch in epoch_batches(99):
        s = jax.device_get(eval_step((state.params, state.batch_stats), batch))
        sums = s if sums is None else {k: sums[k] + s[k] for k in sums}
    miou = float(sums["iou_sum"]) / max(float(sums["n"]), 1.0)
    # solid high-contrast blobs: even a tiny model should segment them
    assert miou > 0.25, miou
